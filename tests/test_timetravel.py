"""Time-travel (FOR TIMESTAMP AS OF) + incremental append scan."""

import os
import time

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction
from olake_spark.operators.merge import merge_into


@pytest.fixture()
def staged_table(spark, tmp_table_dir):
    """Table with a history: append A → append B → merge (rowdelta) →
    compaction; snapshot ids + wall-clock marks recorded between steps."""
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "tt"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 2),)),
        identifier_fields=("image_id",),
    )
    marks = {}
    df = datagen.gen_images_df(spark, 120)
    t.append(df.filter(F.col("image_id") < "img-000000000060"),
             max_records_per_file=10)
    marks["after_a"] = (t.current_snapshot_id, int(time.time() * 1000))
    time.sleep(0.01)
    t.append(df.filter(F.col("image_id") >= "img-000000000060"),
             max_records_per_file=10)
    marks["after_b"] = (t.current_snapshot_id, int(time.time() * 1000))
    time.sleep(0.01)
    ch = (
        df.filter(F.col("image_id") < "img-000000000010")
        .withColumn("caption", F.lit("patched"))
        .withColumn("_op_type", F.lit("u"))
        .withColumn("_cdc_timestamp", F.lit(1))
    )
    merge_into(t, ch, keep_deletes=False)
    marks["after_merge"] = (t.current_snapshot_id, int(time.time() * 1000))
    run_compaction(t, "tt-c", fill_ratio=1.0, target_bytes=1 << 21)
    marks["after_compact"] = (t.current_snapshot_id, int(time.time() * 1000))
    return t, marks


class TestTimeTravel:
    def test_as_of_resolves_between_commits(self, spark, staged_table):
        t, marks = staged_table
        assert t.scan(as_of_ms=marks["after_a"][1]).count() == 60
        assert t.scan(as_of_ms=marks["after_b"][1]).count() == 120
        # after the merge the row COUNT is stable but captions changed
        patched = (
            t.scan(as_of_ms=marks["after_merge"][1])
            .filter(F.col("caption") == "patched")
            .count()
        )
        assert patched == 10
        # pre-table-history travel raises (not a silent latest-read)
        with pytest.raises(KeyError):
            t.scan(as_of_ms=marks["after_a"][1] - 10_000_000)

    def test_as_of_excludes_later_compaction(self, spark, staged_table):
        t, marks = staged_table
        a = t.scan(as_of_ms=marks["after_merge"][1]).select(
            "image_id", "caption")
        b = t.scan().select("image_id", "caption")  # post-compaction
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestIncrementalScan:
    def test_appends_between_snapshots(self, spark, staged_table):
        t, marks = staged_table
        inc = t.incremental_scan(marks["after_a"][0], marks["after_b"][0])
        assert inc.count() == 60
        assert inc.agg(F.min("image_id")).collect()[0][0] == "img-000000000060"

    def test_rowdelta_adds_surface_and_rewrites_do_not(self, spark, staged_table):
        t, marks = staged_table
        # window covering merge + compaction: only the merge's 10 upserted
        # rows are new; the compaction's rewritten files must NOT re-surface
        inc = t.incremental_scan(marks["after_b"][0])
        rows = inc.collect()
        assert len(rows) == 10
        assert all(r["caption"] == "patched" for r in rows)

    def test_empty_window(self, spark, staged_table):
        t, marks = staged_table
        cur = t.current_snapshot_id
        assert t.incremental_scan(cur).count() == 0

    def test_unknown_snapshot_raises(self, spark, staged_table):
        t, _ = staged_table
        with pytest.raises(KeyError):
            t.incremental_scan(999999)


class TestTags:
    def test_tag_pins_through_expiry(self, spark, staged_table):
        """A tagged snapshot and its files survive expire+reap; dropping the
        tag releases them; scan_tag reads the pinned state."""
        t, marks = staged_table
        t.create_tag("pre-compact", marks["after_merge"][0])
        pinned = t.scan_tag("pre-compact").select("image_id", "caption")
        n_pinned = pinned.count()
        assert n_pinned == 120

        t.expire_snapshots(keep_last=1)
        t.remove_orphan_files(grace_seconds=0)
        # tag still resolvable AND its data files still on disk
        assert t.scan_tag("pre-compact").count() == n_pinned
        assert t.refs() == {"pre-compact": marks["after_merge"][0]}

        t.drop_tag("pre-compact")
        t.expire_snapshots(keep_last=1)
        got = t.remove_orphan_files(grace_seconds=0)
        assert got  # the released snapshot's files are now reaped
        with pytest.raises(KeyError):
            t.scan_tag("pre-compact")
        assert t.scan().count() == 120  # current unharmed

    def test_tag_unknown_snapshot_raises(self, spark, staged_table):
        t, _ = staged_table
        with pytest.raises(KeyError):
            t.create_tag("bad", 424242)


class TestIncrementalLineage:
    """Round-3 review findings: the incremental window is the PARENT CHAIN,
    never list positions — rollback branches are excluded, expiry gaps and
    non-ancestors raise."""

    def _mk(self, spark, root):
        t = Table.create(spark, root, datagen.IMAGES_SCHEMA,
                         identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 90)
        t.append(df.filter(F.col("image_id") < "img-000000000030"))
        s1 = t.current_snapshot_id
        t.append(df.filter((F.col("image_id") >= "img-000000000030")
                           & (F.col("image_id") < "img-000000000060")))
        s2 = t.current_snapshot_id
        return t, df, s1, s2

    def test_rollback_branch_excluded(self, spark, tmp_table_dir):
        t, df, s1, s2 = self._mk(spark, os.path.join(tmp_table_dir, "rb"))
        t.rollback_to(s1)
        t.append(df.filter(F.col("image_id") >= "img-000000000060"))
        inc = t.incremental_scan(s1)
        ids = sorted(r["image_id"] for r in inc.select("image_id").collect())
        # only the post-rollback append; the abandoned s2 rows never surface
        assert len(ids) == 30 and ids[0] == "img-000000000060"
        # and the abandoned tip is NOT an ancestor of current
        with pytest.raises(ValueError, match="not an ancestor"):
            t.incremental_scan(s2)

    def test_expired_gap_raises(self, spark, tmp_table_dir):
        t, df, s1, s2 = self._mk(spark, os.path.join(tmp_table_dir, "gap"))
        t.create_tag("keep-first", s1)
        t.append(df.filter(F.col("image_id") >= "img-000000000060"))
        # expire drops s2 (the middle link) while the tag keeps s1
        t.expire_snapshots(keep_last=1)
        assert any(s["snapshot_id"] == s1 for s in t.snapshots())
        assert not any(s["snapshot_id"] == s2 for s in t.snapshots())
        with pytest.raises(KeyError, match="history broken"):
            t.incremental_scan(s1)


class TestWriteAuditPublish:
    def test_stage_audit_publish(self, spark, tmp_table_dir):
        """WAP: readers see nothing until publish; the auditor scans the
        staged snapshot by id; publish is an atomic current flip."""
        t = Table.create(spark, os.path.join(tmp_table_dir, "wap"),
                         datagen.IMAGES_SCHEMA, identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 60)
        t.append(df.filter(F.col("image_id") < "img-000000000040"))
        staged = t.stage_append(df.filter(F.col("image_id") >= "img-000000000040"))
        sid = staged["snapshot_id"]
        assert t.scan().count() == 40  # readers unaffected
        # auditor: staged snapshot = published + staged rows
        assert t.scan(snapshot_id=sid).count() == 60
        t.publish_snapshot(sid)
        assert t.scan().count() == 60

    def test_publish_conflicts_when_table_moved(self, spark, tmp_table_dir):
        from olake_spark.icelite.table import CommitConflict

        t = Table.create(spark, os.path.join(tmp_table_dir, "wapc"),
                         datagen.IMAGES_SCHEMA, identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 60)
        t.append(df.filter(F.col("image_id") < "img-000000000020"))
        staged = t.stage_append(
            df.filter((F.col("image_id") >= "img-000000000020")
                      & (F.col("image_id") < "img-000000000040")))
        # concurrent append moves the table past the staged parent
        t.append(df.filter(F.col("image_id") >= "img-000000000040"))
        with pytest.raises(CommitConflict, match="cannot publish"):
            t.publish_snapshot(staged["snapshot_id"])

    def test_drop_staged_releases_files(self, spark, tmp_table_dir):
        t = Table.create(spark, os.path.join(tmp_table_dir, "wapd"),
                         datagen.IMAGES_SCHEMA, identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 40)
        t.append(df.filter(F.col("image_id") < "img-000000000020"))
        staged = t.stage_append(df.filter(F.col("image_id") >= "img-000000000020"))
        t.drop_snapshot(staged["snapshot_id"])
        got = t.remove_orphan_files(grace_seconds=0)
        assert got  # the rejected snapshot's data files were reaped
        assert t.scan().count() == 20
        with pytest.raises(ValueError):
            t.drop_snapshot(t.current_snapshot_id)


class TestWapLineage:
    """Round-3 review regressions: staged snapshots must be invisible to
    time-travel, visible to incremental once published, publish must return
    the published dict, and the published lineage must be undroppable."""

    def _base(self, spark, root):
        t = Table.create(spark, root, datagen.IMAGES_SCHEMA,
                         identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 60)
        t.append(df.filter(F.col("image_id") < "img-000000000040"))
        return t, df

    def test_published_stage_surfaces_in_incremental(self, spark, tmp_table_dir):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "wl1"))
        s1 = t.current_snapshot_id
        staged = t.stage_append(df.filter(F.col("image_id") >= "img-000000000040"))
        t.publish_snapshot(staged["snapshot_id"])
        inc = t.incremental_scan(s1)
        assert inc.count() == 20  # WAP rows are genuine adds once published

    def test_staged_invisible_to_as_of(self, spark, tmp_table_dir):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "wl2"))
        t.stage_append(df.filter(F.col("image_id") >= "img-000000000040"))
        now_ms = int(time.time() * 1000) + 1000
        assert t.scan(as_of_ms=now_ms).count() == 40  # published state only
        # after publish, as_of resolves to it
        staged2 = t.stage_append(
            df.filter(F.col("image_id") >= "img-000000000040"))
        # (re-stage: the first staged snapshot's parent is still current)
        t.publish_snapshot(staged2["snapshot_id"])
        assert t.scan(as_of_ms=int(time.time() * 1000) + 1000).count() == 60

    def test_publish_returns_published_dict(self, spark, tmp_table_dir):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "wl3"))
        s1 = t.stage_append(df.filter(
            (F.col("image_id") >= "img-000000000040")
            & (F.col("image_id") < "img-000000000050")))
        t.stage_append(df.filter(F.col("image_id") >= "img-000000000050"))
        out = t.publish_snapshot(s1["snapshot_id"])
        assert out["snapshot_id"] == s1["snapshot_id"]

    def test_cannot_drop_published_lineage(self, spark, tmp_table_dir):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "wl4"))
        parent = t.current_snapshot_id
        t.append(df.filter(F.col("image_id") >= "img-000000000040"))
        with pytest.raises(ValueError, match="ancestor"):
            t.drop_snapshot(parent)


class TestCherryPick:
    """Iceberg cherrypickSnapshot: publish a staged append after main moved
    past its parent — the interleaved case publish_snapshot refuses."""

    def _base(self, spark, root):
        t = Table.create(spark, root, datagen.IMAGES_SCHEMA,
                         identifier_fields=("image_id",))
        df = datagen.gen_images_df(spark, 80)
        t.append(df.filter(F.col("image_id") < "img-000000000040"))
        return t, df

    def test_pick_after_main_moved(self, spark, tmp_table_dir):
        from olake_spark.icelite.table import CommitConflict

        t, df = self._base(spark, os.path.join(tmp_table_dir, "cp1"))
        s0 = t.current_snapshot_id
        staged = t.stage_append(df.filter(
            (F.col("image_id") >= "img-000000000040")
            & (F.col("image_id") < "img-000000000060")))
        # main moves → publish refuses, cherry-pick applies
        t.append(df.filter(F.col("image_id") >= "img-000000000060"))
        with pytest.raises(CommitConflict, match="moved"):
            t.publish_snapshot(staged["snapshot_id"])
        picked = t.cherry_pick(staged["snapshot_id"])
        assert picked["summary"]["cherry-picked-from"] == staged["snapshot_id"]
        assert t.scan().count() == 80
        # no data was copied: the picked files ARE the staged files
        staged_files = {e.file_path
                        for e in t._added_entries(t.snapshot(staged["snapshot_id"]))}
        picked_files = {e.file_path
                        for e in t._added_entries(t.snapshot(picked["snapshot_id"]))}
        assert picked_files == staged_files
        # the feed sees the picked rows exactly once
        assert t.incremental_scan(s0).count() == 40
        clog = t.changelog_scan(s0)
        assert clog.filter("_change_type = 'insert'").count() == 40

    def test_pick_guards(self, spark, tmp_table_dir):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "cp2"))
        cur = t.current_snapshot_id
        with pytest.raises(ValueError, match="current lineage"):
            t.cherry_pick(cur)  # already published
        ch = datagen.gen_changes_df(spark, base_n=40, n_changes=10)
        from olake_spark.operators.merge import merge_into

        snap = merge_into(t, ch)
        with pytest.raises(ValueError, match="append-type"):
            t.cherry_pick(snap["snapshot_id"])  # rowdelta: deletes unsafe

    def test_picked_rows_survive_interleaved_eq_delete(
        self, spark, tmp_table_dir
    ):
        """Newly-added-data rule: an equality delete committed BETWEEN
        staging and picking kills only rows that were in the table when it
        ran — the re-stamped sequence number keeps picked rows alive even
        when their key matches."""
        t, df = self._base(spark, os.path.join(tmp_table_dir, "cp3"))
        staged = t.stage_append(df.filter(
            (F.col("image_id") >= "img-000000000040")
            & (F.col("image_id") < "img-000000000060")))
        # interleaved MERGE deletes a key that ALSO exists in the staged set
        ch = datagen.gen_changes_df(spark, base_n=80, n_changes=20)
        dels = ch.filter("_op_type = 'd'")
        from olake_spark.operators.merge import merge_into

        merge_into(t, ch)
        t.cherry_pick(staged["snapshot_id"])
        got = {r[0] for r in t.scan().select("image_id").collect()}
        staged_ids = {r[0] for r in df.filter(
            (F.col("image_id") >= "img-000000000040")
            & (F.col("image_id") < "img-000000000060")
        ).select("image_id").collect()}
        assert staged_ids <= got  # every picked row alive
        del_ids = {r[0] for r in dels.select("image_id").collect()}
        # deleted base keys stay dead unless resurrected by the pick
        assert not (del_ids - staged_ids) & got

    def test_files_survive_dropping_the_staged_original(
        self, spark, tmp_table_dir
    ):
        t, df = self._base(spark, os.path.join(tmp_table_dir, "cp4"))
        staged = t.stage_append(df.filter(F.col("image_id") >= "img-000000000040"))
        t.append(df.filter(F.col("image_id") < "img-000000000040").limit(0)
                 .unionByName(df.filter(F.col("image_id") < "img-000000000001")))
        picked = t.cherry_pick(staged["snapshot_id"])
        t.drop_snapshot(staged["snapshot_id"])
        orphans = t.remove_orphan_files(grace_seconds=0)
        # the dropped stage's manifest is correctly reaped, but every DATA
        # file lives on — the pick's manifest still references it
        assert all(p.startswith("metadata/manifests/") for p in orphans)
        assert t.scan().count() == 81
        assert picked["operation"] == "cherrypick"


class TestBranches:
    """Mutable branch refs + fast-forward (Iceberg branch semantics)."""

    def _fresh(self, spark, tmp_table_dir, n=60):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "br"),
            datagen.IMAGES_SCHEMA, identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, n))
        return t

    def test_branch_isolated_from_main_until_fast_forward(
        self, spark, tmp_table_dir
    ):
        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("audit")
        extra = datagen.gen_images_df(spark, 80).filter(
            "image_id >= 'img-000000000060'"
        )
        r = t.append_to_branch("audit", extra)
        assert r["summary"]["branch"] == "audit"
        assert t.scan().count() == 60          # main untouched
        assert t.scan_branch("audit").count() == 80
        t.fast_forward("audit")
        assert t.scan().count() == 80

    def test_multi_commit_branch_chain(self, spark, tmp_table_dir):
        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("ingest")
        base = datagen.gen_images_df(spark, 100)
        t.append_to_branch("ingest", base.filter(
            "image_id >= 'img-000000000060' AND image_id < 'img-000000000080'"))
        t.append_to_branch("ingest", base.filter(
            "image_id >= 'img-000000000080'"))
        assert t.scan_branch("ingest").count() == 100
        assert t.scan().count() == 60
        start = t.current_snapshot_id
        t.fast_forward("ingest")
        assert t.scan().count() == 100
        # the merged chain is real lineage: incremental sees both appends
        assert t.incremental_scan(start).count() == 40

    def test_fast_forward_conflicts_when_main_moved(self, spark, tmp_table_dir):
        from olake_spark.icelite.table import CommitConflict

        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("b")
        t.append_to_branch("b", datagen.gen_images_df(spark, 70).filter(
            "image_id >= 'img-000000000060'"))
        # main advances independently → divergence
        t.append(datagen.gen_images_df(spark, 200).filter(
            "image_id >= 'img-000000000190'"))
        with pytest.raises(CommitConflict, match="not an ancestor"):
            t.fast_forward("b")

    def test_branch_head_survives_expiry_and_guards(self, spark, tmp_table_dir):
        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("keep")
        r = t.append_to_branch("keep", datagen.gen_images_df(spark, 65).filter(
            "image_id >= 'img-000000000060'"))
        head = r["snapshot_id"]
        t.append(datagen.gen_images_df(spark, 130).filter(
            "image_id >= 'img-000000000120'"))
        t.expire_snapshots(keep_last=1)
        assert t.scan_branch("keep").count() == 65
        with pytest.raises(ValueError, match="branch head"):
            t.drop_snapshot(head)
        t.drop_branch("keep")
        t.drop_snapshot(head)  # now droppable
        with pytest.raises(KeyError):
            t.scan_branch("keep")

    def test_fast_forward_diverged_after_expiry_is_conflict(
        self, spark, tmp_table_dir
    ):
        """Expiry can drop the shared ancestor of a DIVERGED branch (the
        lineage walk stops at current-lineage ancestors, and keep_last may
        drop those). The resulting gap still surfaces as CommitConflict —
        never a raw KeyError — because a legal fast-forward's whole
        head→…→current walk is always retained."""
        from olake_spark.icelite.table import CommitConflict

        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("b")
        t.append_to_branch("b", datagen.gen_images_df(spark, 70).filter(
            "image_id >= 'img-000000000060'"))
        # main diverges twice, then expiry drops the shared base snapshot
        t.append(datagen.gen_images_df(spark, 130).filter(
            "image_id >= 'img-000000000120'"))
        t.append(datagen.gen_images_df(spark, 200).filter(
            "image_id >= 'img-000000000190'"))
        t.expire_snapshots(keep_last=1)
        assert t.scan_branch("b").count() == 70  # branch still readable
        with pytest.raises(CommitConflict, match="not an ancestor"):
            t.fast_forward("b")

    def test_duplicate_and_missing_branch_raise(self, spark, tmp_table_dir):
        t = self._fresh(spark, tmp_table_dir)
        t.create_branch("x")
        with pytest.raises(ValueError, match="already exists"):
            t.create_branch("x")
        with pytest.raises(KeyError):
            t.append_to_branch("nope", datagen.gen_images_df(spark, 1))
        with pytest.raises(KeyError):
            t.fast_forward("nope")


class TestRetentionProperties:
    def test_expire_honors_table_retention_properties(self, spark, tmp_table_dir):
        """Iceberg history.expire.* parity: an argument-less expire applies
        the per-table policy — keep min-snapshots, plus everything younger
        than max-age."""
        import os
        import time as _t

        from olake_spark import datagen
        from olake_spark.icelite import Table

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "ret"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
            properties={
                "history.expire.min-snapshots-to-keep": "2",
                # huge age → nothing qualifies as old → everything survives
                "history.expire.max-snapshot-age-ms": str(10**12),
            },
        )
        for _ in range(5):
            t.append(datagen.gen_images_df(spark, 5))
        assert t.expire_snapshots()["expired"] == 0  # all younger than cutoff

        # age 0 → every snapshot is "old": only min-snapshots-to-keep survive
        t._commit(lambda m: {
            **m,
            "properties": {
                **m["properties"], "history.expire.max-snapshot-age-ms": "0",
            },
        })
        t.expire_snapshots()
        assert len(t.snapshots()) == 2

        # explicit arguments override the policy: a future cutoff makes
        # every snapshot "old", so only keep_last=1 survives
        t.append(datagen.gen_images_df(spark, 5))
        t.expire_snapshots(keep_last=1, older_than_ms=int(_t.time() * 1000) + 10**7)
        assert len(t.snapshots()) == 1
