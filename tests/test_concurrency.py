"""Concurrent maintenance vs ingest: appends racing a compaction must both
land — optimistic commits retry against fresh metadata, readers stay
consistent (the serializable-isolation claim exercised, not just asserted)."""

import os
import threading

from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction


class TestConcurrentMaintenance:
    def test_appends_during_compaction_all_survive(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "conc"), datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 2),)),
            identifier_fields=("image_id",),
        )
        datagen.fragmented_append(t, datagen.gen_images_df(spark, 300), 300,
                                  n_files=30)

        t2 = Table.load(spark, t.root)  # separate handle = separate writer
        errors: list[Exception] = []

        def appender():
            try:
                for k in range(3):
                    t2.append(
                        datagen.gen_images_df(spark, 20).withColumn(
                            "image_id",
                            F.concat(F.lit(f"new{k}-"), F.col("image_id")),
                        )
                    )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        th = threading.Thread(target=appender)
        th.start()
        res = run_compaction(t, "conc", fill_ratio=1.0, target_bytes=1 << 21)
        th.join()

        assert not errors
        assert res["bins_executed"] > 0
        t.refresh()
        # every appended row AND every original row is present exactly once
        assert t.scan().count() == 300 + 60
        assert t.scan().select(F.countDistinct("image_id")).collect()[0][0] == 360

    def test_reader_pinned_through_concurrent_compaction(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "pin"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        datagen.fragmented_append(t, datagen.gen_images_df(spark, 200), 200,
                                  n_files=20)
        pin = t.current_snapshot_id
        pinned_df = t.scan(snapshot_id=pin)  # plan bound to old file set
        run_compaction(t, "pin", fill_ratio=1.0, target_bytes=1 << 21)
        # compaction rewrote the files, but they are not yet reaped: the
        # pinned reader still materializes the old snapshot exactly
        assert pinned_df.count() == 200
        assert t.snapshot(pin) is not None


class TestRewriteDeleteConflict:
    def test_rewrite_conflicts_on_concurrent_delete(self, spark, tmp_table_dir):
        """A rewrite planned before an equality delete lands must CONFLICT at
        commit, not silently resurrect the deleted rows (the rewrite's new
        files get a fresh seq, escaping the delete's strictly-older scope)."""
        import pytest

        from olake_spark.icelite.table import DATA, CommitConflict

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "delc"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 30))
        pin_dels = {e.file_path for e in t.entries() if e.content != DATA}
        victim = [e.file_path for e in t.entries() if e.content == DATA][0]
        # concurrent merge lands a delete between pin and commit
        t.row_delta(None, spark.createDataFrame([("img-000000000001",)],
                                                ["image_id"]))
        with pytest.raises(CommitConflict, match="concurrent delete commit"):
            t.rewrite_files({victim}, [], known_delete_paths=pin_dels)
        # without the guard the same commit goes through (legacy behavior)
        t.rewrite_files({victim}, [])

    def test_rewrite_manifests_absorbs_concurrent_appends(self, spark, tmp_table_dir):
        """Manifest rewrites racing appends must regroup from each retry's
        fresh base — a concurrent append's files may never be dropped."""
        from olake_spark.operators.manifests import rewrite_manifests

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "mfc"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 50))
        t2 = Table.load(spark, t.root)
        errors: list[Exception] = []

        def appender():
            try:
                for k in range(4):
                    t2.append(
                        datagen.gen_images_df(spark, 10).withColumn(
                            "image_id",
                            F.concat(F.lit(f"mf{k}-"), F.col("image_id")),
                        )
                    )
            except Exception as exc:  # pragma: no cover
                errors.append(exc)

        th = threading.Thread(target=appender)
        th.start()
        for _ in range(6):
            rewrite_manifests(t, target_entries=4)
        th.join()
        assert not errors
        t.refresh()
        assert t.scan().select(F.countDistinct("image_id")).collect()[0][0] == 90


class TestRowDeltaSeqRace:
    def test_lost_cas_restamps_delete_seq(self, spark, tmp_table_dir):
        """A row_delta (upsert) that loses the commit CAS to a concurrent
        append must RE-STAMP its sequence number on retry: without
        restamp_seq the eq-delete and the concurrent winner share one seq,
        'strictly older' compares equal, and the keys it upserts survive
        twice (round-4 review finding)."""
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "race"), datagen.IMAGES_SCHEMA,
            PartitionSpec(()), identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 20))
        t2 = Table.load(spark, t.root)

        real_create = t.io.atomic_create_json
        fired = {"done": False}

        def racing_create(target, meta):
            if not fired["done"] and "metadata.json" in target:
                fired["done"] = True
                # concurrent writer commits FIRST, inside t's race window
                # (after t refreshed, before its CAS) — re-appending the
                # same 20 keys at what t thought would be its seq
                t2.append(datagen.gen_images_df(spark, 20))
            return real_create(target, meta)

        t.io.atomic_create_json = racing_create  # t2 has its own io instance
        try:
            upd = datagen.gen_images_df(spark, 20).withColumn(
                "caption", F.concat(F.lit("new "), F.col("caption"))
            )
            t.row_delta(upd, upd.select("image_id"))
        finally:
            t.io.atomic_create_json = real_create
        t.refresh()
        rows = t.scan(columns=["image_id", "caption"]).collect()
        # every key exactly once, and the upsert's caption won over the
        # concurrently re-appended copy
        assert len(rows) == 20
        assert {r["image_id"] for r in rows} == {
            f"img-{i:012d}" for i in range(20)
        }
        assert all(r["caption"].startswith("new ") for r in rows)
