"""Maintenance-operator invariants (SURVEY.md §5 test plan items 2-4):
every op preserves the exact row set; MERGE matches the applied-changes
oracle; resume is idempotent; expire+orphans never touch live files."""

import json
import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.checkpoint import MaintenanceLog
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.icelite.table import DATA, EQ_DELETES
from olake_spark.operators.cluster import run_cluster_rewrite
from olake_spark.operators.compact import plan_compaction, run_compaction
from olake_spark.operators.expire import run_expire
from olake_spark.operators.manifests import rewrite_manifests
from olake_spark.operators.merge import apply_changes_oracle, merge_into
from olake_spark.verify import row_sets_equal, verify_table_scan

N = 400
TARGET = 2 * 1024 * 1024  # small target so tiny fixtures actually bin-pack


@pytest.fixture()
def fragmented_table(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "frag"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 2),)),
        identifier_fields=("image_id",),
        properties={"write.target-file-size-bytes": str(TARGET)},
    )
    datagen.fragmented_append(t, datagen.gen_images_df(spark, N), N, n_files=40)
    return t


def data_files(t):
    return [e for e in t.entries() if e.content == DATA]


class TestCompaction:
    def test_rowset_preserved_and_files_shrink(self, spark, fragmented_table):
        t = fragmented_table
        before = t.scan().select("image_id", "caption", "phash")
        n_before = len(data_files(t))
        res = run_compaction(t, "job-c1", fill_ratio=1.0)
        assert res["bins_executed"] > 0
        assert len(data_files(t)) < n_before
        after = t.scan().select("image_id", "caption", "phash")
        assert row_sets_equal(before, after)

    def test_compaction_purges_equality_deletes(self, spark, fragmented_table):
        t = fragmented_table
        keys = spark.createDataFrame(
            [(f"img-{i:012d}",) for i in range(20)], ["image_id"]
        )
        t.row_delta(None, keys)
        assert any(e.content == EQ_DELETES for e in t.entries())
        before = t.scan().select("image_id", "phash")
        run_compaction(t, "job-c2", fill_ratio=1.0)
        # compacted files no longer need delete reconciliation for their rows
        after = t.scan().select("image_id", "phash")
        assert row_sets_equal(before, after)
        assert after.count() == N - 20

    def test_resume_skips_done_bins(self, spark, fragmented_table, tmp_table_dir):
        t = fragmented_table
        log = MaintenanceLog(spark, os.path.join(tmp_table_dir, "mlog"))
        expected = t.scan().select("image_id", "phash")
        r1 = run_compaction(t, "job-r", log=log, fill_ratio=1.0, stop_after_bins=1)
        assert r1["bins_executed"] == 1
        # "crash" happened; rerun same job_id → already-done bin skipped
        r2 = run_compaction(t, "job-r", log=log, fill_ratio=1.0)
        assert r2["bins_skipped"] >= 0  # surviving bins may re-plan differently
        assert row_sets_equal(expected, t.scan().select("image_id", "phash"))
        done = log.done_chunk_ids("job-r")
        assert len(done) == r1["bins_executed"] + r2["bins_executed"]

    def test_plan_is_metadata_only(self, fragmented_table):
        bins = plan_compaction(fragmented_table, TARGET, fill_ratio=1.0)
        assert bins and all(b.total_bytes <= TARGET for b in bins)
        # bins never mix partitions (rewrites stay partition-local)
        for b in bins:
            parts = {json.dumps(f.partition, sort_keys=True) for f in b.files}
            assert len(parts) == 1


class TestClustering:
    @pytest.mark.parametrize("curve", ["zorder", "hilbert"])
    def test_rowset_preserved(self, spark, fragmented_table, curve):
        t = fragmented_table
        before = t.scan().select("image_id", "caption", "phash")
        res = run_cluster_rewrite(t, f"job-{curve}", curve=curve, target_bytes=TARGET)
        assert res["rows"] == N
        assert row_sets_equal(before, t.scan().select("image_id", "caption", "phash"))

    def test_phash_minmax_tighten(self, spark, fragmented_table):
        t = fragmented_table

        def overlap_score():
            ents = data_files(t)
            spans = [
                (e.mins["phash"], e.maxs["phash"])
                for e in ents
                if "phash" in e.mins and "phash" in e.maxs
            ]
            total = sum(hi - lo for lo, hi in spans)
            return total / max(1, len(spans))

        before = overlap_score()
        run_cluster_rewrite(t, "job-z2", curve="zorder", target_bytes=TARGET // 4)
        after = overlap_score()
        # clustering by a phash-prefixed curve must tighten per-file phash spans
        assert after < before


class TestMerge:
    @pytest.fixture()
    def base_table(self, spark, tmp_table_dir):
        t = Table.create(
            spark,
            os.path.join(tmp_table_dir, "merge"),
            datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 2),)),
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 200))
        return t

    def test_merge_matches_oracle(self, spark, base_table):
        t = base_table
        base = t.scan().select("image_id", "caption", "phash")
        changes = datagen.gen_changes_df(spark, base_n=200, n_changes=100)
        expected = apply_changes_oracle(
            base, changes.select("image_id", "caption", "phash", "_op_type", "_cdc_timestamp"),
            ["image_id"],
        )
        merge_into(t, changes)
        got = t.scan().select("image_id", "caption", "phash")
        assert row_sets_equal(expected, got)

    def test_same_ts_tie_delete_wins(self, spark, base_table):
        # c → u → d burst at one timestamp: op-priority rule says DELETE wins
        # (IcebergTableOperator.java:70-141)
        t = base_table
        changes = datagen.gen_changes_df(spark, base_n=200, n_changes=100)
        bursts = changes.groupBy("image_id").count().filter("count = 3")
        burst_ids = [r["image_id"] for r in bursts.collect()]
        assert burst_ids
        merge_into(t, changes)
        assert t.scan().filter(F.col("image_id").isin(burst_ids)).count() == 0

    def test_merge_is_single_atomic_snapshot(self, spark, base_table):
        t = base_table
        n_snaps = len(t.snapshots())
        merge_into(t, datagen.gen_changes_df(spark, base_n=200, n_changes=50))
        assert len(t.snapshots()) == n_snaps + 1
        assert t.snapshot()["operation"] == "rowdelta"

    def test_merge_then_compact_keeps_rowset(self, spark, base_table):
        t = base_table
        merge_into(t, datagen.gen_changes_df(spark, base_n=200, n_changes=100))
        before = t.scan().select("image_id", "caption")
        run_compaction(t, "after-merge", fill_ratio=1.0, target_bytes=TARGET)
        assert row_sets_equal(before, t.scan().select("image_id", "caption"))


class TestManifestRewrite:
    def test_rewrite_groups_by_partition_and_audits(self, fragmented_table):
        t = fragmented_table
        before = t.scan().select("image_id", "phash")
        res = rewrite_manifests(t, target_entries=10, audit=True)
        assert res["audited"] > 0
        assert res["manifests_after"] >= 2  # ≥ one per partition value
        assert row_sets_equal(before, t.scan().select("image_id", "phash"))
        # each manifest now holds exactly one partition value
        snap = t.snapshot()
        from olake_spark.icelite.table import _read_manifest

        for m in snap["manifests"]:
            parts = {
                json.dumps(e.partition, sort_keys=True)
                for e in _read_manifest(t._abs(m))
            }
            assert len(parts) == 1


class TestExpireAndOrphans:
    def test_full_lifecycle(self, spark, fragmented_table):
        t = fragmented_table
        run_compaction(t, "lc", fill_ratio=1.0)
        rows = t.scan().select("image_id", "phash")
        n_files_before_reap = sum(
            len(files) for _, _, files in os.walk(os.path.join(t.root, "data"))
        )
        res = run_expire(t, keep_last=1, grace_seconds=0.0)
        assert res["snapshots_expired"] >= 1
        assert res["orphans_removed"] > 0
        n_files_after = sum(
            len(files) for _, _, files in os.walk(os.path.join(t.root, "data"))
        )
        assert n_files_after < n_files_before_reap
        # live data intact
        assert row_sets_equal(rows, t.scan().select("image_id", "phash"))

    def test_grace_period_protects_recent_files(self, fragmented_table):
        t = fragmented_table
        run_compaction(t, "lc2", fill_ratio=1.0)
        t.expire_snapshots(keep_last=1)
        # everything is recent → nothing reaped under a long grace window
        assert t.remove_orphan_files(grace_seconds=3600, dry_run=True) == []


class TestVerify:
    def test_full_scan_verifies(self, spark, fragmented_table):
        t = fragmented_table
        run_compaction(t, "v", fill_ratio=1.0)
        run_cluster_rewrite(t, "v2", curve="hilbert", target_bytes=TARGET)
        s = verify_table_scan(t.scan())
        assert s["rows"] == N
        assert s["pixel_failures"] == 0
        assert s["caption_failures"] == 0
        assert s["min_psnr_db"] >= 40.0


class TestDistributedAudit:
    def test_manifest_audit_routes_through_bulk_stats_harvest(
        self, spark, tmp_table_dir, monkeypatch
    ):
        """The stats audit must be ONE collect_file_stats harvest (executor
        RDD above the threshold), never a serial per-file driver loop: force
        the distribute threshold to 1 so the RDD path itself is exercised,
        and count harvest calls."""
        import olake_spark.icelite.stats as stats_mod
        import olake_spark.operators.manifests as mf_mod
        from olake_spark import datagen
        from olake_spark.icelite import Table

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "audit"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 40), max_records_per_file=10)

        calls = []
        real = stats_mod.collect_file_stats

        def counting(spark_, paths):
            calls.append(len(paths))
            return real(spark_, paths)

        monkeypatch.setattr(stats_mod, "_DISTRIBUTE_THRESHOLD", 1)
        monkeypatch.setattr(mf_mod, "collect_file_stats", counting)
        res = mf_mod.rewrite_manifests(t, target_entries=8, audit=True)
        assert res["audited"] >= 4
        assert len(calls) == 1 and calls[0] == res["audited"]
