"""Maintenance autopilot (operators/autopilot.py): health signals off
pure metadata (zero Spark jobs, pinned), threshold-driven planning with
dependency ordering, data preservation through a full auto run,
idempotence (healthy table plans nothing and commits nothing), the
seq-based clustering-drift trigger, and policy resolution precedence."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.checkpoint import MaintenanceLog
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.autopilot import (DEFAULT_POLICY, inspect_health,
                                             plan_maintenance, resolve_policy,
                                             run_autopilot)

SCAN_COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]


def _messy_table(spark, root, n=120, extra_props=None):
    """Fragmented ingest + two predicate deletes + a follow-up append:
    small-file debt, pos-delete debt, and a snapshot backlog at once."""
    t = Table.create(
        spark, root, datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 2),)),
        identifier_fields=("image_id",),
        properties={"write.target-file-size-bytes": str(4 * 1024 * 1024),
                    **(extra_props or {})},
    )
    t.append(datagen.gen_images_df(spark, n), max_records_per_file=10)
    t.delete_where("phash % 7 = 0")
    t.delete_where("phash % 11 = 3")
    late = datagen.gen_images_df(spark, 20).withColumn(
        "image_id", F.concat(F.lit("late-"), F.col("image_id"))
    )
    t.append(late, max_records_per_file=5)
    return t


@pytest.fixture()
def messy(spark, tmp_path):
    return _messy_table(spark, str(tmp_path / "tbl"))


class TestHealthAndPlan:
    def test_health_signals(self, spark, messy):
        h = inspect_health(messy)
        assert h["data_files"] >= 12  # 140 rows at ≤10/file over 2 buckets
        assert h["small_files"] == h["data_files"]  # every file is tiny
        assert h["pos_delete_files"] >= 2  # one+ per delete commit
        assert h["delete_records"] > 0
        assert h["delete_ratio_ppm"] == (
            h["delete_records"] * 1_000_000 // h["data_records"]
        )
        assert h["snapshots"] == 4  # create-less: 2 appends + 2 deletes
        assert h["last_cluster_seq"] is None
        assert h["unclustered_ppm"] == 1_000_000

    def test_plan_triggers_and_dependency_order(self, spark, messy):
        plan = plan_maintenance(messy, {"expire.max-snapshots": 3})
        ops = [a["op"] for a in plan]
        assert ops == ["rewrite-deletes", "compact", "expire"]
        assert "pos-delete files" in plan[0]["reason"]
        assert "files under" in plan[1]["reason"]
        assert "4 snapshots (max 3)" in plan[2]["reason"]

    def test_healthy_table_plans_nothing(self, spark, tmp_path):
        t = Table.create(
            spark, str(tmp_path / "ok"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 40))
        assert plan_maintenance(t) == []
        snap = t.current_snapshot_id
        report = run_autopilot(t, "noop-job")
        assert report["actions"] == []
        assert t.refresh().current_snapshot_id == snap  # committed nothing

    def test_planning_is_metadata_only(self, spark, messy):
        tracker = spark.sparkContext.statusTracker()
        spark.sparkContext.setJobGroup("autopilot-pin", "autopilot-pin")
        try:
            before = len(tracker.getJobIdsForGroup("autopilot-pin"))
            plan_maintenance(messy, {"expire.max-snapshots": 3})
            after = len(tracker.getJobIdsForGroup("autopilot-pin"))
        finally:
            spark.sparkContext.setJobGroup(None, None)
        assert after == before  # zero jobs: pure metadata planning

    def test_dry_run_commits_nothing(self, spark, messy):
        snap = messy.current_snapshot_id
        report = run_autopilot(messy, "dry-job", execute=False)
        assert report["dry_run"] and len(report["actions"]) >= 2
        assert all("result" not in a for a in report["actions"])
        assert messy.refresh().current_snapshot_id == snap


class TestRunAutopilot:
    def test_restores_health_and_preserves_rows(self, spark, messy):
        before_rows = sorted(
            (r["image_id"], r["caption"], r["phash"])
            for r in messy.scan(columns=SCAN_COLS).collect()
        )
        policy = {"expire.max-snapshots": 3, "expire.grace-seconds": 0.0}
        log = MaintenanceLog(spark, os.path.join(messy.root, "..", "mlog"))
        report = run_autopilot(messy, "auto-1", policy=policy, log=log)
        ops = [a["op"] for a in report["actions"]]
        assert ops == ["rewrite-deletes", "compact", "expire"]
        assert all("result" in a for a in report["actions"])

        after_rows = sorted(
            (r["image_id"], r["caption"], r["phash"])
            for r in messy.scan(columns=SCAN_COLS).collect()
        )
        assert after_rows == before_rows  # maintenance never changes data

        h = report["health_after"]
        assert h["small_files"] < 5  # compacted below the trigger
        assert h["pos_delete_files"] == 0  # folded in, then purged
        assert h["snapshots"] == 1  # expire fell back to keep_last=1

        # a healthy table plans nothing: the autopilot is idempotent
        again = run_autopilot(messy, "auto-2", policy=policy, log=log)
        assert again["actions"] == []
        assert again["health_before"] == again["health_after"]

    def test_cluster_drift_trigger(self, spark, tmp_path):
        t = _messy_table(
            spark, str(tmp_path / "ctbl"),
            extra_props={"autopilot.cluster.curve": "hilbert"},
        )
        policy = {"expire.max-snapshots": 3, "expire.grace-seconds": 0.0}
        report = run_autopilot(t, "auto-c1", policy=policy)
        ops = [a["op"] for a in report["actions"]]
        assert ops == ["rewrite-deletes", "compact", "cluster", "expire"]
        assert report["health_after"]["unclustered_ppm"] == 0

        # small delta: below the 30% drift line → no recluster planned
        t.append(datagen.gen_images_df(spark, 10), max_records_per_file=10)
        assert "cluster" not in [a["op"] for a in plan_maintenance(t, policy)]
        # large delta: crosses the line → recluster fires again
        t.append(datagen.gen_images_df(spark, 120), max_records_per_file=60)
        h = inspect_health(t, policy)
        assert h["unclustered_ppm"] >= 300_000
        assert "cluster" in [a["op"] for a in plan_maintenance(t, policy)]


class TestPolicyResolution:
    def test_property_overrides_default_and_param_overrides_property(
        self, spark, tmp_path
    ):
        t = Table.create(
            spark, str(tmp_path / "p"), datagen.IMAGES_SCHEMA,
            properties={"autopilot.compact.min-input-files": "9",
                        "autopilot.cluster.key-cols": "w, h, phash",
                        "autopilot.cluster.curve": "zorder"},
        )
        pol = resolve_policy(t)
        assert pol["compact.min-input-files"] == 9
        assert pol["cluster.key-cols"] == ("w", "h", "phash")
        assert pol["cluster.curve"] == "zorder"
        pol2 = resolve_policy(t, {"compact.min-input-files": 3})
        assert pol2["compact.min-input-files"] == 3

    def test_unknown_policy_key_rejected(self, spark, tmp_path):
        t = Table.create(spark, str(tmp_path / "q"), datagen.IMAGES_SCHEMA)
        with pytest.raises(ValueError, match="unknown policy"):
            resolve_policy(t, {"compactt.min-input-files": 3})

    def test_defaults_are_iceberg_shaped(self):
        assert DEFAULT_POLICY["compact.min-input-files"] == 5
        assert DEFAULT_POLICY["cluster.curve"] is None  # clustering opt-in
