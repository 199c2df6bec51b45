"""Autopilot bloom-coverage lifecycle: staleness signal, rebuild planning
after rewrites, end-to-end coverage restoration (operators/autopilot.py ×
icelite/bloom.py)."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite.bloom import bloom_file_filter, build_bloom_index, point_lookup
from olake_spark.icelite.spec import PartitionField, PartitionSpec
from olake_spark.icelite.table import DATA, Table
from olake_spark.operators.autopilot import (
    inspect_health,
    plan_maintenance,
    run_autopilot,
)

POLICY = {
    "bloom.columns": ("image_id",),
    "bloom.max-stale-ppm": 300_000,
    "cluster.curve": None,
}


def _fragmented(spark, root, n=120):
    t = Table.create(
        spark, root, datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 2),)),
        identifier_fields=("image_id",),
        properties={"write.target-file-size-bytes": str(4 * 1024 * 1024)},
    )
    t.append(datagen.gen_images_df(spark, n), max_records_per_file=10)
    return t


def test_missing_index_reads_fully_stale(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path / "t1"))
    h = inspect_health(t, POLICY)
    assert h["bloom"]["image_id"]["indexed_snapshot"] is None
    assert h["bloom"]["image_id"]["uncovered_ppm"] == 1_000_000
    ops = [a["op"] for a in plan_maintenance(t, POLICY, health=h)]
    assert "bloom" in ops
    # bloom runs AFTER the rewrites it depends on
    assert ops.index("bloom") > ops.index("compact")


def test_no_policy_no_bloom_signal(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path / "t2"))
    h = inspect_health(t)
    assert "bloom" not in h
    assert all(a["op"] != "bloom" for a in plan_maintenance(t, health=h))


def test_fresh_index_quiet_until_append(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path / "t3"))
    build_bloom_index(t, "image_id")
    h = inspect_health(t, POLICY)
    assert h["bloom"]["image_id"]["uncovered_ppm"] == 0
    # small-file debt still plans compact — and a planned rewrite drags a
    # bloom rebuild in behind it even though coverage is currently full
    ops = [a["op"] for a in plan_maintenance(t, POLICY, health=h)]
    assert "compact" in ops and "bloom" in ops

    # with every other trigger quiet (thresholds parked sky-high), full
    # coverage plans nothing — the bloom arm alone decides
    quiet = {
        **POLICY,
        "compact.min-input-files": 10**9,
        "deletes.min-delete-files": 10**9,
        "deletes.max-delete-ratio-ppm": 10**9,
        "manifests.max-count": 10**9,
        "expire.max-snapshots": 10**9,
    }
    t2 = Table.create(
        spark, str(tmp_path / "t3b"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t2.append(datagen.gen_images_df(spark, 40))
    build_bloom_index(t2, "image_id")
    assert plan_maintenance(t2, quiet) == []
    # a below-threshold append stays quiet; past-threshold fires
    t2.append(
        datagen.gen_images_df(spark, 10).withColumn(
            "image_id", F.concat(F.lit("x-"), F.col("image_id"))
        )
    )
    h2 = inspect_health(t2, quiet)
    assert 0 < h2["bloom"]["image_id"]["uncovered_ppm"] < 300_000
    assert plan_maintenance(t2, quiet, health=h2) == []
    t2.append(
        datagen.gen_images_df(spark, 60).withColumn(
            "image_id", F.concat(F.lit("y-"), F.col("image_id"))
        )
    )
    h3 = inspect_health(t2, quiet)
    assert h3["bloom"]["image_id"]["uncovered_ppm"] >= 300_000
    assert [a["op"] for a in plan_maintenance(t2, quiet, health=h3)] == [
        "bloom"
    ]


def test_autopilot_restores_coverage_and_lookup(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path / "t4"))
    build_bloom_index(t, "image_id")
    report = run_autopilot(t, "ap-bloom", policy=POLICY)
    ops = [a["op"] for a in report["actions"]]
    assert "compact" in ops and "bloom" in ops
    bloom_res = next(a for a in report["actions"] if a["op"] == "bloom")
    assert bloom_res["result"]["image_id"]["n_files"] == len(
        [e for e in t.entries() if e.content == DATA]
    )
    assert report["health_after"]["bloom"]["image_id"]["uncovered_ppm"] == 0
    # the rebuilt index prunes on the COMPACTED files and lookups are exact
    some_id = t.scan(columns=["image_id"]).first()["image_id"]
    assert point_lookup(t, "image_id", [some_id]).count() == 1
    ff = bloom_file_filter(t, "image_id", [some_id])
    assert ff is not None and len(ff) <= max(
        1, len([e for e in t.entries() if e.content == DATA])
    )


def test_dry_run_plans_but_commits_nothing(spark, tmp_path):
    t = _fragmented(spark, str(tmp_path / "t5"))
    snap = t.current_snapshot_id
    report = run_autopilot(t, "ap-dry", policy=POLICY, execute=False)
    assert any(a["op"] == "bloom" for a in report["actions"])
    t.refresh()
    assert t.current_snapshot_id == snap
    assert not os.path.isdir(os.path.join(t.root, "metadata", "bloom"))


class TestFleet:
    def test_fleet_sweep_heterogeneous(self, spark, tmp_path):
        from olake_spark.icelite import Catalog
        from olake_spark.operators.autopilot import run_fleet

        cat = Catalog(spark, str(tmp_path / "wh"))
        # messy: fragmented -> needs compact; its own property opts into bloom
        messy = cat.create_table(
            "default.messy", datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
            properties={
                "write.target-file-size-bytes": str(4 * 1024 * 1024),
                "autopilot.bloom.columns": "image_id",
            },
        )
        messy.append(datagen.gen_images_df(spark, 80), max_records_per_file=10)
        # healthy: one fat file, no policy opt-ins
        healthy = cat.create_table(
            "default.healthy", datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
            properties={"write.target-file-size-bytes": "1024"},
        )
        healthy.append(datagen.gen_images_df(spark, 20))

        report = run_fleet(cat, "fleet-1")
        assert report["n_tables"] == 2
        assert report["n_errors"] == 0
        ops = [a["op"] for a in report["tables"]["default.messy"]["actions"]]
        assert "compact" in ops and "bloom" in ops
        assert report["tables"]["default.healthy"]["actions"] == []
        assert report["n_with_actions"] == 1
        # the sweep really ran: the messy table is compacted + indexed
        messy.refresh()
        h = inspect_health(messy, {"bloom.columns": ("image_id",)})
        assert h["bloom"]["image_id"]["uncovered_ppm"] == 0
        assert point_lookup(
            messy, "image_id",
            [messy.scan(columns=["image_id"]).first()["image_id"]],
        ).count() == 1

    def test_fleet_survives_a_broken_table(self, spark, tmp_path):
        from olake_spark.icelite import Catalog
        from olake_spark.operators.autopilot import run_fleet

        cat = Catalog(spark, str(tmp_path / "wh2"))
        ok = cat.create_table(
            "default.ok", datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        ok.append(datagen.gen_images_df(spark, 10))
        broken = cat.create_table(
            "default.broken", datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        broken.append(datagen.gen_images_df(spark, 10))
        # wreck the metadata while the listing still sees a table dir
        # (version-hint intact, current metadata JSON corrupted)
        hint = os.path.join(broken.root, "metadata", "version-hint.text")
        v = int(open(hint).read().strip())
        with open(
            os.path.join(
                broken.root, "metadata", f"v{v:05d}.metadata.json"
            ),
            "w",
        ) as f:
            f.write("{corrupt")
        report = run_fleet(cat, "fleet-2", execute=False)
        assert report["n_errors"] == 1
        assert "error" in report["tables"]["default.broken"]
        assert "error" not in report["tables"]["default.ok"]

    def test_fleet_dry_run_commits_nothing(self, spark, tmp_path):
        from olake_spark.icelite import Catalog
        from olake_spark.operators.autopilot import run_fleet

        cat = Catalog(spark, str(tmp_path / "wh3"))
        t = cat.create_table(
            "default.t", datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
            properties={"write.target-file-size-bytes": str(4 * 1024 * 1024)},
        )
        t.append(datagen.gen_images_df(spark, 60), max_records_per_file=10)
        snap = t.current_snapshot_id
        report = run_fleet(cat, "fleet-3", execute=False)
        assert report["dry_run"] is True
        assert report["tables"]["default.t"]["actions"]
        t.refresh()
        assert t.current_snapshot_id == snap
