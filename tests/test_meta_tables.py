"""All-snapshots metadata tables (icelite/meta.py): attribution,
manifest-reuse economics, empty-table shapes, CLI-reachable surface."""

import os

from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite.meta import all_files_df, all_manifests_df
from olake_spark.icelite.table import DATA, Table


def _table(spark, root):
    t = Table.create(
        spark, root, datagen.IMAGES_SCHEMA, identifier_fields=("image_id",)
    )
    t.append(datagen.gen_images_df(spark, 30))
    t.append(
        datagen.gen_images_df(spark, 10).withColumn(
            "image_id", F.concat(F.lit("b-"), F.col("image_id"))
        )
    )
    t.delete_where("phash % 5 = 0")
    return t


def test_all_files_attributes_every_snapshot(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "t"))
    af = all_files_df(t)
    snaps = [s["snapshot_id"] for s in t.snapshots()]
    got_snaps = {r["snapshot_id"] for r in af.select("snapshot_id").distinct().collect()}
    assert got_snaps == set(snaps)
    # per-snapshot slice == that snapshot's own files table (same row count
    # and same file-path multiset)
    for sid in snaps:
        own = t.inspect_files(sid)
        mine = af.filter(F.col("snapshot_id") == sid)
        assert mine.count() == own.count()
        assert (
            sorted(r["file_path"] for r in mine.select("file_path").collect())
            == sorted(r["file_path"] for r in own.select("file_path").collect())
        )
    # the first snapshot's files are still referenced by later ones: the
    # same file_path appears under multiple snapshot_ids (the attribution
    # IS the point of the view)
    multi = (
        af.groupBy("file_path")
        .agg(F.countDistinct("snapshot_id").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert multi > 0


def test_all_manifests_counts_match_per_snapshot_view(spark, tmp_table_dir):
    t = _table(spark, os.path.join(tmp_table_dir, "t2"))
    am = all_manifests_df(t).collect()
    by_snap = {}
    for r in am:
        by_snap.setdefault(r["snapshot_id"], []).append(r)
    for s in t.snapshots():
        rows = by_snap[s["snapshot_id"]]
        assert sorted(r["manifest_path"] for r in rows) == sorted(s["manifests"])
        # entry totals agree with the snapshot's files table
        total = sum(r["entry_count"] for r in rows)
        assert total == t.inspect_files(s["snapshot_id"]).count()
        data_total = sum(r["data_file_count"] for r in rows)
        assert data_total == sum(
            1
            for e in t.entries(s["snapshot_id"])
            if e.content == DATA
        )


def test_empty_table_shapes(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "e"),
        datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    assert all_files_df(t).count() == 0
    assert all_manifests_df(t).count() == 0
    assert "snapshot_id" in all_files_df(t).columns


def test_distinct_manifests_read_once(spark, tmp_table_dir):
    # two snapshots sharing a manifest: the view attributes it to both,
    # from ONE distributed read of the distinct manifest set (economics
    # asserted via the scan's input paths in the plan)
    t = _table(spark, os.path.join(tmp_table_dir, "t3"))
    pairs = [
        (s["snapshot_id"], m) for s in t.snapshots() for m in s["manifests"]
    ]
    distinct = {m for _, m in pairs}
    assert len(pairs) > len(distinct)  # reuse actually happens here
    plan = all_files_df(t)._jdf.queryExecution().executedPlan().toString()
    # the attribution rides a broadcast hash join — never a shuffled join
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
