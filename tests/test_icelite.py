"""End-to-end slice (SURVEY.md §7 step 1) + icelite format invariants."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.functions.imagecodec import decode_image, psnr
from olake_spark.icelite import PartitionField, PartitionSpec, Table

N = 300


@pytest.fixture()
def images_table(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "images"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, N))
    return t


class TestEndToEndSlice:
    def test_count_distinct_roundtrip(self, images_table):
        # the reference's own oracle: COUNT(DISTINCT id) after full load
        # (drivers/abstract/test_utils.go:206-208)
        got = images_table.scan().agg(
            F.countDistinct("image_id").alias("n")
        ).collect()[0]["n"]
        assert got == N

    def test_schema_stable(self, images_table):
        assert [f.name for f in images_table.scan().schema.fields] == [
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        ]

    def test_pixel_and_caption_invariants(self, images_table):
        rows = images_table.scan().filter(F.col("image_id") < "img-000000000020").collect()
        assert len(rows) == 20
        for r in rows:
            i = int(r["image_id"].split("-")[1])
            exp = datagen.expected_pixels(i)
            dec = decode_image(bytes(r["bytes"]))
            if r["fmt"] == "png":
                assert np.array_equal(dec, exp)
            else:
                assert psnr(dec, exp) >= 40.0
            assert r["caption"] == datagen._caption(i)

    def test_column_pruning_scan(self, images_table):
        df = images_table.scan(columns=["image_id", "phash"])
        assert df.columns == ["image_id", "phash"]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bytes" not in plan  # heavy column never read

    def test_predicate_file_pruning(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "pp"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        # two appends → two files with disjoint image_id ranges
        df = datagen.gen_images_df(spark, 100, parallelism=1)
        t.append(df.filter(F.col("image_id") < "img-000000000050").coalesce(1))
        t.append(df.filter(F.col("image_id") >= "img-000000000050").coalesce(1))
        ents = [e for e in t.entries() if e.content == 0]
        assert len(ents) == 2
        preds = [("image_id", "<", "img-000000000010")]
        pruned = [e for e in ents if __import__(
            "olake_spark.icelite.table", fromlist=["_may_match"]
        )._may_match(e, preds)]
        assert len(pruned) == 1
        assert t.scan(predicates=preds).count() == 10


class TestSnapshotIsolation:
    def test_pinned_reader_sees_old_data(self, spark, images_table):
        snap0 = images_table.current_snapshot_id
        images_table.append(datagen.gen_images_df(spark, 50).withColumn(
            "image_id", F.concat(F.lit("new-"), F.col("image_id"))
        ))
        assert images_table.scan(snapshot_id=snap0).count() == N
        assert images_table.scan().count() == N + 50

    def test_expire_and_orphans(self, spark, images_table):
        snap0 = images_table.current_snapshot_id
        images_table.append(datagen.gen_images_df(spark, 10).withColumn(
            "image_id", F.concat(F.lit("x-"), F.col("image_id"))
        ))
        images_table.expire_snapshots(keep_last=1)
        with pytest.raises(KeyError):
            images_table.snapshot(snap0)
        # nothing is orphaned yet (all files still referenced by current)
        assert images_table.remove_orphan_files(grace_seconds=0, dry_run=True) == []


class TestRowDelta:
    def test_equality_delete_applies_to_older_files_only(self, spark, images_table):
        # delete 10 ids, and in the same commit re-insert 5 of them updated
        ids = [f"img-{i:012d}" for i in range(10)]
        del_keys = spark.createDataFrame([(i,) for i in ids], ["image_id"])
        reinsert = (
            datagen.gen_images_df(spark, 5)
            .withColumn("caption", F.concat(F.lit("v2 "), F.col("caption")))
        )
        images_table.row_delta(reinsert, del_keys)
        df = images_table.scan()
        assert df.count() == N - 10 + 5
        v2 = df.filter(F.col("image_id") < "img-000000000005").collect()
        assert len(v2) == 5 and all(r["caption"].startswith("v2 ") for r in v2)
        gone = df.filter(
            (F.col("image_id") >= "img-000000000005")
            & (F.col("image_id") < "img-000000000010")
        )
        assert gone.count() == 0

    def test_delete_only_commit(self, spark, images_table):
        keys = spark.createDataFrame([("img-000000000042",)], ["image_id"])
        images_table.row_delta(None, keys)
        assert images_table.scan().filter(F.col("image_id") == "img-000000000042").count() == 0
        assert images_table.scan().count() == N - 1


class TestConcurrency:
    def test_optimistic_commit_both_win(self, spark, images_table):
        t2 = Table.load(spark, images_table.root)
        images_table.append(datagen.gen_images_df(spark, 5).withColumn(
            "image_id", F.concat(F.lit("a-"), F.col("image_id"))))
        t2.append(datagen.gen_images_df(spark, 5).withColumn(
            "image_id", F.concat(F.lit("b-"), F.col("image_id"))))
        images_table.refresh()
        assert images_table.scan().count() == N + 10


class TestFileIO:
    def test_full_lifecycle_through_conditional_put_io(
        self, spark, tmp_table_dir, monkeypatch
    ):
        """The engine must run end-to-end on a FileIO whose commit CAS is a
        store-side conditional put — with os.link (the POSIX-only
        linearization) forbidden outright, proving the metadata layer has no
        hidden POSIX dependency left."""
        import os as _os

        from olake_spark import datagen
        from olake_spark.icelite import ConditionalPutFileIO, Table
        from olake_spark.operators.compact import run_compaction
        from olake_spark.operators.merge import merge_into

        def no_link(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("os.link used despite ConditionalPutFileIO")

        monkeypatch.setattr(_os, "link", no_link)
        io = ConditionalPutFileIO()
        root = os.path.join(tmp_table_dir, "condput")
        t = Table.create(
            spark, root, datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",), io=io,
        )
        datagen.fragmented_append(t, datagen.gen_images_df(spark, 60), 60,
                                  n_files=6)
        changes = datagen.gen_changes_df(spark, base_n=60, n_changes=20)
        merge_into(t, changes, keep_deletes=False)
        run_compaction(t, "iojob", fill_ratio=1.0, target_bytes=1 << 21)
        t2 = Table.load(spark, root, io=ConditionalPutFileIO())
        assert t2.scan().count() == t.scan().count() > 0
        assert t2.current_snapshot_id == t.current_snapshot_id


class TestSortOrder:
    def test_declared_sort_order_applies_within_files(self, spark, tmp_table_dir):
        """O3: tables declare a sort order (default: PK asc, the reference's
        IcebergUtil.java:210-217); every appended data file must be sorted by
        it within the file."""
        import pyarrow.parquet as pq

        from olake_spark import datagen
        from olake_spark.icelite import Table

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "sorted"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        assert t.sort_order == ["image_id"]
        # shuffle the input so sortedness can only come from the writer
        df = datagen.gen_images_df(spark, 80).orderBy(F.rand(7))
        t.append(df, max_records_per_file=20)
        data_files = [e for e in t.entries() if e.content == 0]
        assert len(data_files) >= 2
        for e in data_files:
            ids = pq.read_table(t._abs(e.file_path), columns=["image_id"])[
                "image_id"
            ].to_pylist()
            assert ids == sorted(ids), f"{e.file_path} not sorted"


class TestInspectTables:
    """Iceberg-style queryable metadata tables (tbl.files / .partitions /
    .manifests / .snapshots / .history / .refs as DataFrames). The
    files/partitions/manifests paths are DISTRIBUTED manifest scans — the
    plan reads manifest parquet, never data files."""

    @pytest.fixture()
    def table(self, spark, tmp_table_dir):
        t = Table.create(
            spark,
            os.path.join(tmp_table_dir, "inspect"),
            datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("fmt", "identity"),)),
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 100), max_records_per_file=25)
        t.delete_where("phash % 5 = 0")
        return t

    def test_files_matches_entries(self, table):
        rows = table.inspect_files().collect()
        entries = table.entries()
        assert len(rows) == len(entries)
        assert {r["file_path"] for r in rows} == {e.file_path for e in entries}
        assert sum(r["record_count"] for r in rows if r["content"] == 0) == 100

    def test_partitions_live_count_matches_scan(self, table):
        live = table.inspect_partitions().agg(
            F.sum(F.col("data_record_count") - F.col("pos_delete_record_count"))
        ).collect()[0][0]
        assert live == table.scan().count()

    def test_partitions_is_metadata_only(self, table):
        # the plan must scan manifest parquet, never a data/delete file
        plan = table.inspect_partitions()._jdf.queryExecution().executedPlan().toString()
        assert "metadata/manifests" in plan
        assert "/data/" not in plan and "/deletes/" not in plan

    def test_manifests_covers_snapshot(self, table):
        rows = table.inspect_manifests().collect()
        snap = table.snapshot()
        assert len(rows) == len(snap["manifests"])
        assert sum(r["entry_count"] for r in rows) == len(table.entries())
        assert sum(r["delete_file_count"] for r in rows) >= 1

    def test_snapshots_and_history(self, table):
        snaps = {r["snapshot_id"]: r for r in table.inspect_snapshots().collect()}
        assert [snaps[k]["operation"] for k in sorted(snaps)] == ["append", "delete"]
        hist = table.inspect_history().collect()
        assert all(r["is_current_ancestor"] for r in hist)
        # an un-merged branch commit is NOT a current ancestor
        table.create_branch("side")
        table.append_to_branch("side", datagen.gen_images_df(spark=table.spark, n=5))
        flags = {
            r["snapshot_id"]: r["is_current_ancestor"]
            for r in table.inspect_history().collect()
        }
        head = table.branches()["side"]
        assert flags[head] is False
        assert sum(1 for v in flags.values() if v) == 2

    def test_refs(self, table):
        table.create_tag("v1")
        table.create_branch("dev")
        refs = {(r["name"], r["type"]): r["snapshot_id"]
                for r in table.inspect_refs().collect()}
        cur = table.current_snapshot_id
        assert refs[("v1", "tag")] == cur
        assert refs[("dev", "branch")] == cur
        assert refs[("main", "branch")] == cur
