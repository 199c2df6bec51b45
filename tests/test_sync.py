"""`sync` verb: chunked resumable backfill + streaming CDC apply."""

import os

from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.checkpoint import MaintenanceLog
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.sync import apply_cdc_stream, backfill, plan_chunks
from olake_spark.verify import row_sets_equal


class TestBackfill:
    def test_full_load_matches_source(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "bf"), datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 2),)),
            identifier_fields=("image_id",),
        )
        src = datagen.gen_images_df(spark, 200)
        res = backfill(t, src, key_col="phash", job_id="bf1", n_chunks=8)
        assert res["rows_written"] == 200 and res["chunks_executed"] > 0
        assert row_sets_equal(
            src.select("image_id", "phash"), t.scan().select("image_id", "phash")
        )

    def test_resume_skips_done_chunks(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "bf2"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        log = MaintenanceLog(spark, os.path.join(tmp_table_dir, "bflog"))
        src = datagen.gen_images_df(spark, 150)
        r1 = backfill(t, src, "phash", "job", log=log, n_chunks=6)
        assert r1["chunks_executed"] > 0
        r2 = backfill(t, src, "phash", "job", log=log, n_chunks=6)
        assert r2["chunks_executed"] == 0
        assert r2["chunks_skipped"] == r1["chunks_planned"]
        # no duplicate rows from the rerun
        assert t.scan().count() == 150

    def test_plan_chunks_cover_domain(self, spark):
        src = spark.range(1000).select(F.col("id").alias("k"))
        chunks = plan_chunks(src, "k", 4)
        assert chunks[0][0] is None and chunks[-1][1] is None
        assert len(chunks) == 4


class TestCdcStream:
    def test_stream_apply_matches_batch_merge(self, spark, tmp_path):
        from olake_spark.operators.merge import apply_changes_oracle

        t = Table.create(
            spark, str(tmp_path / "cdc"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 100))
        changes = datagen.gen_changes_df(spark, base_n=100, n_changes=50)
        feed = str(tmp_path / "feed")
        # a change LOG is ordered; one file = one in-order batch (cross-batch
        # resolution is write-order, exactly the reference's equality-delete
        # semantics — so the log must arrive in log order, as it does from a
        # real WAL/binlog/change-stream)
        changes.orderBy("_cdc_timestamp", "image_id").coalesce(1).write.parquet(feed)

        base = t.scan().select("image_id", "caption", "phash")
        expected = apply_changes_oracle(
            base,
            changes.select("image_id", "caption", "phash", "_op_type",
                           "_cdc_timestamp"),
            ["image_id"],
        )
        stream = (
            spark.readStream.schema(datagen.CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        apply_cdc_stream(t, stream, str(tmp_path / "ckpt"))
        got = t.scan().select("image_id", "caption", "phash")
        assert row_sets_equal(expected, got)


class TestCompositeKeyBackfill:
    def test_lexicographic_composite_chunks_and_resume(self, spark, tmp_table_dir):
        """S8: chunk on (fmt, image_id) — a string composite key the numeric
        path can't handle; full load + resume no-op + no duplicates."""
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "bfc"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        log = MaintenanceLog(spark, os.path.join(tmp_table_dir, "bfclog"))
        src = datagen.gen_images_df(spark, 150)
        r1 = backfill(t, src, ("fmt", "image_id"), "cj", log=log, n_chunks=5)
        assert r1["rows_written"] == 150 and r1["chunks_executed"] > 1
        r2 = backfill(t, src, ("fmt", "image_id"), "cj", log=log, n_chunks=5)
        assert r2["chunks_executed"] == 0
        assert t.scan().count() == 150
        assert t.scan().select(F.countDistinct("image_id")).collect()[0][0] == 150

    def test_chunk_plan_covers_key_space(self, spark):
        from olake_spark.sync import plan_chunks_multi

        src = datagen.gen_images_df(spark, 120)
        chunks = plan_chunks_multi(src, ["fmt", "image_id"], 4)
        assert chunks[0][0] is None and chunks[-1][1] is None
        # boundaries strictly increase lexicographically
        bounds = [hi for _, hi in chunks[:-1]]
        assert bounds == sorted(bounds) and len(set(bounds)) == len(bounds)


class TestCliSync:
    def test_cli_sync_backfill_resume_and_cdc(self, spark, tmp_table_dir, capsys):
        """`python -m olake_spark sync` — the reference's main verb
        (protocol/root.go:73): create+backfill, resume as a no-op with the
        same --job-id/--log, then drain a CDC feed with a checkpoint."""
        import json as _json

        from olake_spark.__main__ import main

        src_dir = os.path.join(tmp_table_dir, "src")
        datagen.gen_images_df(spark, 60).write.parquet(src_dir)
        tbl = os.path.join(tmp_table_dir, "clitbl")
        logd = os.path.join(tmp_table_dir, "clilog")
        argv = ["sync", "--table", tbl, "--source", src_dir, "--create",
                "--id-fields", "image_id", "--key-col", "phash",
                "--job-id", "cli1", "--log", logd, "--n-chunks", "4"]
        assert main(argv) == 0
        out1 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out1["backfill"]["chunks_executed"] > 0
        assert out1["total_records"] == 60
        assert main(argv) == 0
        out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out2["backfill"]["chunks_executed"] == 0
        assert out2["total_records"] == 60  # resume wrote nothing

        feed = os.path.join(tmp_table_dir, "feed")
        datagen.gen_changes_df(spark, base_n=60, n_changes=20).coalesce(1)\
            .write.parquet(feed)
        ckpt = os.path.join(tmp_table_dir, "ckpt")
        argv_cdc = ["sync", "--table", tbl, "--source", src_dir,
                    "--job-id", "cli1", "--cdc-feed", feed,
                    "--checkpoint", ckpt]
        assert main(argv_cdc) == 0
        out3 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out3["cdc"]["applied"] and out3["snapshot_id"] > out2["snapshot_id"]
        # re-drain with the same checkpoint: offsets consumed, state unchanged
        assert main(argv_cdc) == 0
        out4 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out4["total_records"] == out3["total_records"]


class TestNullKeyBackfill:
    def test_null_keys_route_to_leftmost_chunk(self, spark, tmp_table_dir):
        """Rows whose chunk key is NULL fail every range comparison — they
        must land in the unbounded-left chunk (stably across resume), never
        be silently dropped from a 'full load'."""
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "nullbf"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        src = datagen.gen_images_df(spark, 60).withColumn(
            "fmt",
            F.when(F.pmod(F.xxhash64("image_id"), F.lit(5)) == 0,
                   F.lit(None).cast("string")).otherwise(F.col("fmt")),
        )
        n_null = src.filter(F.col("fmt").isNull()).count()
        assert n_null > 0
        log = MaintenanceLog(spark, os.path.join(tmp_table_dir, "nullbflog"))
        r1 = backfill(t, src, ("fmt", "image_id"), "nk", log=log, n_chunks=4)
        assert r1["rows_written"] == 60
        assert t.scan().count() == 60
        r2 = backfill(t, src, ("fmt", "image_id"), "nk", log=log, n_chunks=4)
        assert r2["chunks_executed"] == 0
        assert t.scan().count() == 60  # resume rewrote nothing


class TestStringKeyBackfill:
    def test_single_string_key_routes_to_lexicographic_planner(
        self, spark, tmp_table_dir
    ):
        """A single STRING --key-col must not hit the numeric approxQuantile
        cast (CAST_INVALID_INPUT) — it routes to the sampled lexicographic
        planner, same as composite keys."""
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "bfs"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        log = MaintenanceLog(spark, os.path.join(tmp_table_dir, "bfslog"))
        src = datagen.gen_images_df(spark, 120)
        r1 = backfill(t, src, "image_id", "sj", log=log, n_chunks=5)
        assert r1["rows_written"] == 120 and r1["chunks_executed"] > 1
        r2 = backfill(t, src, "image_id", "sj", log=log, n_chunks=5)
        assert r2["chunks_executed"] == 0
        assert t.scan().select(F.countDistinct("image_id")).collect()[0][0] == 120
