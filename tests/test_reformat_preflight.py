"""P1/P2/P3 reformat transforms + check/discover equivalents."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, LongType, StringType, StructField,
                               StructType, TimestampType)

from olake_spark.functions.reformat import (canonicalize_columns,
                                            coerce_to_schema,
                                            flatten_top_level, reformat_key)
from olake_spark.preflight import discover, preflight


class TestReformat:
    def test_key_reformat_rule(self):
        # flatten.go:77-98: lowercase, non-alphanumerics → _
        assert reformat_key("User-Name") == "user_name"
        assert reformat_key("A B.C/d") == "a_b_c_d"
        assert reformat_key("ok123") == "ok123"

    def test_canonicalize_with_collision(self, spark):
        df = spark.createDataFrame([(1, 2, 3)], ["User Id", "user-id", "ok"])
        out = canonicalize_columns(df)
        assert out.columns == ["user_id", "user_id_1", "ok"]

    def test_flatten_serializes_nested(self, spark):
        df = spark.createDataFrame(
            [(1, {"a": 1}, [1, 2])], ["id", "obj", "arr"]
        )
        out = flatten_top_level(df)
        r = out.collect()[0]
        assert r["obj"] == '{"a":1}' and r["arr"] == "[1,2]"
        assert dict(out.dtypes)["obj"] == "string"

    def test_coerce_casts_nulls_and_missing(self, spark):
        df = spark.createDataFrame(
            [("5", "not-a-number", "2026-01-02 03:04:05")],
            ["a", "b", "ts"],
        )
        target = StructType(
            [
                StructField("a", LongType()),
                StructField("b", IntegerType()),
                StructField("ts", TimestampType()),
                StructField("missing", StringType()),
            ]
        )
        r = coerce_to_schema(df, target).collect()[0]
        assert r["a"] == 5
        assert r["b"] is None  # unparseable → null, not error
        assert r["ts"].year == 2026
        assert r["missing"] is None


class TestPreflight:
    def test_preflight_roundtrip(self, spark, tmp_table_dir):
        wh = os.path.join(tmp_table_dir, "wh")
        assert preflight(spark, wh)["ok"] is True
        assert discover(spark, wh) == []  # scratch cleaned up

    def test_discover_lists_tables(self, spark, tmp_table_dir):
        from olake_spark import datagen
        from olake_spark.icelite import Table

        wh = os.path.join(tmp_table_dir, "wh2")
        t = Table.create(
            spark, os.path.join(wh, "images"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 10))
        cat = discover(spark, wh)
        assert len(cat) == 1
        info = cat[0]
        assert info["table"] == "images"
        assert info["identifier_fields"] == ["image_id"]
        assert info["total_records"] == 10
        assert {c["name"] for c in info["schema"]} >= {"image_id", "bytes", "phash"}


class TestCdcFilterAndExclusion:
    def test_cdc_stream_filter_keeps_selected_tables(self, spark):
        from olake_spark.functions.reformat import cdc_stream_filter

        df = spark.createDataFrame(
            [("orders", 1), ("users", 2), ("orders", 3), ("audit", 4)],
            ["_stream", "v"],
        )
        got = cdc_stream_filter(df, {"orders", "users"}).collect()
        assert sorted(r["v"] for r in got) == [1, 2, 3]

    def test_exclude_columns_drops_canonicalized_names(self, spark):
        from olake_spark.functions.reformat import exclude_columns

        df = spark.createDataFrame([(1, "x", "s")], ["id", "Secret-Key", "keep"])
        out = exclude_columns(df, ["secret_key", "not_there"])
        assert out.columns == ["id", "keep"]

    def test_streaming_apply_filters_and_excludes(self, spark, tmp_table_dir):
        """P4+P7 wired into the CDC apply path: events of other streams are
        ignored; excluded source columns surface as nulls in the table."""
        import os

        from olake_spark import datagen
        from olake_spark.icelite import Table
        from olake_spark.sync import apply_cdc_stream
        from pyspark.sql import functions as F

        t = Table.create(
            spark, os.path.join(tmp_table_dir, "p4p7"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        base = datagen.gen_images_df(spark, 30)
        t.append(base)
        feed_dir = os.path.join(tmp_table_dir, "p4feed")
        changes = datagen.gen_changes_df(spark, base_n=30, n_changes=12)
        # half the events belong to another stream and must be ignored
        changes.withColumn(
            "_stream",
            F.when(F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0,
                   F.lit("images")).otherwise(F.lit("other")),
        ).coalesce(1).write.parquet(feed_dir)
        stream = (
            spark.readStream.schema(spark.read.parquet(feed_dir).schema)
            .parquet(feed_dir)
        )
        apply_cdc_stream(
            t, stream, os.path.join(tmp_table_dir, "p4ckpt"),
            streams={"images"}, exclude=["caption"],
        )
        t.refresh()
        applied = spark.read.parquet(feed_dir).filter(
            (F.col("_stream") == "images") & (F.col("_op_type") != "d")
        )
        # excluded column is null exactly for rows the merge touched
        touched = t.scan().join(applied.select("image_id"), "image_id")
        if touched.count():
            assert touched.filter(F.col("caption").isNotNull()).count() == 0
        untouched = t.scan().join(
            applied.select("image_id"), "image_id", "left_anti"
        )
        assert untouched.filter(F.col("caption").isNull()).count() == 0
