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
