"""Type-promotion lattice (utils/typeutils/fields.go parity) + table-level
schema evolution + P8 recursive JSON conversion."""

import os

import pytest
from hypothesis import given
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, DoubleType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType,
                               TimestampType)

from olake_spark.functions.typeutils import (WEIGHTS, merge_schemas, promote,
                                             promote_spark)
from olake_spark.icelite import Table

NAMES = sorted(WEIGHTS)


class TestLattice:
    @given(st.sampled_from(NAMES), st.sampled_from(NAMES))
    def test_commutative(self, a, b):
        assert promote(a, b) == promote(b, a)

    @given(st.sampled_from(NAMES))
    def test_idempotent(self, a):
        assert promote(a, a) == a

    @given(st.sampled_from(NAMES), st.sampled_from(NAMES))
    def test_string_absorbs(self, a, b):
        assert promote("string", a) == "string"
        # LCA is an ancestor of both: promoting the result with either input
        # is a no-op
        lca = promote(a, b)
        assert promote(lca, a) == lca and promote(lca, b) == lca

    def test_reference_chain(self):
        # the exact ladder the reference's tree defines (fields.go:18-47)
        assert promote("bool", "int32") == "int32"
        assert promote("int32", "int64") == "int64"
        assert promote("int64", "float64") == "float64"
        assert promote("float64", "string") == "string"
        assert promote("int64", "float32") == "float64"  # split at Float64
        assert promote("bool", "float32") == "float64"
        # timestamp branch
        assert promote("timestamp", "timestamp_milli") == "timestamp_milli"
        assert promote("timestamp_milli", "timestamp_nano") == "timestamp_nano"
        # cross-branch conflicts resolve at the root
        assert promote("int64", "timestamp") == "string"
        assert promote("float32", "timestamp_nano") == "string"

    def test_unknown_type_resolves_to_string(self):
        assert promote("decimal", "int64") == "string"  # fields.go:269-271

    def test_promote_spark(self):
        assert promote_spark(IntegerType(), LongType()) == LongType()
        assert promote_spark(FloatType(), DoubleType()) == DoubleType()
        assert promote_spark(LongType(), StringType()) == StringType()
        assert promote_spark(LongType(), TimestampType()) == StringType()
        with pytest.raises(TypeError):
            promote_spark(ArrayType(LongType()), LongType())

    def test_merge_schemas(self):
        s1 = StructType(
            [StructField("a", IntegerType()), StructField("b", StringType())]
        )
        s2 = StructType(
            [StructField("a", DoubleType()), StructField("c", LongType())]
        )
        m = merge_schemas(s1, s2)
        assert [f.name for f in m.fields] == ["a", "b", "c"]
        assert m["a"].dataType == DoubleType()  # int32 × float64 → float64
        assert all(f.nullable for f in m.fields)


class TestTableEvolution:
    def _table(self, spark, root):
        schema = StructType(
            [
                StructField("k", StringType(), False),
                StructField("n", IntegerType(), True),
                StructField("x", FloatType(), True),
            ]
        )
        t = Table.create(spark, root, schema, identifier_fields=("k",))
        t.append(
            spark.createDataFrame(
                [("a", 1, 1.5), ("b", 2, 2.5)], schema=schema
            )
        )
        return t

    def test_widening_promotion_reads_old_files(self, spark, tmp_table_dir):
        """int→long and float→double evolve in place; committed parquet files
        (written narrow) are read back widened by Spark's reader."""
        t = self._table(spark, os.path.join(tmp_table_dir, "ev"))
        incoming = StructType(
            [
                StructField("n", LongType(), True),
                StructField("x", DoubleType(), True),
                StructField("extra", StringType(), True),
            ]
        )
        evolved = t.evolve_schema(incoming)
        assert evolved["n"].dataType == LongType()
        assert evolved["x"].dataType == DoubleType()
        assert evolved["extra"].dataType == StringType()
        rows = {r["k"]: r for r in t.scan().collect()}
        assert rows["a"]["n"] == 1 and rows["a"]["x"] == 1.5
        assert rows["a"]["extra"] is None
        # and new wide-typed data appends cleanly
        t.append(
            spark.createDataFrame(
                [("c", 2**40, 3.5, "e")], schema=t.schema
            )
        )
        assert t.scan().filter(F.col("n") > 2**35).count() == 1

    def test_narrower_incoming_is_noop(self, spark, tmp_table_dir):
        t = self._table(spark, os.path.join(tmp_table_dir, "nr"))
        t.evolve_schema(
            StructType([StructField("n", IntegerType(), True)])
        )
        assert t.schema["n"].dataType == IntegerType()

    def test_illegal_promotion_raises(self, spark, tmp_table_dir):
        """A conflict whose LCA exceeds parquet in-place widening (long vs
        string → string) must raise, pointing at ingest-side coercion."""
        t = self._table(spark, os.path.join(tmp_table_dir, "il"))
        with pytest.raises(ValueError, match="not a legal in-place widening"):
            t.evolve_schema(
                StructType([StructField("n", StringType(), True)])
            )


class TestJsonToStruct:
    def test_recursive_parse_and_ms_epoch(self, spark):
        from olake_spark.functions.reformat import json_to_struct

        schema = StructType(
            [
                StructField("a", LongType()),
                StructField(
                    "b",
                    StructType(
                        [
                            StructField("c", StringType()),
                            StructField("d", ArrayType(LongType())),
                        ]
                    ),
                ),
                StructField("_cdc_timestamp", TimestampType()),
            ]
        )
        df = spark.createDataFrame(
            [
                ('{"a": 7, "b": {"c": "x", "d": [1, 2]}, '
                 '"_cdc_timestamp": 1700000000123}',),
                ("not json at all",),
            ],
            ["j"],
        )
        out = json_to_struct(df, "j", schema).select("j.*").collect()
        ok = out[0]
        assert ok["a"] == 7 and ok["b"]["c"] == "x" and ok["b"]["d"] == [1, 2]
        # ms-epoch metadata timestamp converted, not ISO-parsed
        assert ok["_cdc_timestamp"].year == 2023
        assert ok["_cdc_timestamp"].microsecond == 123000
        # unparseable input → null fields (error-to-null contract)
        assert out[1]["a"] is None and out[1]["b"] is None
