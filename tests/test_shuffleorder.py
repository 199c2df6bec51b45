"""Deterministic global shuffle (operators/shuffleorder.py): bijectivity,
partitioning independence, seed sensitivity, exact equality against the
naive global-row_number DuckDB twin, and the bucketed-window plan shape
(no single-partition window anywhere)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.shuffleorder import (
    global_shuffle,
    global_shuffle_sql,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(300)], "doc_id long, text string"
    )


class TestShuffle:
    def test_bijection_and_columns(self, spark, docs):
        out = global_shuffle(docs, seed=7)
        rows = out.collect()
        assert sorted(r["sample_idx"] for r in rows) == list(range(300))
        assert set(out.columns) == {"doc_id", "text", "sample_idx"}

    def test_partitioning_independent(self, spark, docs):
        a = {(r["doc_id"], r["sample_idx"]) for r in global_shuffle(docs, seed=7).collect()}
        b = {
            (r["doc_id"], r["sample_idx"])
            for r in global_shuffle(docs.repartition(13, "text"), seed=7).collect()
        }
        assert a == b

    def test_seed_changes_order(self, spark, docs):
        a = {(r["doc_id"], r["sample_idx"]) for r in global_shuffle(docs, seed=1).collect()}
        b = {(r["doc_id"], r["sample_idx"]) for r in global_shuffle(docs, seed=2).collect()}
        assert a != b

    def test_prefix_chars_variants_agree(self, spark, docs):
        # 16, 256 and 4096 buckets must all produce the same permutation
        base = {(r["doc_id"], r["sample_idx"]) for r in global_shuffle(docs, seed=3, prefix_chars=2).collect()}
        for pc in (1, 3):
            got = {
                (r["doc_id"], r["sample_idx"])
                for r in global_shuffle(docs, seed=3, prefix_chars=pc).collect()
            }
            assert got == base, pc

    def test_matches_naive_duckdb(self, spark, docs):
        got = {
            (r["doc_id"], r["sample_idx"])
            for r in global_shuffle(docs, seed=42).collect()
        }
        con = duckdb.connect()
        con.register(
            "src",
            pd.DataFrame(
                [(i, f"text {i}") for i in range(300)],
                columns=["doc_id", "text"],
            ),
        )
        want = {
            (int(r[0]), int(r[2]))
            for r in con.execute(
                global_shuffle_sql("SELECT doc_id, text FROM src", seed=42)
            ).fetchall()
        }
        assert got == want

    def test_string_ids(self, spark):
        docs = spark.createDataFrame(
            [(f"id-{i}",) for i in range(40)], "doc_id string"
        )
        out = global_shuffle(docs, seed=5)
        assert sorted(r["sample_idx"] for r in out.collect()) == list(range(40))


class TestPlan:
    def test_no_single_partition_window(self, spark, docs):
        out = global_shuffle(docs, seed=7)
        out.collect()
        plan = plan_of(out)
        # the window is partitioned by the bucket — never a global sort
        # through one task
        assert "Exchange SinglePartition" not in plan, plan
        assert "Window [" in plan or "RunningWindowFunction" in plan or "Window" in plan
        assert "windowspecdefinition(_b" in plan, plan
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "EvalPython" not in plan, plan
