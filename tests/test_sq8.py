"""SQ8 scalar quantization (operators/ann.py): cross-engine exact codes
and ranks, the quantizer's boundary/zero contracts, recall against the
fp32 brute-force truth, and the plan shape (pure Catalyst, broadcast
query side)."""

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.ann import (knn_bruteforce, knn_sq8, knn_sq8_sql,
                                       sq8_encode, sq8_encode_sql)

SF = os.environ.get("OLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_codes_and_topk_match_duckdb(spark, emb):
    got = knn_sq8(emb, emb.filter(F.col("vec_id") < 10), "vec_id",
                  "embedding", k=5).toPandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'embeddings.parquet')}')"
    )
    want = con.execute(
        knn_sq8_sql("embeddings", "vec_id < 10", "vec_id", k=5)
    ).fetchdf().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for c in ("query_id", "neighbor_id", "rank", "cos_ppm"):
        assert (got[c] == want[c]).all(), c

    g = sq8_encode(emb.filter(F.col("vec_id") < 40), "vec_id",
                   "embedding").toPandas().sort_values("id") \
        .reset_index(drop=True)
    w = con.execute(
        "SELECT * FROM ("
        + sq8_encode_sql("(SELECT * FROM embeddings WHERE vec_id < 40)",
                         "vec_id")
        + ") ORDER BY id"
    ).fetchdf().reset_index(drop=True)
    assert (g["scale"] == w["scale"]).all()
    assert all((np.array(a) == np.array(b)).all()
               for a, b in zip(g["codes"], w["codes"]))


def test_quantizer_contracts(spark):
    df = spark.createDataFrame(
        [(1, [1.27, -1.27, 0.635, 0.0]),   # amax hits exactly +-127
         (2, [0.0, 0.0, 0.0, 0.0]),        # zero vector
         (3, [1e-30, -1e-30, 0.0, 1e-30])],  # tiny but nonzero scale
        "id long, v array<double>",
    )
    rows = {r["id"]: r for r in sq8_encode(df, "id", "v").collect()}
    assert rows[1]["codes"] == [127, -127, 64, 0]  # 63.5 + .5 -> 64
    assert rows[1]["scale"] == 1.27 / 127.0
    assert rows[2]["codes"] == [0, 0, 0, 0] and rows[2]["scale"] == 0.0
    assert rows[3]["codes"] == [127, -127, 0, 127]
    # codes are genuine tinyints (the 4x memory claim is real)
    enc = sq8_encode(df, "id", "v")
    assert enc.schema["codes"].dataType.elementType.simpleString() \
        == "tinyint"


def test_recall_against_fp32_bruteforce(spark, emb):
    """SQ8 loses little: top-1 neighbor agrees with the fp32 truth for
    >= 90% of queries on the real fixture."""
    q = emb.filter(F.col("vec_id") < 30)
    truth = {r["query_id"]: r["neighbor_id"]
             for r in knn_bruteforce(emb, q, "vec_id", "embedding", k=1)
             .collect()}
    got = {r["query_id"]: r["neighbor_id"]
           for r in knn_sq8(emb, q, "vec_id", "embedding", k=1).collect()}
    agree = sum(got[k] == truth[k] for k in truth)
    assert agree / len(truth) >= 0.9, f"{agree}/{len(truth)}"


def test_plan_is_catalyst_with_broadcast_queries(spark, emb):
    plan = knn_sq8(emb, emb.filter(F.col("vec_id") < 10), "vec_id",
                   "embedding", k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
