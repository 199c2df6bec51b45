"""SemDeDup (operators/semdedup.py): planted-fixture semantics, an
independently reimplemented sequential-fold Python oracle, chunked-gram
equivalence, prefer=low/high survivor flip, and the no-cartesian /
no-window plan shape the module docstring claims."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.ann import ivf_centroids_by_id
from olake_spark.operators.semdedup import semantic_dedup, semantic_dedup_sql


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _fold_dot(a, b):
    acc = np.float64(0.0)
    for p, q in zip(a, b):
        acc = acc + np.float64(p) * np.float64(q)
    return acc


def _fold_cos_ppm(a, b):
    return int(math.floor(
        _fold_dot(a, b) / (math.sqrt(_fold_dot(a, a)) *
                           math.sqrt(_fold_dot(b, b))) * 1_000_000
    ))


def _fold_sqdist(a, b):
    acc = np.float64(0.0)
    for p, q in zip(a, b):
        d = np.float64(p) - np.float64(q)
        acc = acc + d * d
    return acc


def _py_semdedup(rows, cents, threshold_ppm, prefer):
    """From-scratch reimplementation: own assignment, own priority order,
    own upper-triangular drop rule — shares no code with the operator."""
    out = {}
    cells = {}
    for rid, v in rows:
        best = min(
            range(len(cents)), key=lambda c: (_fold_sqdist(v, cents[c]), c)
        )
        sim = _fold_cos_ppm(v, cents[best])
        cells.setdefault(best, []).append((sim, rid, v))
        out[rid] = [best, sim, True]
    for cell, members in cells.items():
        members.sort(key=lambda t: ((t[0] if prefer == "low" else -t[0]), t[1]))
        for i in range(len(members)):
            for j in range(i):
                if _fold_cos_ppm(members[i][2], members[j][2]) >= threshold_ppm:
                    out[members[i][1]][2] = False
                    break
    return {rid: tuple(v) for rid, v in out.items()}


@pytest.fixture(scope="module")
def planted(spark):
    # two well-separated cells; cell 0 holds a duplicate pair (1, 2) plus
    # an unrelated member 3; cell 1 holds singletons
    vecs = [
        (1, [1.0, 0.02, 0.0, 0.0]),   # dup pair member, closest to centroid
        (2, [1.0, 0.021, 0.0, 0.0]),  # dup pair member, slightly further
        (3, [0.8, 0.6, 0.0, 0.0]),    # same cell, not a duplicate of 1/2
        (4, [0.0, 0.0, 1.0, 0.05]),
        (5, [0.0, 0.0, 0.6, 0.8]),
    ]
    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    cdf = spark.createDataFrame(cents, ["cent_id", "cv"])
    return df, cdf, vecs, [c for _, c in cents]


class TestSemanticDedup:
    def test_planted_prefer_low_keeps_least_typical(self, spark, planted):
        df, cdf, _, _ = planted
        out = {r["id"]: r for r in
               semantic_dedup(df, "vec_id", "embedding", cdf, 999_000,
                              prefer="low").collect()}
        assert set(out) == {1, 2, 3, 4, 5}
        assert [out[i]["cell_id"] for i in (1, 2, 3)] == [0, 0, 0]
        assert [out[i]["cell_id"] for i in (4, 5)] == [1, 1]
        # 2 is the less centroid-similar of the duplicate pair → with
        # prefer="low" it ranks first and survives; 1 is dropped
        assert out[2]["cent_sim_ppm"] < out[1]["cent_sim_ppm"]
        assert out[2]["is_kept"] and not out[1]["is_kept"]
        # non-duplicates all survive
        assert out[3]["is_kept"] and out[4]["is_kept"] and out[5]["is_kept"]

    def test_planted_prefer_high_flips_survivor(self, spark, planted):
        df, cdf, _, _ = planted
        out = {r["id"]: r["is_kept"] for r in
               semantic_dedup(df, "vec_id", "embedding", cdf, 999_000,
                              prefer="high").collect()}
        assert out == {1: True, 2: False, 3: True, 4: True, 5: True}

    @pytest.mark.parametrize("prefer", ["low", "high"])
    def test_random_corpus_matches_python_oracle(self, spark, prefer):
        rng = np.random.default_rng(42)
        base = rng.normal(size=(40, 8))
        rows = []
        for i, v in enumerate(base):
            rows.append((i, [float(x) for x in v]))
            if i % 5 == 0:  # plant a semantic twin with tiny noise
                tw = v + rng.normal(scale=1e-3, size=8)
                rows.append((1000 + i, [float(x) for x in tw]))
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cdf = ivf_centroids_by_id(df, "vec_id", "embedding", 6)
        cents = [r["cv"] for r in cdf.orderBy("cent_id").collect()]
        expect = _py_semdedup(rows, cents, 990_000, prefer)
        got = {r["id"]: (r["cell_id"], r["cent_sim_ppm"], r["is_kept"])
               for r in semantic_dedup(df, "vec_id", "embedding", cdf,
                                       990_000, prefer=prefer).collect()}
        assert got == expect
        # planted twins actually exercised the drop rule
        assert sum(1 for *_, k in got.values() if not k) == 8

    def test_exact_pairs_path_agrees_with_kernel(self, spark, planted):
        df, cdf, _, _ = planted
        a = sorted(semantic_dedup(df, "vec_id", "embedding", cdf, 999_000,
                                  exact_pairs=True).collect())
        b = sorted(semantic_dedup(df, "vec_id", "embedding", cdf,
                                  999_000).collect())
        assert a == b

    def test_chunked_gram_equals_single_pass(self, spark):
        rng = np.random.default_rng(7)
        rows = [(i, [float(x) for x in v])
                for i, v in enumerate(rng.normal(size=(64, 8)))]
        rows += [(100 + i, [float(x) + 1e-4 for x in v]) for i, v in rows[:10]]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        cdf = ivf_centroids_by_id(df, "vec_id", "embedding", 2)
        big = sorted(semantic_dedup(df, "vec_id", "embedding", cdf,
                                    990_000).collect())
        # 8-byte budget → chunk=1 → one gram row per pass
        tiny = sorted(semantic_dedup(df, "vec_id", "embedding", cdf, 990_000,
                                     budget_bytes=8).collect())
        assert big == tiny
        assert any(not r["is_kept"] for r in big)

    def test_production_plan_shape(self, spark, planted):
        df, cdf, _, _ = planted
        plan = plan_of(semantic_dedup(df, "vec_id", "embedding", cdf, 999_000))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # production assignment + tuple-priority drop rule: no global window
        assert "Window" not in plan

    def test_bad_prefer_rejected(self, spark, planted):
        df, cdf, _, _ = planted
        with pytest.raises(ValueError, match="prefer"):
            semantic_dedup(df, "vec_id", "embedding", cdf, 999_000,
                           prefer="mid")

    def test_oracle_sql_matches_on_fixture_table(self, spark, tmp_path):
        import duckdb

        rng = np.random.default_rng(3)
        rows = [(i, [float(x) for x in v])
                for i, v in enumerate(rng.normal(size=(50, 8)))]
        rows += [(200 + i, v) for i, v in rows[:6]]  # verbatim twins
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        pq = str(tmp_path / "emb.parquet")
        df.coalesce(1).write.parquet(pq)
        cdf = ivf_centroids_by_id(df, "vec_id", "embedding", 4)
        got = (semantic_dedup(df, "vec_id", "embedding", cdf, 999_999,
                              exact_assign=True)
               .orderBy("id").toPandas())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * "
            f"FROM read_parquet('{pq}/*.parquet')"
        )
        want = (con.execute(
            semantic_dedup_sql("embeddings", "vec_id", 999_999, 4)
        ).df().sort_values("id").reset_index(drop=True))
        assert (got["id"].to_numpy() == want["id"].to_numpy()).all()
        assert (got["cell_id"].to_numpy() == want["cell_id"].to_numpy()).all()
        assert (got["cent_sim_ppm"].to_numpy()
                == want["cent_sim_ppm"].to_numpy()).all()
        assert (got["is_kept"].to_numpy() == want["is_kept"].to_numpy()).all()
        assert (~got["is_kept"]).sum() == 6  # every verbatim twin dropped
