"""Cross-corpus dedup (operators/crossdedup.py): exact + Jaccard rungs,
cross-engine equality, directionality, skew guard, plan shape."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.operators.crossdedup import (
    dedup_against_exact,
    dedup_against_exact_sql,
    dedup_against_jaccard,
    dedup_against_jaccard_sql,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "entirely different content about spark tables"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "short"),
    (5, None),
    (6, "boiler plate boiler plate boiler plate unique six"),
    (7, "boiler plate boiler plate boiler plate unique seven"),
]
REF = [
    (101, "the quick brown fox jumps over the lazy dog"),
    (102, "reference only material nothing shared here"),
    (103, "boiler plate boiler plate boiler plate unique other"),
]


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    r = spark.createDataFrame(REF, "doc_id long, text string")
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register("r", pd.DataFrame(REF, columns=["doc_id", "text"]))
    return d, r, con


class TestExact:
    def test_twin_and_semantics(self, frames):
        d, r, con = frames
        got = (
            dedup_against_exact(d, r)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = (
            con.sql(dedup_against_exact_sql("SELECT * FROM d", "SELECT * FROM r"))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert got.astype(str).equals(want.astype(str))
        keep = dict(zip(got.doc_id, got.keep))
        assert keep[1] == 0          # verbatim in reference
        assert keep[3] == 1          # near-dup is NOT exact
        assert keep[5] == 1          # NULL text: no fingerprint match

    def test_direction_reference_never_flagged(self, frames):
        d, r, _ = frames
        # swapping roles: the reference corpus is scored, not mutated —
        # ref doc 101 (present verbatim in docs) flags, 102 keeps
        got = {r_["doc_id"]: r_["keep"]
               for r_ in dedup_against_exact(r, d).collect()}
        assert got == {101: 0, 102: 1, 103: 1}


class TestJaccard:
    def test_twin_and_threshold(self, frames):
        d, r, con = frames
        got = (
            dedup_against_jaccard(d, r, threshold_ppm=500_000)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = (
            con.sql(dedup_against_jaccard_sql(
                "SELECT * FROM d", "SELECT * FROM r",
                threshold_ppm=500_000))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert got.astype(str).equals(want.astype(str))
        by = {r_: (m, k) for r_, m, k in got.itertuples(index=False)}
        assert by[1] == (1_000_000, 0)   # identical shingle sets
        assert by[3][0] == 875_000 and by[3][1] == 0  # superset near-dup
        assert by[2] == (0, 1)           # nothing shared
        assert by[4] == (0, 1)           # too short for a 3-shingle
        assert by[5] == (0, 1)           # NULL text
        # raising the threshold past the near-dup keeps it
        strict = {
            r_["doc_id"]: r_["keep"]
            for r_ in dedup_against_jaccard(
                d, r, threshold_ppm=900_000
            ).collect()
        }
        assert strict[3] == 1 and strict[1] == 0

    def test_max_df_guard_cross_engine(self, frames):
        d, r, con = frames
        # 'boiler plate boiler' etc. shingles appear in docs 6,7 and ref
        # 103 -> combined df 3; max_df=2 drops them, so 6/7 lose their
        # only bridge to the reference and keep=1 in BOTH engines
        got = (
            dedup_against_jaccard(d, r, threshold_ppm=300_000, max_df=2)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = (
            con.sql(dedup_against_jaccard_sql(
                "SELECT * FROM d", "SELECT * FROM r",
                threshold_ppm=300_000, max_df=2))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert got.astype(str).equals(want.astype(str))
        by = dict(zip(got.doc_id, got.keep))
        assert by[6] == 1 and by[7] == 1
        # without the guard the shared boilerplate pulls them under
        loose = {
            r_["doc_id"]: r_["keep"]
            for r_ in dedup_against_jaccard(
                d, r, threshold_ppm=300_000
            ).collect()
        }
        assert loose[6] == 0 and loose[7] == 0

    def test_reference_side_distinct_collapse_plan(self, frames):
        d, r, _ = frames
        # exact rung: the reference side aggregates to DISTINCT
        # fingerprints before the join (HashAggregate below the join)
        plan = (
            dedup_against_exact(d, r)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "HashAggregate" in plan, plan
