"""Sequence packing (next-fit token-budget bins) invariants."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.functions import text as T
from olake_spark.operators import pack

BUDGET = 100


@pytest.fixture(scope="module")
def packed(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        # token counts 1..137 — some above budget to exercise the cap
        (F.pmod(F.col("id") * 37 + 11, F.lit(137)) + 1).alias("n_tok"),
    )
    out = pack.pack_sequences(
        df, "doc_id", F.col("n_tok"), budget=BUDGET, n_buckets=4
    )
    src = {r["doc_id"]: r["n_tok"] for r in df.collect()}
    return src, out.toPandas()


def test_every_doc_packed_once(packed):
    src, pdf = packed
    assert sorted(pdf["doc"]) == sorted(src)


def test_fill_never_exceeds_budget(packed):
    _, pdf = packed
    fills = pdf.groupby(["bucket", "seq"])["tok_used"].sum()
    assert (fills <= BUDGET).all()
    # and every doc ends within the budget
    assert ((pdf["seq_off"] + pdf["tok_used"]) <= BUDGET).all()


def test_offsets_contiguous_within_sequence(packed):
    """Docs tile each sequence: offsets are the running sum in doc order."""
    _, pdf = packed
    for (_, _), g in pdf.groupby(["bucket", "seq"]):
        g = g.sort_values("doc")
        run = 0
        for off, used in zip(g["seq_off"], g["tok_used"]):
            assert off == run
            run += used


def test_next_fit_is_greedy(packed):
    """A new sequence starts ONLY when the next doc would overflow —
    next-fit never leaves room it could have used."""
    _, pdf = packed
    for _, g in pdf.groupby("bucket"):
        g = g.sort_values("doc")
        prev_seq, fill = 0, 0
        for seq, used in zip(g["seq"], g["tok_used"]):
            if seq != prev_seq:
                assert seq == prev_seq + 1
                assert fill + used > BUDGET  # overflow forced the break
                fill = 0
                prev_seq = seq
            fill += used


def test_oversized_doc_capped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "n_tok": [5000, 10]})
    )
    out = pack.pack_sequences(
        df, "doc_id", F.col("n_tok"), budget=64, n_buckets=1
    ).toPandas()
    big = out[out["doc"] == 1].iloc[0]
    assert big["tok_used"] == 64 and big["seq_off"] == 0


def test_gopher_keep_is_conjunction(spark):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = d.select(
        "doc_id",
        # fixture docs are 10-99 words; tighten the published-default band
        # so both classes appear (defaults stay the real Gopher values)
        *T.gopher_rules_cols("text", min_words=30, max_words=90),
    ).toPandas()
    flag_cols = [c for c in pdf.columns if c.startswith("ok_")]
    assert set(pdf[flag_cols].to_numpy().ravel()) <= {0, 1}
    assert (pdf["keep"] == pdf[flag_cols].min(axis=1)).all()
    # thresholds discriminate on the fixture corpus: both classes present
    assert 0 < pdf["keep"].sum() < len(pdf)


class TestChunkDocuments:
    """Token-window chunking (chunk_documents): the packing op's complement."""

    ROWS = [
        (1, "a b c d e f g h i j"),   # 10 tokens
        (2, "one two three"),          # shorter than max
        (3, None),                     # no tokens -> no rows
        (4, ""),                       # no tokens -> no rows
        (5, "x x x x x x y"),          # 7 tokens
    ]

    def _frames(self, spark, max_tokens, stride):
        import duckdb
        import pandas as pd

        from olake_spark.operators.pack import (chunk_documents,
                                                chunk_documents_sql)

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = (
            chunk_documents(df, max_tokens=max_tokens, stride=stride)
            .toPandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("d", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        want = (
            con.sql(
                chunk_documents_sql(
                    "SELECT * FROM d", max_tokens=max_tokens, stride=stride
                )
            )
            .df()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        return got, want

    def test_windows_cover_every_token_with_overlap(self, spark):
        got, want = self._frames(spark, 4, 3)
        assert got.astype(str).equals(want.astype(str))
        d1 = got[got.doc_id == 1]
        assert list(d1.chunk_text) == ["a b c d", "d e f g", "g h i j", "j"]
        assert list(d1.start_tok) == [0, 3, 6, 9]
        assert list(d1.n_tokens) == [4, 4, 4, 1]
        # coverage: every token index in some window
        covered = set()
        for _, r in d1.iterrows():
            covered |= set(range(r.start_tok, r.start_tok + r.n_tokens))
        assert covered == set(range(10))
        # NULL/empty docs emit nothing; short doc gets exactly one window
        assert set(got.doc_id) == {1, 2, 5}
        assert len(got[got.doc_id == 2]) == 1

    def test_no_overlap_default_stride(self, spark):
        got, want = self._frames(spark, 4, 4)
        assert got.astype(str).equals(want.astype(str))
        d1 = got[got.doc_id == 1]
        # disjoint cover: n_tokens sums to the doc's token count
        assert d1.n_tokens.sum() == 10
        assert list(d1.start_tok) == [0, 4, 8]

    def test_reassembly_roundtrip(self, spark):
        # stride == max: concatenating chunk_text restores the document
        got, _ = self._frames(spark, 3, 3)
        d1 = " ".join(got[got.doc_id == 1].chunk_text)
        assert d1 == "a b c d e f g h i j"

    def test_map_only_plan(self, spark):
        from olake_spark.operators.pack import chunk_documents

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        plan = (
            chunk_documents(df, max_tokens=8, stride=5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_bad_params_refused(self, spark):
        import pytest as _pt

        from olake_spark.operators.pack import chunk_documents

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        with _pt.raises(ValueError):
            chunk_documents(df, max_tokens=0)
        with _pt.raises(ValueError):
            chunk_documents(df, max_tokens=8, stride=-1)

    def test_stride_beyond_max_refused_both_engines(self, spark):
        # REGRESSION (review finding): stride > max_tokens would skip the
        # tokens between windows — both builders refuse it
        import pytest as _pt

        from olake_spark.operators.pack import (chunk_documents,
                                                chunk_documents_sql)

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        with _pt.raises(ValueError, match="uncovered"):
            chunk_documents(df, max_tokens=32, stride=100)
        with _pt.raises(ValueError, match="uncovered"):
            chunk_documents_sql("SELECT 1", max_tokens=32, stride=100)
        with _pt.raises(ValueError):
            chunk_documents_sql("SELECT 1", max_tokens=0)
