"""Gopher repetition rules (functions/repetition.py): hand-computed planted
values, exact equality against the DuckDB twin on a seeded corpus, the
composite rule projection, and the map-only plan shape."""

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.functions import repetition as R


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def one_sql(text, sql_expr):
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"text": [text]}))
    return con.execute(f"SELECT {sql_expr} FROM t").fetchone()[0]


class TestPlantedValues:
    def test_dup_line(self, spark):
        t = "x\nx\ny"
        # 1 of 3 line instances is a duplicate
        assert one(spark, t, R.dup_unit_ppm_col("text")) == 333_333
        # 1 duplicate char over 3 total line chars
        assert one(spark, t, R.dup_unit_char_ppm_col("text")) == 333_333

    def test_dup_para_char_weighted(self, spark):
        t = "aa bb\n\naa bb\n\ncc"
        assert one(spark, t, R.dup_unit_ppm_col("text", R.PARA_SEP)) == 333_333
        # dup instance "aa bb" = 5 chars over 5+5+2 = 12 paragraph chars
        assert (
            one(spark, t, R.dup_unit_char_ppm_col("text", R.PARA_SEP))
            == 416_666
        )

    def test_top_2gram_tie_break(self, spark):
        t = "a b a b a"
        # 2-grams: "a b" x2, "b a" x2 — tie broken to smallest "a b",
        # chars = 2 * 3 over len(text) = 9
        assert one(spark, t, R.top_ngram_char_ppm_col("text", 2)) == 666_666
        assert one_sql(t, R.top_ngram_char_ppm_sql("text", 2)) == 666_666

    def test_dup_2gram(self, spark):
        t = "a b a b a"
        # instances beyond first: one "a b" + one "b a" = 6 chars / 9
        assert one(spark, t, R.dup_ngram_char_ppm_col("text", 2)) == 666_666

    def test_edges(self, spark):
        # empty text: every denominator guard fires
        for col in (
            R.dup_unit_ppm_col("text"),
            R.dup_unit_char_ppm_col("text"),
            R.top_ngram_char_ppm_col("text", 2),
            R.dup_ngram_char_ppm_col("text", 5),
        ):
            assert one(spark, "", col) == 0
        # fewer words than k: no n-grams
        assert one(spark, "one two", R.top_ngram_char_ppm_col("text", 3)) == 0
        # NULL propagates
        assert one(spark, None, R.dup_unit_ppm_col("text")) is None
        assert one(spark, None, R.top_ngram_char_ppm_col("text", 2)) is None

    def test_cap_at_ppm(self, spark):
        # overlapping instances can cover >100% — capped
        t = "a a a a a a a a"
        assert one(spark, t, R.top_ngram_char_ppm_col("text", 2)) == R.PPM


class TestComposite:
    def test_flags_and_keep(self, spark):
        # the clean doc must be long enough that a single-occurrence
        # 2-gram stays under 20% of its characters (the published
        # thresholds assume real-corpus document lengths)
        clean = "\n".join(
            " ".join(f"word{i:02d}" for i in range(r * 8, r * 8 + 8))
            for r in range(5)
        )
        df = spark.createDataFrame(
            [(1, "x\nx\nx\nx"), (2, clean)],  # line-dominated dup / clean
            ["doc_id", "text"],
        )
        out = df.select("doc_id", *R.repetition_rules_cols("text"))
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["dup_line_ppm"] == 750_000
        assert rows[1]["ok_dup_line"] == 0
        assert rows[1]["keep"] == 0
        assert rows[2]["keep"] == 1
        # 13 metrics + 13 flags + keep
        assert len(out.columns) == 1 + 27

    def test_unknown_override_rejected(self):
        with pytest.raises(ValueError):
            R.repetition_rules_cols("text", max_typo_ppm=1)
        with pytest.raises(ValueError):
            R.repetition_rules_sql("text", nope=1)


class TestOracle:
    def test_seeded_corpus_matches_duckdb(self, spark):
        rng = random.Random(7)
        vocab = ["aa", "bb", "cc", "dd", "ee"]
        data = []
        for d in range(80):
            words = [rng.choice(vocab) for _ in range(rng.randrange(0, 30))]
            # group into lines of 3 words, every other separator doubled so
            # paragraphs exist too
            lines = [
                " ".join(words[i : i + 3]) for i in range(0, len(words), 3)
            ]
            seps = ["\n" if i % 2 else "\n\n" for i in range(len(lines))]
            text = "".join(
                l + (seps[i] if i < len(lines) - 1 else "")
                for i, l in enumerate(lines)
            )
            data.append((d, text if words else rng.choice(["", None])))
        docs = spark.createDataFrame(data, ["doc_id", "text"])

        got = [
            tuple(r)
            for r in docs.select(
                "doc_id", *R.repetition_rules_cols("text")
            ).orderBy("doc_id").collect()
        ]

        con = duckdb.connect()
        con.register("docs_src", pd.DataFrame(data, columns=["doc_id", "text"]))
        cols = ", ".join(R.repetition_rules_sql("text"))
        want = con.execute(
            f"SELECT doc_id, {cols} FROM docs_src ORDER BY doc_id"
        ).fetchall()
        assert got == [tuple(r) for r in want]


class TestPlan:
    def test_map_only(self, spark):
        docs = spark.createDataFrame([(1, "a b\nc d")], ["doc_id", "text"])
        out = docs.select("doc_id", *R.repetition_rules_cols("text"))
        plan = plan_of(out)
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan
        assert "EvalPython" not in plan, plan
