"""ExactSubstr dedup (operators/exactsubstr.py): planted owner-election and
interval-merge semantics, DuckDB-twin equality on a seeded corpus with real
repeated spans, and the no-window / hash+doc-keyed-exchange plan shape."""

import random

import duckdb
import pandas as pd
import pytest

from olake_spark.operators.exactsubstr import (
    dedup_exact_substrings,
    dedup_exact_substrings_sql,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def run_pair(spark, data, width):
    docs = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r["doc_id"]: tuple(r)
        for r in dedup_exact_substrings(docs, width=width).collect()
    }
    con = duckdb.connect()
    con.register("src", pd.DataFrame(data, columns=["doc_id", "text"]))
    sql = dedup_exact_substrings_sql(
        "SELECT doc_id, text FROM src", width=width
    )
    want = {
        int(r[0]): (int(r[0]), int(r[1]), int(r[2]), int(r[3]), r[4])
        for r in con.execute(sql).fetchall()
    }
    return got, want


class TestSemantics:
    def test_cross_doc_span_removed_from_later_doc(self, spark):
        # the 4-token span "q r s t" appears in docs 1 and 2; doc 1 owns it
        data = [
            (1, "a b q r s t c d"),
            (2, "x y q r s t z w"),
            (3, "m n o p"),
        ]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        rows = {
            r["doc_id"]: r
            for r in dedup_exact_substrings(docs, width=4).collect()
        }
        assert rows[1]["text"] == "a b q r s t c d"
        assert rows[1]["n_removed"] == 0
        assert rows[2]["text"] == "x y z w"
        assert rows[2]["n_dup_windows"] == 1
        assert rows[2]["n_removed"] == 4
        assert rows[3]["text"] == "m n o p"
        assert rows[3]["n_tokens"] == 4

    def test_overlapping_windows_merge(self, spark):
        # a 6-token duplicate span yields three overlapping dup 4-windows
        # in doc 2 — they must merge into ONE removed interval of 6 tokens
        data = [
            (1, "u v q r s t a b w"),
            (2, "x q r s t a b y"),
        ]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        rows = {
            r["doc_id"]: r
            for r in dedup_exact_substrings(docs, width=4).collect()
        }
        assert rows[2]["n_dup_windows"] == 3
        assert rows[2]["n_removed"] == 6
        assert rows[2]["text"] == "x y"

    def test_in_doc_repeat_keeps_first(self, spark):
        data = [(5, "p q r s k k k p q r s")]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        r = dedup_exact_substrings(docs, width=4).collect()[0]
        # second occurrence of "p q r s" (positions 7..10) removed
        assert r["text"] == "p q r s k k k"
        assert r["n_dup_windows"] == 1
        assert r["n_removed"] == 4

    def test_disjoint_spans_two_intervals(self, spark):
        # two separate duplicated spans in one doc, separated by a gap
        # wider than the window → two merged intervals, gap survives
        data = [
            (1, "a1 a2 a3 a4 g1 g2 g3 g4 g5 b1 b2 b3 b4"),
            (2, "a1 a2 a3 a4 z1 z2 z3 z4 z5 b1 b2 b3 b4"),
        ]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        rows = {
            r["doc_id"]: r
            for r in dedup_exact_substrings(docs, width=4).collect()
        }
        assert rows[2]["text"] == "z1 z2 z3 z4 z5"
        assert rows[2]["n_removed"] == 8

    def test_edges(self, spark):
        data = [(1, None), (2, ""), (3, "short one"), (4, "a b c d")]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        rows = {
            r["doc_id"]: r
            for r in dedup_exact_substrings(docs, width=4).collect()
        }
        assert rows[1]["text"] is None and rows[1]["n_tokens"] == 0
        assert rows[2]["text"] == "" and rows[2]["n_tokens"] == 1
        assert rows[3]["text"] == "short one"
        # exactly width tokens, unique → kept
        assert rows[4]["text"] == "a b c d"


class TestOracle:
    def test_seeded_corpus_matches_duckdb(self, spark):
        rng = random.Random(17)
        vocab = [f"w{i}" for i in range(12)]
        boiler = "this span is repeated verbatim across many documents ok"
        data = []
        for d in range(60):
            words = [rng.choice(vocab) for _ in range(rng.randrange(0, 25))]
            t = " ".join(words)
            m = d % 4
            if m == 0:
                t = boiler + (" " + t if t else "")
            elif m == 1:
                t = (t + " " if t else "") + boiler
            elif m == 2 and t:
                mid = len(words) // 2
                t = " ".join(words[:mid] + boiler.split() + words[mid:])
            data.append((d, t if t else rng.choice(["", None])))
        got, want = run_pair(spark, data, width=5)
        assert got == want

    def test_partitioning_independent(self, spark):
        data = [
            (i, " ".join(["a", "b", "c", "d", "e", f"x{i}", "a", "b", "c", "d", "e"]))
            for i in range(10)
        ]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        a = {tuple(r) for r in dedup_exact_substrings(docs, width=5).collect()}
        b = {
            tuple(r)
            for r in dedup_exact_substrings(
                docs.repartition(7, "text"), width=5
            ).collect()
        }
        assert a == b


class TestHotKey:
    def test_corpus_wide_boilerplate_single_owner(self, spark):
        # the hot-key shape the no-window design exists for: EVERY doc
        # carries the same 6-token span, so one md5 key owns n instances.
        # The election must stay a partial-aggregated min + 1-to-N join
        # (plan re-asserted here on the hot corpus), and exactly one doc —
        # the smallest id — keeps the span.
        n = 2000
        boiler = "b1 b2 b3 b4 b5 b6"
        data = [(i, f"u{i} v{i} " + boiler) for i in range(n)]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        out = dedup_exact_substrings(docs, width=6)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert len(rows) == n
        assert rows[0]["text"] == "u0 v0 " + boiler
        assert rows[0]["n_removed"] == 0
        removed = [d for d, r in rows.items() if r["n_removed"] == 6]
        assert sorted(removed) == list(range(1, n))
        assert rows[17]["text"] == "u17 v17"
        plan = plan_of(out)
        assert "Window" not in plan, plan
        assert "CartesianProduct" not in plan, plan


class TestPlan:
    def test_no_window_expected_exchanges(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "a b c d f")], "doc_id long, text string"
        )
        out = dedup_exact_substrings(docs, width=4)
        out.collect()
        plan = plan_of(out)
        assert "Window" not in plan, plan
        assert "EvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        import re

        keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
        # hash election/join + per-doc agg + final doc join — nothing else
        assert keys <= {"_h", "_i", "doc_id"}, plan
        # owner election is map-side partial (partial + final aggregates)
        assert plan.count("HashAggregate") >= 2, plan
