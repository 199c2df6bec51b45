"""Cross-document paragraph dedup (operators/paragraphs.py): owner-election
semantics on a planted fixture, exact equality against the DuckDB twin on a
seeded corpus with real cross-document duplicates, and the two-shuffle /
zero-join / zero-window plan shape the module docstring claims."""

import random

import duckdb
import pandas as pd
import pytest

from olake_spark.operators.paragraphs import (
    dedup_paragraphs,
    dedup_paragraphs_sql,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def fixture_docs(spark):
    # doc 1 owns "boiler" (earliest doc, position 1); doc 2 repeats it
    # twice (cross-doc dup + in-doc repeat — both must drop); doc 3 is
    # boilerplate-only (all paragraphs dropped, row must survive with '');
    # doc 4 is NULL; doc 5 is the empty string (one empty paragraph,
    # bypassed at min_chars=1); doc 6 has an empty line between repeats.
    return spark.createDataFrame(
        [
            (1, "intro one\nboiler\nbody alpha"),
            (2, "boiler\nbody beta\nboiler"),
            (3, "boiler"),
            (4, None),
            (5, ""),
            (6, "solo\n\nsolo"),
        ],
        ["doc_id", "text"],
    )


class TestSemantics:
    def test_owner_election_and_reassembly(self, spark, fixture_docs):
        rows = {
            r["doc_id"]: r for r in dedup_paragraphs(fixture_docs).collect()
        }
        assert set(rows) == {1, 2, 3, 4, 5, 6}

        # owner doc keeps everything, original order preserved
        assert rows[1]["text"] == "intro one\nboiler\nbody alpha"
        assert (rows[1]["n_paras"], rows[1]["n_kept"]) == (3, 3)

        # later doc loses both instances of the duplicate (cross-doc AND
        # its own in-doc repeat), survivors keep their original order
        assert rows[2]["text"] == "body beta"
        assert (rows[2]["n_paras"], rows[2]["n_kept"]) == (3, 1)

        # all-dropped doc keeps its row with empty text
        assert rows[3]["text"] == ""
        assert (rows[3]["n_paras"], rows[3]["n_kept"]) == (1, 0)

        # NULL in, NULL out
        assert rows[4]["text"] is None
        assert (rows[4]["n_paras"], rows[4]["n_kept"]) == (0, 0)

        # empty-string doc: one zero-length paragraph, bypassed (kept)
        assert rows[5]["text"] == ""
        assert (rows[5]["n_paras"], rows[5]["n_kept"]) == (1, 1)

        # empty separator lines bypass dedup; the repeated "solo" is a
        # cross-doc-free in-doc dup — second instance drops
        assert rows[6]["text"] == "solo\n"
        assert (rows[6]["n_paras"], rows[6]["n_kept"]) == (3, 2)

    def test_min_chars_bypass(self, spark, fixture_docs):
        # min_chars=6: "boiler" (6 chars) still dedups, "solo" (4) and
        # "intro one"?? no — 9 chars, still a candidate. Only paragraphs
        # SHORTER than min_chars bypass: "solo" repeats now both survive.
        rows = {
            r["doc_id"]: r
            for r in dedup_paragraphs(fixture_docs, min_chars=6).collect()
        }
        assert rows[6]["text"] == "solo\n\nsolo"
        assert rows[6]["n_kept"] == 3
        # "boiler" is exactly 6 chars → still deduped
        assert rows[2]["text"] == "body beta"
        assert rows[3]["text"] == ""

    def test_string_ids_and_custom_sep(self, spark):
        docs = spark.createDataFrame(
            [("a", "x||y"), ("b", "y||z")], ["doc_id", "text"]
        )
        rows = {
            r["doc_id"]: r
            for r in dedup_paragraphs(docs, sep="||").collect()
        }
        assert rows["a"]["text"] == "x||y"
        assert rows["b"]["text"] == "z"


class TestOracle:
    def test_seeded_corpus_matches_duckdb(self, spark):
        # small paragraph vocabulary → real cross-document duplicates,
        # in-doc repeats, and singletons all occur
        rng = random.Random(42)
        vocab = [f"para {i} text" for i in range(25)]
        data = []
        for d in range(60):
            n = rng.randrange(0, 6)
            text = "\n".join(rng.choice(vocab) for _ in range(n))
            data.append((d, text if n else rng.choice(["", None])))
        docs = spark.createDataFrame(data, ["doc_id", "text"])

        got = {
            r["doc_id"]: (r["n_paras"], r["n_kept"], r["text"])
            for r in dedup_paragraphs(docs).collect()
        }

        pdf = pd.DataFrame(data, columns=["doc_id", "text"])
        con = duckdb.connect()
        con.register("docs_src", pdf)
        sql = dedup_paragraphs_sql("SELECT doc_id, text FROM docs_src")
        want = {
            int(r[0]): (int(r[1]), int(r[2]), r[3])
            for r in con.execute(sql).fetchall()
        }
        assert got == want

    def test_partitioning_independent(self, spark, fixture_docs):
        base = {
            tuple(r) for r in dedup_paragraphs(fixture_docs).collect()
        }
        shuffled = {
            tuple(r)
            for r in dedup_paragraphs(
                fixture_docs.repartition(7, "text")
            ).collect()
        }
        assert base == shuffled


class TestPlan:
    def test_two_shuffles_no_join_no_window(self, spark, fixture_docs):
        out = dedup_paragraphs(fixture_docs)
        out.collect()  # materialize so AQE finalizes the plan
        plan = plan_of(out)
        assert "Join" not in plan, plan
        assert "Window" not in plan, plan
        assert "EvalPython" not in plan, plan
        # two shuffle STAGES: the md5 owner election and the doc_id
        # reassembly. Spark plants one physical Exchange per union branch
        # feeding the reassembly aggregate, so assert on the keys: every
        # exchange partitions on either the md5 hash (_h) or the doc id
        # (_i) — nothing else — and exactly one is the election. Each row
        # therefore crosses at most two exchanges end to end.
        import re

        # (the md5 alias is folded into a _groupingexpression attribute;
        # AQE's toString prints final + initial plans, so count keys, not
        # occurrences)
        keys = re.findall(r"Exchange hashpartitioning\((_\w+)#", plan)
        assert keys, plan
        assert set(keys) == {"_groupingexpression", "_i"}, plan
