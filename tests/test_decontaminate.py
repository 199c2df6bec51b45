"""Benchmark decontamination (operators/decontaminate.py): planted-leak
correctness, shingle-less-document handling, and the broadcast-join /
single-shuffle plan shape the module docstring claims."""

import pytest
from pyspark.sql import functions as F

from olake_spark.functions.text import PPM
from olake_spark.operators.decontaminate import benchmark_grams, decontaminate


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    # benchmark: two eval "questions"; corpus: one verbatim leak, one
    # partial leak, one clean doc, one too short to shingle at n=3
    bench_docs = spark.createDataFrame(
        [
            (100, "what is the capital of france paris"),
            (101, "two plus two equals four exactly"),
        ],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # full leak: every trigram of this doc is in the benchmark
            (1, "what is the capital of france"),
            # partial leak: the tail trigrams are novel
            (2, "two plus two equals nine maybe even ten"),
            # clean
            (3, "entirely unrelated words about spark table maintenance"),
            # < n tokens: zero shingles, must still be audited
            (4, "too short"),
        ],
        ["doc_id", "text"],
    )
    return docs, bench_docs


class TestDecontaminate:
    def test_planted_leaks_scored_exactly(self, spark, corpus):
        docs, bench_docs = corpus
        bench = benchmark_grams(bench_docs, "text", n=3)
        out = decontaminate(docs, bench, n=3, max_contam_ppm=300_000)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4}

        # doc 1: 4 trigrams, all inside benchmark doc 100 → 100% contaminated
        assert rows[1]["n_grams"] == 4
        assert rows[1]["n_hits"] == 4
        assert rows[1]["contam_ppm"] == PPM
        assert rows[1]["keep"] == 0

        # doc 2: 6 trigrams; exactly "two plus two" and "plus two equals"
        # appear in benchmark doc 101 → 2/6
        assert rows[2]["n_grams"] == 6
        assert rows[2]["n_hits"] == 2
        assert rows[2]["contam_ppm"] == (PPM * 2) // 6
        assert rows[2]["keep"] == 0  # 333,333 > 300,000

        # doc 3: clean
        assert rows[3]["n_hits"] == 0
        assert rows[3]["contam_ppm"] == 0
        assert rows[3]["keep"] == 1

        # doc 4: shingle-less — audited, trivially clean
        assert rows[4]["n_grams"] == 0
        assert rows[4]["contam_ppm"] == 0
        assert rows[4]["keep"] == 1

    def test_duplicate_benchmark_grams_counted_once(self, spark, corpus):
        docs, bench_docs = corpus
        # the same benchmark appended twice must not double n_hits (the
        # gram set is DISTINCT by construction)
        bench = benchmark_grams(bench_docs.union(bench_docs), "text", n=3)
        out = decontaminate(docs, bench, n=3)
        r1 = {r["doc_id"]: r["n_hits"] for r in out.collect()}
        assert r1[1] == 4 and r1[2] == 2

    def test_randomized_vs_bruteforce(self, spark):
        # seeded random corpora vs a from-scratch python oracle: same
        # shingling, counting and integer-ppm arithmetic, independently
        # reimplemented (catches drift in either the Catalyst expressions
        # or the operator's join/agg wiring)
        import numpy as np

        rng = np.random.default_rng(77)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab → real overlap
        n = 3
        limit = 150_000

        def rand_text():
            k = int(rng.integers(1, 15))
            return " ".join(vocab[int(rng.integers(0, len(vocab)))]
                            for _ in range(k))

        docs = [(i, rand_text()) for i in range(120)]
        bench = [(1000 + i, rand_text()) for i in range(15)]

        def grams_of(text):
            t = text.split(" ")
            return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}

        bench_set = set().union(*(grams_of(t) for _, t in bench))
        expect = {}
        for i, t in docs:
            g = grams_of(t)
            hits = len(g & bench_set)
            contam = (1_000_000 * hits) // len(g) if g else 0
            expect[i] = (len(g), hits, contam, 1 if contam <= limit else 0)

        ddf = spark.createDataFrame(docs, ["doc_id", "text"])
        bdf = spark.createDataFrame(bench, ["doc_id", "text"])
        out = decontaminate(ddf, benchmark_grams(bdf, "text", n),
                            n=n, max_contam_ppm=limit)
        got = {
            r["doc_id"]: (r["n_grams"], r["n_hits"], r["contam_ppm"], r["keep"])
            for r in out.collect()
        }
        assert got == expect
        # sanity that the fixture discriminates (not all-keep / all-drop)
        keeps = {v[3] for v in expect.values()}
        assert keeps == {0, 1}

    def test_plan_broadcasts_benchmark_single_shuffle(self, spark, corpus):
        docs, bench_docs = corpus
        bench = benchmark_grams(bench_docs, "text", n=3)
        plan = plan_of(decontaminate(docs, bench, n=3))
        # the benchmark set rides a broadcast — the corpus is never
        # shuffled for the join, so a hot shingle cannot skew a reducer
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # ONE exchange: the per-doc counting aggregate (map-side partials);
        # broadcast exchanges are not data shuffles
        n_shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert n_shuffles == 2  # one per aggregate side: partial + final read
