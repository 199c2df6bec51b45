"""CCNet-style bigram-LM perplexity filter (operators/lm.py): hand-computed
quantized scores on a planted model, an independent python scorer oracle on a
seeded corpus, Spark-vs-DuckDB twin equality, distributed-vs-driver count
equality, and the broadcast-join/single-shuffle plan shape."""

import math
import random
from collections import Counter

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.operators import lm


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


REF = [
    "the cat sat on the mat",
    "the dog sat on the rug",
    "a cat and a dog",
]


def fitted():
    bi, ctx = lm.count_bigrams_py(REF)
    return lm.fit_lm(bi, ctx)


class TestFit:
    def test_qlog10_known(self):
        assert lm.qlog10(0.1) == -1_000_000
        assert lm.qlog10(1.0) == 0
        assert lm.qlog10(0.5) == -301_030

    def test_counts_and_quantization(self):
        bi, ctx = lm.count_bigrams_py(REF)
        assert bi[("the", "cat")] == 1
        assert bi[("sat", "on")] == 2
        assert ctx["the"] == 4
        m = fitted()
        v = m["v"]
        # vocabulary: every context + every second word
        assert v == len({w for t in REF for w in t.split()})
        # q("sat","on") = qlog10((2+1)/(2+v))
        q = dict(((c, w), s) for c, w, s in m["rows"])
        assert q[("sat", "on")] == lm.qlog10(3 / (2 + v))
        qo = dict(m["ctx_rows"])
        assert qo["the"] == lm.qlog10(1 / (4 + v))
        assert m["q_global"] == lm.qlog10(1 / v)


class TestScore:
    def test_hand_computed_doc(self, spark):
        m = fitted()
        q = dict(((c, w), s) for c, w, s in m["rows"])
        qo = dict(m["ctx_rows"])
        docs = spark.createDataFrame(
            [
                (1, "the cat sat"),        # two in-model bigrams
                (2, "the zebra runs"),     # seen ctx + unseen; unseen ctx
                (3, "solo"),               # < 2 tokens
                (4, None),
                (5, ""),
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in lm.score_lm(docs, m).collect()}
        want1 = q[("the", "cat")] + q[("cat", "sat")]
        assert rows[1]["logq_sum"] == want1
        assert rows[1]["n_pairs"] == 2
        assert rows[1]["nll_ppm"] == math.floor(-want1 / 2)
        # doc 2: ("the","zebra") → ctx-OOV for "the"; ("zebra","runs") →
        # global OOV
        want2 = qo["the"] + m["q_global"]
        assert rows[2]["logq_sum"] == want2
        for d in (3, 4, 5):
            assert rows[d]["n_pairs"] == 0
            assert rows[d]["logq_sum"] == 0
            assert rows[d]["nll_ppm"] is None
            assert rows[d]["keep"] == 0

    def test_keep_threshold(self, spark):
        m = fitted()
        docs = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "zz qq ww ee")],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in lm.score_lm(docs, m, max_nll_ppm=800_000).collect()
        }
        # in-model text scores well below the OOV-dominated one
        assert out[1]["nll_ppm"] < out[2]["nll_ppm"]
        assert out[1]["keep"] == 1
        assert out[2]["keep"] == 0

    def test_seeded_corpus_matches_python_and_duckdb(self, spark):
        m = fitted()
        rng = random.Random(23)
        vocab = ["the", "cat", "dog", "sat", "on", "mat", "rug", "zzz", "a"]
        data = [
            (
                d,
                " ".join(
                    rng.choice(vocab) for _ in range(rng.randrange(0, 12))
                )
                or rng.choice(["", None]),
            )
            for d in range(70)
        ]
        docs = spark.createDataFrame(data, "doc_id long, text string")
        got = {
            r["doc_id"]: tuple(r)
            for r in lm.score_lm(docs, m).collect()
        }

        # independent python scorer (own lookups, own arithmetic)
        q = dict(((c, w), s) for c, w, s in m["rows"])
        qo = dict(m["ctx_rows"])
        for d, t in data:
            toks = [w for w in (t or "").split(" ") if w]
            ps = list(zip(toks, toks[1:]))
            s = sum(
                q.get(p, qo.get(p[0], m["q_global"])) for p in ps
            )
            n = len(ps)
            nll = math.floor(-s / n) if n else None
            keep = 1 if (n and nll <= 2_000_000) else 0
            assert got[d] == (d, n, s if n else 0, nll, keep), d

        # DuckDB twin equality
        con = duckdb.connect()
        con.register("src", pd.DataFrame(data, columns=["doc_id", "text"]))
        sql = lm.score_lm_sql("SELECT doc_id, text FROM src", m)
        want = {
            int(r[0]): (int(r[0]), int(r[1]), int(r[2]),
                        None if r[3] is None or r[3] != r[3] else int(r[3]),
                        int(r[4]))
            for r in con.execute(sql).fetchall()
        }
        assert got == want


class TestDistributedTraining:
    def test_matches_driver_counts(self, spark):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(REF + [None, ""])],
            "doc_id long, text string",
        )
        bi, ctx = lm.train_bigram_counts(docs)
        pbi, pctx = lm.count_bigrams_py(REF)
        assert bi == dict(pbi)
        assert ctx == dict(pctx)
        # end-to-end: distributed-trained model == driver-fitted model
        assert lm.train_lm(docs) == lm.fit_lm(pbi, pctx)


class TestPlan:
    def test_broadcast_joins_single_shuffle(self, spark):
        m = fitted()
        docs = spark.createDataFrame(
            [(1, "the cat sat")], "doc_id long, text string"
        )
        out = lm.score_lm(docs, m)
        out.collect()
        plan = plan_of(out)
        assert "BroadcastHashJoin" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "Window" not in plan, plan
        assert "EvalPython" not in plan, plan
        # the only hashpartitioning exchanges are the doc-keyed aggregation
        # (one per union branch at most)
        import re

        keys = set(re.findall(r"Exchange hashpartitioning\((_\w+)#", plan))
        assert keys <= {"_i"}, plan


class TestCappedCounts:
    def test_bigram_with_capped_out_context_degrades_to_oov(self, spark):
        # regression: bi_rows and ctx_rows are capped independently by
        # their own orders — a retained bigram's context can be missing.
        # fit_lm must degrade it to OOV, not KeyError.
        rows = []
        for i in range(10):
            rows.append((i, " ".join(f"c{i} w{j}" for j in range(3))))
        rows.append((100, " ".join(["hot next"] * 20)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        m = lm.train_lm(docs, max_ngrams=8)
        # every emitted row's context must exist in the ctx table
        ctxs = {c for c, _ in m["ctx_rows"]}
        assert all(c in ctxs for c, _, _ in m["rows"])
        # and scoring with the capped model still runs end to end
        assert lm.score_lm(docs, m).count() == 11
