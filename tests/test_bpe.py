"""BPE trainer + encoder (operators/bpe.py): the hand-derived Sennrich
example, exact equality against an independent from-scratch naive
reimplementation (own counting, own merge pass, recount-per-iteration — no
imports from the module kernel), trainer/encoder consistency, partitioning
independence, and the plan shapes."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from olake_spark.operators import bpe


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------- naive oracle
# deliberately reimplemented from the paper: recount ALL pairs every
# iteration, apply the chosen merge with its own replacement loop.


def naive_merges(word_freqs, num_merges, min_frequency=2):
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items() if w}
    merges = []
    while len(merges) < num_merges:
        counts = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        bc = max(counts.values())
        if bc < min_frequency:
            break
        best = min(p for p, c in counts.items() if c == bc)
        merges.append(best)
        nv = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and (syms[i], syms[i + 1]) == best
                ):
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def naive_encode(word, merges):
    syms = tuple(word) + ("</w>",)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = tuple(out)
    return syms


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestTrainer:
    def test_sennrich_example_first_merges(self):
        # hand-derived: (e,s)/(s,t)/(t,</w>) all count 9, smallest wins;
        # then the new 'es' symbol chains, then (l,o)/(o,w) at 7
        got = bpe.learn_merges(SENNRICH, num_merges=5)
        assert got == [
            ("e", "s"),
            ("es", "t"),
            ("est", "</w>"),
            ("l", "o"),
            ("lo", "w"),
        ]

    def test_matches_naive_oracle_seeded(self):
        rng = random.Random(11)
        alphabet = "abcdef"
        freqs = {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randrange(1, 9))
            ): rng.randrange(1, 40)
            for _ in range(120)
        }
        fast = bpe.learn_merges(freqs, num_merges=80)
        slow = naive_merges(freqs, num_merges=80)
        assert fast == slow

    def test_min_frequency_stop(self):
        # every word unique, freq 1: no pair ever reaches min_frequency=2
        freqs = {"abc": 1, "defg": 1}
        assert bpe.learn_merges(freqs, num_merges=10) == []
        # min_frequency=1 merges on
        assert len(bpe.learn_merges(freqs, 10, min_frequency=1)) > 0


class TestEncoder:
    def test_training_word_reproduces_trainer_state(self):
        # encoding a training word must equal the trainer's final symbols:
        # run the naive trainer to its final vocab and compare
        merges = bpe.learn_merges(SENNRICH, num_merges=8)
        vocab = {tuple(w) + ("</w>",): f for w, f in SENNRICH.items()}
        for a, b in merges:
            nv = {}
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = f
            vocab = nv
        final = {"".join(s).replace("</w>", ""): s for s in vocab}
        for w in SENNRICH:
            assert bpe.encode_word(w, merges) == final[w]

    def test_matches_naive_encode(self):
        merges = bpe.learn_merges(SENNRICH, num_merges=8)
        for w in ("low", "lowest", "news", "wide", "zzz"):
            assert bpe.encode_word(w, merges) == naive_encode(w, merges)

    def test_roundtrip_concatenation(self):
        merges = bpe.learn_merges(SENNRICH, num_merges=8)
        for w in ("low", "lower", "newest", "widest", "slowest"):
            toks = bpe.encode_word(w, merges)
            assert "".join(toks) == w + "</w>"


class TestSpark:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rng = random.Random(3)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 12))))
            for i in range(50)
        ] + [(50, None), (51, "")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_train_matches_driver_python(self, spark, docs):
        # the distributed path is ONLY the word count — its result must
        # equal counting driver-side
        freqs = Counter()
        for r in docs.collect():
            if r["text"]:
                for w in r["text"].split(" "):
                    if w:
                        freqs[w] += 1
        assert bpe.train_bpe(docs, num_merges=30) == bpe.learn_merges(
            dict(freqs), num_merges=30
        )

    def test_partitioning_independent(self, spark, docs):
        a = bpe.train_bpe(docs, num_merges=20)
        b = bpe.train_bpe(docs.repartition(7, "text"), num_merges=20)
        assert a == b

    def test_encode_dataframe(self, spark, docs):
        merges = bpe.train_bpe(docs, num_merges=20)
        out = {r["doc_id"]: r for r in bpe.bpe_encode(docs, merges).collect()}
        assert len(out) == 52
        # NULL text → NULL tokens, 0 count; empty text → empty tokens
        assert out[50]["tokens"] is None and out[50]["n_tokens"] == 0
        assert out[51]["tokens"] == [] and out[51]["n_tokens"] == 0
        # spot-check against the scalar encoder
        src = {r["doc_id"]: r["text"] for r in docs.collect()}
        for d in (0, 7, 23):
            want = []
            for w in src[d].split(" "):
                if w:
                    want.extend(bpe.encode_word(w, merges))
            assert out[d]["tokens"] == want
            assert out[d]["n_tokens"] == len(want)

    def test_plans(self, spark, docs):
        # word-count agg: map-side partial (two HashAggregates, one
        # exchange keyed on the word)
        counts = (
            docs.select(F.explode(F.split("text", " ")).alias("_w"))
            .filter(F.col("_w") != "")
            .groupBy("_w")
            .count()
        )
        counts.collect()
        p = plan_of(counts)
        assert p.count("HashAggregate") >= 2, p
        assert "Exchange hashpartitioning(_w" in p, p
        # encode: map-only Arrow python, no shuffle
        merges = [("a", "l")]
        enc = bpe.bpe_encode(docs, merges)
        enc.collect()
        pe = plan_of(enc)
        assert "Exchange" not in pe, pe
        assert "MapInPandas" in pe, pe
