"""Property tests for the newest curation ops: sessionize and bm25_topk
against straightforward pure-Python references, split_by_hash invariants.
One Spark round-trip per test class (hypothesis drives the generated data
through a single parametrized run to keep wall time sane)."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.functions import curate
from olake_spark.operators.retrieval import bm25_topk
from olake_spark.operators.sessionize import sessionize

GAP = 100


def _py_sessionize(events):
    """Reference: events = [(event_id, user, ts_epoch)] → dict event -> row."""
    out = {}
    by_user = {}
    for ev, u, ts in events:
        by_user.setdefault(u, []).append((ts, ev))
    for u, evs in by_user.items():
        evs.sort()
        sess, seq, last, start_count = 0, 0, None, {}
        rows = []
        for ts, ev in evs:
            if last is not None and ts - last > GAP:
                sess += 1
                seq = 0
            rows.append([ev, u, ts, sess, seq])
            seq += 1
            last = ts
        spans = {}
        counts = {}
        for ev, _, ts, s, _ in rows:
            counts[s] = counts.get(s, 0) + 1
            lo, hi = spans.get(s, (ts, ts))
            spans[s] = (min(lo, ts), max(hi, ts))
        for ev, uu, ts, s, q in rows:
            out[ev] = (uu, ts, s, q, counts[s], spans[s][1] - spans[s][0])
    return out


def test_sessionize_matches_python_reference(spark):
    rng = random.Random(7)
    events = []
    eid = 0
    for u in range(25):
        ts = rng.randint(0, 1000)
        for _ in range(rng.randint(1, 40)):
            # deltas straddle the gap, including the EXACT boundary
            ts += rng.choice([1, 5, GAP - 1, GAP, GAP + 1, GAP * 3])
            events.append((eid, u, ts))
            eid += 1
    pdf = pd.DataFrame(events, columns=["event_id", "user_id", "ts_epoch"])
    df = spark.createDataFrame(pdf).withColumn(
        "ts", F.to_timestamp(F.col("ts_epoch"))
    )
    got = {
        r["event"]: (
            r["user"], r["ts_epoch"], r["session_idx"], r["event_seq"],
            r["session_events"], r["session_span_s"],
        )
        for r in sessionize(df, "user_id", "ts", "event_id", GAP).collect()
    }
    assert got == _py_sessionize(events)


def _py_bm25(docs, query, k1_ppm=1_200_000, b_ppm=750_000, k=10):
    PPM = 1_000_000
    toks = {d: t.split(" ") for d, t in docs}
    n = len(docs)
    total = sum(len(v) for v in toks.values())
    avgdl_ppm = (total // n) * PPM + (total % n) * PPM // n
    terms = []
    for t in query.split(" "):
        if t and t not in terms:
            terms.append(t)
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for d, v in toks.items():
        dl = len(v)
        s = 0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            rel = dl * PPM * PPM // avgdl_ppm
            k_ppm = k1_ppm * (PPM - b_ppm + (b_ppm * rel // PPM)) // PPM
            idf = (n - df[t]) * PPM // (n + df[t])
            tfw = tf * (k1_ppm + PPM) * PPM // (tf * PPM + k_ppm)
            s += idf * tfw // PPM
        if s > 0:
            scores[d] = s
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


def test_bm25_matches_python_reference(spark):
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "rare", "spark", "the", "a"]
    docs = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(3, 60))))
        for i in range(120)
    ]
    q = "rare spark delta"
    got = [
        (r["doc"], r["score_ppm"])
        for r in bm25_topk(
            spark.createDataFrame(docs, ["doc_id", "text"]),
            "doc_id", "text", q, k=10,
        ).collect()
    ]
    assert got == _py_bm25(docs, q)


def test_split_by_hash_invariants(spark):
    d = spark.range(0, 3000).withColumnRenamed("id", "k")
    w = {"train": 800_000, "val": 100_000, "test": 100_000}
    out = curate.split_by_hash(d, "k", w)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}  # full coverage, no null
    assert abs(counts["train"] / 3000 - 0.8) < 0.05
    # stability: assignment is a pure function of the key — a different
    # partitioning and a grown corpus agree on every shared key
    big = curate.split_by_hash(
        spark.range(0, 6000).withColumnRenamed("id", "k").repartition(13),
        "k", w,
    )
    a = {r["k"]: r["split"] for r in out.collect()}
    b = {r["k"]: r["split"] for r in big.collect()}
    assert all(b[k] == v for k, v in a.items())
    with pytest.raises(ValueError, match="sum"):
        curate.split_by_hash(d, "k", {"train": 1})
