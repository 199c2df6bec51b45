"""N-gram language-model perplexity filtering — the CCNet shape.

CCNet (Wenzek et al. 2020 §3.3) scores every web document with a language
model trained on a FIXED reference corpus (Wikipedia) and keeps the
low-perplexity head — the single most load-bearing quality filter in the
CCNet/LLaMA lineage. This module is that stage over the repo's `documents`
shape: an add-k-smoothed bigram LM (the honest in-sandbox stand-in for
KenLM's Kneser-Ney) trained once on a reference corpus, scoring the target
corpus distributedly.

Cross-engine exactness is the design center: probabilities never cross an
engine boundary as floats. The fitted model is a table of PRE-QUANTIZED
integer log-scores — ``qlog10(p) = floor(log10(p) * 1e6)`` computed ONCE in
python at fit time — and scoring is integer summation plus one final
floor-division, so the Spark plan and the DuckDB oracle agree bit-for-bit
on every document.

Model (add-k bigram):

- ``q(c, w)   = qlog10((count(c,w) + k) / (count(c) + k*V))`` per observed
  bigram (``V`` = vocabulary size);
- ``q_oov(c)  = qlog10(k / (count(c) + k*V))`` per observed context, for a
  seen context followed by an unseen word;
- ``q_global  = qlog10(1 / V)`` for an unseen context.

A document's score is the sum of ``q`` over its adjacent token pairs;
``nll_ppm`` is the per-pair average negative log10 in micro-units (CCNet's
perplexity in a monotone integer coat: ppl = 10^(nll_ppm / 1e6)), and
``keep`` thresholds it. Documents with fewer than two tokens score NULL
``nll_ppm`` and ``keep = 0`` (nothing to judge — CCNet buckets those
separately too).

Scale shape (plan-pinned in ``tests/test_lm.py``):

- scoring: map-side bigram explode → TWO broadcast left hash joins (the
  model table and the per-context OOV table — both driver-bounded by
  construction) → ONE counting shuffle on doc_id. The corpus is never
  sort-merge joined; zero-pair documents survive via a map-only sentinel
  scan (no join-back), the ``dedup_paragraphs`` trick.
- training: ONE ``groupBy(context, word)`` + ONE ``groupBy(context)``
  map-side-partial aggregation; the driver holds at most ``max_ngrams``
  rows, deterministically the most frequent (ties to the smallest pair) —
  the fixed reference corpus is Wikipedia-sized, not web-sized, so the cap
  is a guardrail, not a distortion.

Reference parity: not present in the reference (it moves rows, it doesn't
read them) — LLM-data-pipeline layer, sibling of `decontaminate` (same
broadcast-join discipline) and the Gopher rule modules.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000
DEFAULT_K = 1
DEFAULT_MAX_NGRAMS = 1_000_000


def qlog10(x: float) -> int:
    """floor(log10(x) * 1e6) — the one float touchpoint, at fit time only."""
    return math.floor(math.log10(x) * PPM)


# ------------------------------------------------------------------- fit


def count_bigrams_py(texts) -> tuple[Counter, Counter]:
    """Driver-side twin of the distributed count (and the fit input for a
    small fixed reference corpus): (bigram counts, context counts)."""
    bi: Counter = Counter()
    ctx: Counter = Counter()
    for t in texts:
        if not t:
            continue
        toks = [w for w in t.split(" ") if w]
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] += 1
            ctx[a] += 1
    return bi, ctx


def train_bigram_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_ngrams: int = DEFAULT_MAX_NGRAMS,
) -> tuple[dict, dict]:
    """Distributed bigram/context counts: map-side explode, map-side-partial
    aggs, deterministic top-``max_ngrams`` to the driver."""
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    pairs = docs.select(
        F.explode(
            F.expr(
                f"CASE WHEN {text_col} IS NULL OR size({toks}) < 2 "
                f"THEN array() "
                f"ELSE transform(sequence(0, size({toks}) - 2), "
                f"i -> named_struct('c', {toks}[i], 'w', {toks}[i + 1])) END"
            )
        ).alias("g")
    ).select(F.col("g.c").alias("_c"), F.col("g.w").alias("_w"))
    bi_rows = (
        pairs.groupBy("_c", "_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_c").asc(), F.col("_w").asc())
        .limit(max_ngrams)
        .collect()
    )
    ctx_rows = (
        pairs.groupBy("_c")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_c").asc())
        .limit(max_ngrams)
        .collect()
    )
    return (
        {(r["_c"], r["_w"]): r["_n"] for r in bi_rows},
        {r["_c"]: r["_n"] for r in ctx_rows},
    )


def fit_lm(
    bigrams: dict,
    contexts: dict,
    k: int = DEFAULT_K,
    vocab_size: int | None = None,
) -> dict:
    """Quantize counts into the integer model: ``{"rows": [(c, w, q)],
    "ctx_rows": [(c, q_oov)], "q_global": int, "v": int}`` — sorted,
    deterministic, JSON-able."""
    if vocab_size is None:
        vocab = {c for c in contexts} | {w for (_, w) in bigrams}
        vocab_size = max(len(vocab), 1)
    # a capped count collection can retain a bigram whose (independently
    # capped) context row was dropped — such bigrams degrade to OOV
    # instead of crashing the fit
    rows = [
        (c, w, qlog10((n + k) / (contexts[c] + k * vocab_size)))
        for (c, w), n in sorted(bigrams.items())
        if c in contexts
    ]
    ctx_rows = [
        (c, qlog10(k / (cn + k * vocab_size)))
        for c, cn in sorted(contexts.items())
    ]
    return {
        "rows": rows,
        "ctx_rows": ctx_rows,
        "q_global": qlog10(1.0 / vocab_size),
        "v": vocab_size,
    }


def train_lm(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    max_ngrams: int = DEFAULT_MAX_NGRAMS,
) -> dict:
    bi, ctx = train_bigram_counts(docs, text_col, max_ngrams)
    return fit_lm(bi, ctx, k)


# ----------------------------------------------------------------- score


def score_lm(
    docs: DataFrame,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_nll_ppm: int = 2_000_000,
) -> DataFrame:
    """Score every document against a fitted model. Returns one row per
    input document: ``id_col``, ``n_pairs``, ``logq_sum`` (integer sum of
    quantized log10 probabilities; 0 when no pairs), ``nll_ppm`` (average
    negative log10 in micro-units — NULL when no pairs), ``keep``."""
    spark = docs.sparkSession
    lm_df = spark.createDataFrame(
        lm["rows"] or [("", "", 0)], "_c string, _w string, _q long"
    )
    if not lm["rows"]:
        lm_df = lm_df.limit(0)
    ctx_df = spark.createDataFrame(
        lm["ctx_rows"] or [("", 0)], "_c string, _qo long"
    )
    if not lm["ctx_rows"]:
        ctx_df = ctx_df.limit(0)

    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    pairs = docs.select(
        F.col(id_col).alias("_i"),
        F.explode(
            F.expr(
                f"CASE WHEN {text_col} IS NULL OR size({toks}) < 2 "
                f"THEN array() "
                f"ELSE transform(sequence(0, size({toks}) - 2), "
                f"i -> named_struct('c', {toks}[i], 'w', {toks}[i + 1])) END"
            )
        ).alias("g"),
    ).select("_i", F.col("g.c").alias("_c"), F.col("g.w").alias("_w"))
    # zero-pair documents survive via a map-only sentinel scan, not a
    # join-back against the (large) corpus
    sentinel = docs.select(
        F.col(id_col).alias("_i"),
        F.lit(None).cast("string").alias("_c"),
        F.lit(None).cast("string").alias("_w"),
    )
    scored = (
        pairs.unionByName(sentinel)
        .join(F.broadcast(lm_df), ["_c", "_w"], "left")
        .join(F.broadcast(ctx_df), ["_c"], "left")
        .select(
            "_i",
            F.when(
                F.col("_w").isNotNull(),
                F.coalesce("_q", "_qo", F.lit(int(lm["q_global"]))),
            ).alias("_s"),
        )
    )
    agg = scored.groupBy("_i").agg(
        F.count("_s").alias("n_pairs"),
        F.coalesce(F.sum("_s"), F.lit(0)).alias("logq_sum"),
    )
    nll = F.expr(
        "CASE WHEN n_pairs = 0 THEN CAST(NULL AS BIGINT) "
        "ELSE CAST(floor((0 - logq_sum) * 1.0 / n_pairs) AS BIGINT) END"
    )
    return agg.select(
        F.col("_i").alias(id_col),
        "n_pairs",
        "logq_sum",
        nll.alias("nll_ppm"),
        F.expr(
            f"CAST(CASE WHEN n_pairs = 0 THEN 0 "
            f"WHEN CAST(floor((0 - logq_sum) * 1.0 / n_pairs) AS BIGINT) "
            f"<= {int(max_nll_ppm)} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("keep"),
    )


def score_lm_sql(
    docs_sql: str,
    lm: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_nll_ppm: int = 2_000_000,
) -> str:
    """DuckDB twin of :func:`score_lm` — same quantized integer table
    (embedded as VALUES), same arithmetic, same column names."""

    def esc(s: str) -> str:
        return s.replace("'", "''")

    lm_vals = ", ".join(
        f"('{esc(c)}', '{esc(w)}', {q})" for c, w, q in lm["rows"]
    ) or "('', '', 0)"
    ctx_vals = ", ".join(
        f"('{esc(c)}', {q})" for c, q in lm["ctx_rows"]
    ) or "('', 0)"
    lm_where = "" if lm["rows"] else " WHERE 1 = 0"
    ctx_where = "" if lm["ctx_rows"] else " WHERE 1 = 0"
    return f"""
WITH base AS (
  SELECT {id_col} AS i,
         list_filter(string_split({text_col}, ' '), t -> t != '') AS tk
  FROM ({docs_sql})
),
pairs AS (
  SELECT i, g[1] AS c, g[2] AS w
  FROM (SELECT i, unnest([[tk[x], tk[x + 1]] FOR x IN
                          range(1, len(tk))]) AS g FROM base)
),
lm(c, w, q) AS (SELECT * FROM (VALUES {lm_vals}){lm_where}),
ctxoov(c, qo) AS (SELECT * FROM (VALUES {ctx_vals}){ctx_where}),
agg AS (
  SELECT p.i,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(coalesce(lm.q, ctxoov.qo, {int(lm['q_global'])}))
              AS BIGINT) AS logq_sum
  FROM pairs p
  LEFT JOIN lm ON lm.c = p.c AND lm.w = p.w
  LEFT JOIN ctxoov ON ctxoov.c = p.c
  GROUP BY p.i
)
SELECT b.i AS {id_col},
       coalesce(a.n_pairs, 0) AS n_pairs,
       coalesce(a.logq_sum, 0) AS logq_sum,
       CASE WHEN a.n_pairs IS NULL THEN CAST(NULL AS BIGINT)
            ELSE CAST(floor((0 - a.logq_sum) * 1.0 / a.n_pairs) AS BIGINT)
       END AS nll_ppm,
       CAST(CASE WHEN a.n_pairs IS NULL THEN 0
                 WHEN CAST(floor((0 - a.logq_sum) * 1.0 / a.n_pairs)
                      AS BIGINT) <= {int(max_nll_ppm)} THEN 1 ELSE 0
            END AS BIGINT) AS keep
FROM (SELECT DISTINCT i FROM base) b
LEFT JOIN agg a ON a.i = b.i
"""
