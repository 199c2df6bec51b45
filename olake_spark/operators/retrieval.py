"""BM25-style text retrieval over the corpus — score documents against a
query and return the top-k, the curation primitive for "find training docs
relevant to X" and for query-based quality slicing.

Integer-exact BM25 variant: the classic BM25 shape

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

with every intermediate floored to integer ppm and one substitution — the
log idf is replaced by the BOUNDED rational surrogate

    idf_ppm(t) = floor((N − df(t)) · 1e6 / (N + df(t)))   ∈ [0, 1e6)

(strictly decreasing in df, so rare-term/common-term ordering matches;
bounded, so the arithmetic never outgrows BIGINT). The whole score is
BIGINT arithmetic both engines compute bit-identically — floats never
appear, and the DuckDB oracle twin (`bm25_topk_sql`) uses the same `//`
floor divisions. This is a declared variant, not textbook BM25: ranking
behavior matches BM25's shape, absolute scores do not.

Overflow budget (int64 max ≈ 9.2e18), dividing before multiplying
throughout: corpora to ~9e12 docs ((N−df)·1e6), documents to ~4e6 tokens
(the tf·(k1+1)·1e6 numerator of the term weight; dl·1e12 in the length
norm allows ~9e6), total corpus token count to ~9.2e18 (Spark's sum(dl)
is itself BIGINT — the split avgdl division removes the ·1e6 blow-up but
not the sum). Each bound sits well past the 10^12-row / normal-document
target.

Plan shape (scales to 10^12 docs): tokenize → explode ONLY the query's
terms (the filter prunes before the explode output is shuffled) → per-(doc,
term) tf via map-side-combined aggregation → broadcast the O(|q|) df/idf
table → per-doc sum → TakeOrdered(k). The corpus-global scalars (N, avgdl)
ride in on a broadcast single-row join. No Python anywhere in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.functions.text import PPM  # one source of truth


def _terms(query: str) -> list[str]:
    out: list[str] = []
    for t in query.split(" "):
        t = t.strip()
        if t and t not in out:
            if "'" in t:
                raise ValueError(f"query term with quote: {t!r}")
            out.append(t)
    return out


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> DataFrame:
    """Top-`k` (doc, score_ppm) for `query`, deterministic ties (doc asc)."""
    terms = _terms(query)
    base = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).withColumn("dl", F.size("toks").cast("long"))

    # corpus scalars: N docs, avgdl in ppm (single tiny row, broadcast).
    # avgdl's division is split so total_dl·1e6 never has to exist.
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_dl"),
    ).withColumn(
        "avgdl_ppm",
        F.expr(
            f"(total_dl div n_docs) * CAST({PPM} AS BIGINT) + "
            f"(total_dl % n_docs) * CAST({PPM} AS BIGINT) div n_docs"
        ).cast("long"),
    )

    tf = (
        base.select(
            "doc", "dl", F.explode("toks").alias("term")
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(
        F.countDistinct("doc").cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats), F.lit(True))
        # length norm, K and the per-term score — BIGINT floor arithmetic,
        # every multiply preceded by the division that bounds it
        .withColumn(
            "rel_dl_ppm",
            F.expr(f"dl * CAST({PPM} AS BIGINT) * {PPM} div avgdl_ppm"),
        )
        .withColumn(
            "k_ppm",
            F.expr(
                f"CAST({k1_ppm} AS BIGINT) * "
                f"({PPM} - {b_ppm} + ({b_ppm} * rel_dl_ppm div {PPM})) "
                f"div {PPM}"
            ),
        )
        .withColumn(
            "idf_ppm",  # bounded: [0, 1e6)
            F.expr(f"(n_docs - df) * CAST({PPM} AS BIGINT) div (n_docs + df)"),
        )
        .withColumn(
            "tfw_ppm",  # tf·(k1+1)/(tf + K): ≤ (k1+1)·1e6 ≈ 2.2e12
            F.expr(
                f"tf * CAST({k1_ppm} + {PPM} AS BIGINT) * {PPM} "
                f"div (tf * CAST({PPM} AS BIGINT) + k_ppm)"
            ),
        )
        .withColumn(
            "score_ppm", F.expr(f"idf_ppm * tfw_ppm div {PPM}")
        )
    )
    return (
        scored.groupBy("doc")
        .agg(F.sum("score_ppm").cast("long").alias("score_ppm"))
        # a doc whose matches all floored to idf 0 carries no relevance
        # signal: never let zero-score rows pad the top-k
        .filter(F.col("score_ppm") > 0)
        .orderBy(F.col("score_ppm").desc(), F.col("doc"))
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1_ppm: int = 1_200_000,
    b_ppm: int = 750_000,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — identical floor arithmetic."""
    terms = _terms(query)
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH base AS (
  SELECT CAST({id_col} AS BIGINT) AS doc,
         string_split({text_col}, ' ') AS toks,
         CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS dl
  FROM {table}
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST((sum(dl) // count(*)) * {PPM}
              + (sum(dl) % count(*)) * {PPM} // count(*) AS BIGINT)
           AS avgdl_ppm
  FROM base
), tf AS (
  SELECT doc, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc, dl, unnest(toks) AS term FROM base)
  WHERE term IN ({term_list})
  GROUP BY doc, dl, term
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc,
         ((n_docs - df) * CAST({PPM} AS BIGINT) // (n_docs + df))
           * (tf * CAST({k1_ppm} + {PPM} AS BIGINT) * {PPM}
              // (tf * CAST({PPM} AS BIGINT)
                  + (CAST({k1_ppm} AS BIGINT)
                     * ({PPM} - {b_ppm}
                        + ({b_ppm} * (dl * CAST({PPM} AS BIGINT) * {PPM}
                                      // avgdl_ppm) // {PPM}))
                     // {PPM})))
           // {PPM} AS score_ppm
  FROM tf, dfreq, stats
  WHERE tf.term = dfreq.term
)
SELECT doc, CAST(sum(score_ppm) AS BIGINT) AS score_ppm
FROM scored GROUP BY doc
HAVING sum(score_ppm) > 0
ORDER BY score_ppm DESC, doc
LIMIT {k}
""".strip()
