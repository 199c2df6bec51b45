"""Benchmark decontamination: per-document n-gram overlap against an
eval/benchmark set, GPT-3 appendix-C / Llama style.

Every serious training-data pipeline removes documents that leak the
evaluation benchmarks before training (Brown et al. 2020 appendix C;
PaLM §6.2 uses the same shape): tokenize, form n-gram shingles, and drop
(or flag) any document whose shingle set overlaps the benchmark's above
a threshold. This module is that operator over the repo's `documents`
shape, built from the same shared expression fragments as the rest of
the text layer (``text.shingles_col`` / ``curate.hash_mod_col``), so the
Spark plan and the DuckDB oracle agree bit-for-bit.

Scale shape (the reason this is one operator and not a join recipe):
benchmark suites are tiny next to a 100 TB corpus — a few hundred MB of
eval text at most — so the benchmark's distinct shingle set ALWAYS fits
a broadcast. The corpus side is one map-side explode of per-document
distinct shingles, a broadcast hash left join (no shuffle of the corpus,
no skew exposure — hot shingles only fan out within a task), and ONE
shuffle: the groupBy(doc_id) re-collect, which Spark partially
aggregates map-side. ``tests/test_decontaminate.py`` pins the plan to
exactly that: one BroadcastHashJoin, no SortMergeJoin, a single
exchange on the counting aggregate.

Reference parity: the reference engine has no decontamination stage (it
is an ingest/maintenance engine, SURVEY.md §2); this belongs to the
repo's LLM-data-pipeline layer alongside dedup/quality/sampling, per the
assignment's training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.functions.text import PPM, shingles_col, shingles_sql, tokens_col

# contamination threshold: drop a document when more than 8% of its
# distinct n-grams appear in the benchmark set (GPT-3 used any-collision
# on 13-grams; a ratio is the PaLM/Llama-2 refinement that tolerates
# idiomatic short collisions). Fixtures override it to discriminate on
# short synthetic documents.
DEFAULT_MAX_CONTAM_PPM = 80_000
DEFAULT_NGRAM = 5


def benchmark_grams(bench_docs: DataFrame, text_col: str = "text",
                    n: int = DEFAULT_NGRAM) -> DataFrame:
    """The distinct n-gram shingle set of a benchmark corpus, as a
    one-column (`g`) DataFrame. Small by construction (benchmarks are
    MBs); callers broadcast it."""
    return (
        bench_docs
        .withColumn("_toks", tokens_col(text_col))
        .select(F.explode(shingles_col("_toks", n)).alias("g"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    max_contam_ppm: int = DEFAULT_MAX_CONTAM_PPM,
) -> DataFrame:
    """Per-document contamination audit of ``docs`` against the benchmark
    shingle set ``bench`` (one column ``g``, e.g. from
    :func:`benchmark_grams`).

    Returns one row per input document: ``n_grams`` (distinct shingles),
    ``n_hits`` (of those, how many appear in the benchmark),
    ``contam_ppm`` (integer ppm ratio, 0 for shingle-less docs) and
    ``keep`` (0/1: contamination at or under ``max_contam_ppm``).
    Deterministic, pure Catalyst; callers filter on ``keep`` to drop.
    """
    grams = (
        docs
        .withColumn("_toks", tokens_col(text_col))
        .select(F.col(id_col), shingles_col("_toks", n).alias("_grams"))
        # explode_outer: shingle-less docs (< n tokens) must still be
        # audited — they surface with n_grams = 0, trivially clean
        .select(id_col, F.explode_outer("_grams").alias("g"))
    )
    hits = grams.join(
        F.broadcast(bench.select(F.col("g"), F.lit(1).alias("_hit"))),
        "g",
        "left",
    )
    # count(col) skips nulls on both sides: the explode_outer null gram
    # and the missed-join null marker
    agg = hits.groupBy(id_col).agg(
        F.count("g").alias("n_grams"),
        F.count("_hit").alias("n_hits"),
    )
    contam = F.when(
        F.col("n_grams") > 0,
        F.expr(f"CAST(({PPM} * n_hits) DIV n_grams AS BIGINT)"),
    ).otherwise(F.lit(0).cast("long"))
    return agg.select(
        F.col(id_col),
        F.col("n_grams"),
        F.col("n_hits"),
        contam.alias("contam_ppm"),
        (contam <= max_contam_ppm).cast("long").alias("keep"),
    )


def decontaminate_oracle_sql(
    docs_sql: str,
    bench_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_NGRAM,
    max_contam_ppm: int = DEFAULT_MAX_CONTAM_PPM,
) -> str:
    """DuckDB twin of :func:`decontaminate` — same column names, same
    integer arithmetic. ``docs_sql`` / ``bench_sql`` are relations with
    (id, text) columns (the latter only needs ``text_col``)."""
    sh = shingles_sql("t", n)
    return f"""
WITH corpus AS (
  SELECT {id_col}, {sh} AS grams
  FROM (SELECT {id_col}, string_split({text_col}, ' ') AS t
        FROM ({docs_sql}))
),
bench AS (
  SELECT DISTINCT gr FROM (
    SELECT unnest({sh}) AS gr
    FROM (SELECT string_split({text_col}, ' ') AS t FROM ({bench_sql}))
  )
),
ex AS (SELECT {id_col}, unnest(grams) AS gr FROM corpus),
counted AS (
  SELECT ex.{id_col},
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(b.gr) AS BIGINT) AS n_hits
  FROM ex LEFT JOIN bench b ON ex.gr = b.gr
  GROUP BY ex.{id_col}
)
SELECT c.{id_col},
       COALESCE(h.n_grams, 0) AS n_grams,
       COALESCE(h.n_hits, 0) AS n_hits,
       CASE WHEN COALESCE(h.n_grams, 0) > 0
            THEN ({PPM} * h.n_hits) // h.n_grams
            ELSE 0 END AS contam_ppm,
       CAST((CASE WHEN COALESCE(h.n_grams, 0) > 0
                  THEN ({PPM} * h.n_hits) // h.n_grams
                  ELSE 0 END) <= {max_contam_ppm} AS BIGINT) AS keep
FROM corpus c LEFT JOIN counted h ON c.{id_col} = h.{id_col}
"""
