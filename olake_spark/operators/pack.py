"""Sequence packing: assign documents to fixed token-budget training
sequences (context windows) with greedy next-fit.

The op every pretraining data pipeline runs between curation and batching:
given per-document token counts, pack documents into sequences of at most
``budget`` tokens, preserving a deterministic document order, and emit
(sequence id, offset) coordinates for the batch writer.

Distribution model — the 100 TB shape:
  * Documents are hash-bucketed (cross-engine-exact md5 bucket, same family
    as :mod:`olake_spark.functions.curate`); packing runs independently per
    bucket, so the job is one shuffle on ``bucket`` followed by
    embarrassingly-parallel group work. ``n_buckets`` scales with corpus
    size (target ~10-50k docs per bucket), so no task ever sees more than a
    bounded slice, and adding executors splits the work 1:1.
  * Next-fit inside a bucket is inherently sequential (each placement
    depends on the running fill), so the per-group step is an
    ``applyInPandas`` loop over the bucket's rows — O(rows) driver-free
    Python per task, Arrow-batched in and out. This is the textbook case
    where the built-in operators genuinely can't express the semantics.

Oracle: the same next-fit recurrence expressed as a DuckDB recursive CTE
(`pack_sequences_sql`), bit-identical because both engines walk documents
in the same (bucket, id) order over the same capped token counts.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = "doc long, bucket long, seq long, seq_off long, tok_used long"


# the cross-engine-exact md5 bucket pair is shared with every other
# bucketing op (one source of truth for the Spark≡DuckDB contract)
from olake_spark.functions.curate import hash_mod_col as _bucket_col
from olake_spark.functions.curate import hash_mod_sql as _bucket_sql


def _pack_group(pdf: pd.DataFrame, budget: int) -> pd.DataFrame:
    pdf = pdf.sort_values("doc", kind="mergesort").reset_index(drop=True)
    toks = pdf["tok"].to_numpy()
    n = len(toks)
    seqs = [0] * n
    offs = [0] * n
    seq = 0
    fill = 0
    for i in range(n):  # next-fit is a true recurrence; groups are bounded
        t = int(toks[i])
        if fill + t > budget:
            seq += 1
            fill = 0
        seqs[i] = seq
        offs[i] = fill
        fill += t
    return pd.DataFrame(
        {
            "doc": pdf["doc"],
            "bucket": pdf["bucket"],
            "seq": seqs,
            "seq_off": offs,
            "tok_used": toks,
        }
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens: F.Column,
    budget: int,
    n_buckets: int = 8,
) -> DataFrame:
    """Greedy next-fit packing of `df` rows into token sequences.

    `tokens` is any integer Column (e.g. ``text.token_count_col("text")``);
    counts larger than `budget` are capped so every document fits in one
    sequence (oversized docs become a full sequence on their own — the
    truncation the batch writer would apply anyway).

    Returns (doc, bucket, seq, seq_off, tok_used): document `doc` occupies
    `[seq_off, seq_off + tok_used)` of sequence (bucket, seq).
    """
    w = df.select(
        F.col(id_col).cast("long").alias("doc"),
        _bucket_col(id_col, n_buckets).alias("bucket"),
        F.least(tokens.cast("long"), F.lit(budget).cast("long")).alias("tok"),
    )
    return (
        w.repartition(n_buckets, "bucket")
        .groupBy("bucket")
        .applyInPandas(
            lambda pdf: _pack_group(pdf, budget), schema=_OUT_SCHEMA
        )
    )


def pack_sequences_sql(
    table: str,
    id_col: str,
    tokens_sql: str,
    budget: int,
    n_buckets: int = 8,
) -> str:
    """DuckDB twin of :func:`pack_sequences`: the same next-fit recurrence
    as a recursive CTE walking each bucket in (bucket, id) order."""
    return f"""
WITH RECURSIVE rows_t AS (
  SELECT CAST({id_col} AS BIGINT) AS doc,
         {_bucket_sql(id_col, n_buckets)} AS bucket,
         least(CAST({tokens_sql} AS BIGINT), {budget}) AS tok,
         row_number() OVER (
           PARTITION BY {_bucket_sql(id_col, n_buckets)}
           ORDER BY CAST({id_col} AS BIGINT)
         ) AS rn
  FROM {table}
), walk AS (
  SELECT doc, bucket, tok, rn,
         CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS seq_off, tok AS fill
  FROM rows_t WHERE rn = 1
  UNION ALL
  SELECT r.doc, r.bucket, r.tok, r.rn,
         CASE WHEN w.fill + r.tok > {budget} THEN w.seq + 1 ELSE w.seq END,
         CASE WHEN w.fill + r.tok > {budget}
              THEN CAST(0 AS BIGINT) ELSE w.fill END,
         CASE WHEN w.fill + r.tok > {budget}
              THEN r.tok ELSE w.fill + r.tok END
  FROM walk w JOIN rows_t r ON r.bucket = w.bucket AND r.rn = w.rn + 1
)
SELECT doc, bucket, seq, seq_off, tok AS tok_used FROM walk
""".strip()


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-bucket packing efficiency: sequences used, mean fill ppm."""
    per_seq = packed.groupBy("bucket", "seq").agg(
        F.sum("tok_used").alias("fill")
    )
    return per_seq.groupBy("bucket").agg(
        F.count("*").alias("n_seqs"),
        F.floor(F.avg(F.col("fill") * 1_000_000 / budget)).cast("long").alias(
            "mean_fill_ppm"
        ),
    )


# ---------------------------------------------------------------- chunking


def _check_chunk_params(max_tokens: int, stride: int | None) -> int:
    """Shared validation for both engines' builders: positive sizes, and
    stride ≤ max_tokens — a larger stride would skip the tokens between
    windows, silently dropping training data while the contract promises
    every token lands in at least one window."""
    if stride is None:
        stride = max_tokens
    if max_tokens <= 0 or stride <= 0:
        raise ValueError("max_tokens and stride must be positive")
    if stride > max_tokens:
        raise ValueError(
            f"stride ({stride}) > max_tokens ({max_tokens}) would leave "
            "tokens uncovered between windows"
        )
    return stride


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    stride: int | None = None,
) -> DataFrame:
    """The complement of :func:`pack_sequences`: split LONG documents into
    fixed-size training windows (the RefinedWeb/LLaMA prep stage — packing
    joins short documents, chunking cuts long ones; a pipeline runs both).

    Whitespace tokens (the module's shared convention); windows start at
    0, stride, 2·stride, … while start < total, each covering
    ``[start, min(start + max_tokens, total))`` — every token lands in at
    least one window, and ``stride < max_tokens`` yields the standard
    overlap of ``max_tokens − stride``. Documents with no tokens (NULL or
    empty text) emit zero rows.

    Map-only Catalyst: tokens once per doc, a ``sequence()`` of starts,
    one ``explode`` — zero shuffles, zero Python; the per-row output is
    (id, chunk_idx, start_tok, n_tokens, chunk_text). Scale note: output
    row count is Σ ceil(tokens/stride) — the explode is a generator, never
    a join, so a 100 TB corpus chunks in one pass with the same plan.
    """
    stride = _check_chunk_params(max_tokens, stride)
    toks = f"split({text_col}, ' ')"
    tot = f"size({toks})"
    starts = f"sequence(0, {tot} - 1, {stride})"
    return (
        docs.selectExpr(
            id_col,
            f"{toks} AS _toks",
            f"CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN "
            f"array() ELSE {starts} END AS _starts",
        )
        .select(
            F.col(id_col),
            F.col("_toks"),
            F.posexplode("_starts").alias("chunk_idx", "_start"),
        )
        .selectExpr(
            id_col,
            "chunk_idx",
            "CAST(_start AS BIGINT) AS start_tok",
            f"CAST(least({max_tokens}, size(_toks) - _start) AS BIGINT) "
            "AS n_tokens",
            f"array_join(slice(_toks, _start + 1, "
            f"least({max_tokens}, size(_toks) - _start)), ' ') AS chunk_text",
        )
    )


def chunk_documents_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    stride: int | None = None,
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same starts, same slices)."""
    stride = _check_chunk_params(max_tokens, stride)
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH base AS (
  SELECT {id_col}, {toks} AS toks,
         CASE WHEN {text_col} IS NULL OR {text_col} = '' THEN []
              ELSE range(0, len({toks}), {stride}) END AS starts
  FROM ({docs_sql})
), ex AS (
  SELECT {id_col}, toks, unnest(starts) AS start_tok
  FROM base
)
SELECT {id_col},
       CAST(start_tok // {stride} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({max_tokens}, len(toks) - start_tok) AS BIGINT)
         AS n_tokens,
       array_to_string(list_slice(toks, start_tok + 1,
         start_tok + least({max_tokens}, len(toks) - start_tok)), ' ')
         AS chunk_text
FROM ex
"""
