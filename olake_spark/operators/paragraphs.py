"""Cross-document paragraph-level exact deduplication — the CCNet shape.

Web-scale curation pipelines dedup below the document level: CCNet
(Wenzek et al. 2020 §3.1) hashes every paragraph and keeps a single
occurrence corpus-wide, which removes boilerplate (headers, nav bars,
cookie banners) that document-level dedup can never see because the
surrounding text differs. RefinedWeb and Dolma run the same stage
line-wise. This module is that operator over the repo's `documents`
shape: split each document on a separator, drop every paragraph
instance that is an exact duplicate of an earlier one anywhere in the
corpus, and reassemble the survivors in their original order.

Semantics (deterministic, partitioning-independent):

- a paragraph's *owner* is the lexicographically smallest
  ``(doc_id, paragraph_index)`` instance of its exact text anywhere in
  the corpus — the earliest document, earliest position. Only the owner
  instance survives; later instances (including repeats INSIDE the same
  document) are dropped.
- paragraphs shorter than ``min_chars`` characters bypass dedup and are
  always kept (default 1: empty lines — paragraph separators in
  ``\\n\\n``-joined text — never collapse across the corpus).
- a document keeps its row even when every paragraph is dropped
  (``text`` becomes ``''``; callers filter on ``n_kept``); NULL text
  stays NULL with ``n_paras = n_kept = 0``.

Scale shape — every row crosses at most TWO shuffle stages, zero joins,
zero windows (pinned by ``tests/test_paragraphs.py``; physically Spark
plants one exchange per union branch feeding the reassembly aggregate,
all keyed on the doc id):

1. owner election: ``groupBy(md5(paragraph))`` with a map-side-partial
   ``min(struct(doc, idx, ...))`` — the winning instance's text and
   per-doc bookkeeping ride the struct behind the unique ``(doc, idx)``
   prefix, so no join-back is needed and a boilerplate paragraph
   repeated a billion times costs its hot key only a partial-aggregated
   count, never a window sort or a join fan-out. The 32-hex md5 key
   keeps shuffle width independent of paragraph length.
2. reassembly: ``groupBy(doc_id)`` collecting ``(idx, paragraph)``
   structs, ``array_sort`` (per-doc, bounded by document size), and one
   ``concat_ws``.

Reference parity: the reference engine has no sub-document dedup (it is
an ingest/maintenance engine, SURVEY.md §2); this belongs to the repo's
LLM-data-pipeline layer alongside exact/MinHash/SimHash/semantic dedup.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEP = "\n"
DEFAULT_MIN_CHARS = 1


def dedup_paragraphs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> DataFrame:
    """Corpus-wide exact paragraph dedup of ``docs``.

    Returns one row per input document: ``id_col``, ``n_paras`` (split
    count before dedup), ``n_kept`` (surviving paragraphs) and
    ``text_col`` rebuilt from the survivors joined with ``sep`` (NULL in
    → NULL out; all-dropped → ``''``). ``sep`` is a LITERAL separator
    (regex-quoted before it reaches Spark's ``split``).
    """
    pat = re.escape(sep)
    n_paras = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(F.split(F.col(text_col), pat, -1))
    ).cast("long")
    paras = docs.select(
        F.col(id_col).alias("_i"),
        n_paras.alias("_n"),
        F.col(text_col).isNull().alias("_null"),
        F.posexplode(F.split(F.col(text_col), pat, -1)).alias("_x", "_p"),
    )
    # one NULL-paragraph sentinel per document (a second map-only scan of
    # the source, no shuffle): a document ALL of whose paragraphs lose
    # their owner election would otherwise produce zero reassembly rows
    # and vanish from the output — and NULL-text docs never explode at
    # all. count()/collect_list() skip the sentinel's NULL _p.
    sentinel = docs.select(
        F.col(id_col).alias("_i"),
        n_paras.alias("_n"),
        F.col(text_col).isNull().alias("_null"),
        F.lit(None).cast("int").alias("_x"),
        F.lit(None).cast("string").alias("_p"),
    )
    is_cand = F.length("_p") >= min_chars
    cand = paras.filter(is_cand)
    bypass = paras.filter(~is_cand).unionByName(sentinel)
    # owner election: ONE shuffle on the 32-hex md5 of the paragraph,
    # map-side partial min. (_i, _x) is unique, so the trailing struct
    # fields (_p, _n, _null) ride the comparison without affecting it.
    winners = (
        cand.groupBy(F.md5(F.col("_p")).alias("_h"))
        .agg(F.min(F.struct("_i", "_x", "_p", "_n", "_null")).alias("_w"))
        .select("_w.*")
    )
    kept = winners.unionByName(
        bypass.select("_i", "_x", "_p", "_n", "_null")
    )
    out = (
        kept.groupBy("_i")
        .agg(
            F.max("_n").alias("n_paras"),
            F.max("_null").alias("_was_null"),
            F.count("_p").alias("n_kept"),
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_p").isNotNull(),
                                F.struct("_x", "_p"),
                            )
                        )
                    ),
                    lambda s: s["_p"],
                ),
            ).alias("_t"),
        )
    )
    return out.select(
        F.col("_i").alias(id_col),
        F.col("n_paras"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.when(F.col("_was_null"), F.lit(None).cast("string"))
        .otherwise(F.col("_t"))
        .alias(text_col),
    )


def dedup_paragraphs_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = DEFAULT_SEP,
    min_chars: int = DEFAULT_MIN_CHARS,
) -> str:
    """DuckDB twin of :func:`dedup_paragraphs` — same column names, same
    owner rule, same NULL/empty contracts. ``docs_sql`` is a relation
    with (``id_col``, ``text_col``); ``sep`` must not contain ``'``."""
    s = sep.replace("'", "''")
    return f"""
WITH base AS (
  SELECT {id_col} AS i, {text_col} AS t,
         CASE WHEN {text_col} IS NULL THEN CAST(0 AS BIGINT)
              ELSE CAST(len(string_split({text_col}, '{s}')) AS BIGINT)
         END AS n
  FROM ({docs_sql})
),
paras AS (
  SELECT i, n,
         CAST(generate_subscripts(string_split(t, '{s}'), 1) - 1
              AS INT) AS x,
         unnest(string_split(t, '{s}')) AS p
  FROM base WHERE t IS NOT NULL
),
cand AS (SELECT * FROM paras WHERE length(p) >= {min_chars}),
bypass AS (SELECT * FROM paras WHERE length(p) < {min_chars}),
winners AS (
  SELECT i, n, x, p FROM (
    SELECT i, n, x, p,
           row_number() OVER (PARTITION BY md5(p) ORDER BY i, x) AS rn
    FROM cand
  ) WHERE rn = 1
),
kept AS (SELECT * FROM winners UNION ALL SELECT * FROM bypass),
agg AS (
  SELECT i,
         CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(p, '{s}' ORDER BY x) AS t2
  FROM kept GROUP BY i
)
SELECT b.i AS {id_col},
       b.n AS n_paras,
       COALESCE(a.n_kept, 0) AS n_kept,
       CASE WHEN b.t IS NULL THEN NULL
            ELSE COALESCE(a.t2, '') END AS {text_col}
FROM base b LEFT JOIN agg a ON b.i = a.i
"""
