"""Cross-corpus deduplication — flag new documents already present in (or
near-duplicating) an EXISTING reference corpus.

The incremental-curation shape every production pipeline needs and
single-corpus dedup can't express: a fresh crawl lands next to petabytes of
already-curated data, and the question is not "which of these new docs
duplicate each other" (operators/dedup.py answers that) but "which of them
duplicate something we already keep". RefinedWeb and CCNet both run this
directionally — new data is deduplicated AGAINST the accumulated corpus;
the reference corpus itself is never touched.

Two rungs, mirroring the in-corpus ladder:

- ``dedup_against_exact``: md5 content fingerprints, one anti-join-shaped
  left join on the fingerprint. The reference side collapses to its
  DISTINCT fingerprint set map-side before the join (a petabyte reference
  contributes |distinct texts| rows to the shuffle, not |rows|).
- ``dedup_against_jaccard``: exact k-shingle Jaccard via a posting-list
  join that only ever pairs ACROSS the two corpora (never within one), so
  the candidate space is |docs postings| × |matching reference postings| —
  with the same ``max_df`` stop-shingle skew guard as the in-corpus
  operator (a boilerplate shingle shared by millions of reference docs
  generates no candidates but still counts in union sizes).

Both emit ONE row per input document — (id, match evidence, ``keep``) —
so the output composes with the survivor-selection stage exactly like the
in-corpus flags. Scale note: for a standing reference corpus the posting
lists / fingerprint set are computed once and persisted (they are pure
projections); re-running against tomorrow's crawl reuses them.

Cross-engine: built from the same shared fragments as operators/dedup.py
(`shingles_col`/`shingles_sql`, md5, integer-ppm arithmetic), with DuckDB
twins generated per call.

Reference provenance: not in the reference engine (it moves rows) —
LLM-data-pipeline layer, the cross-corpus complement of operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.functions.text import shingles_col, shingles_sql

PPM = 1_000_000


def dedup_against_exact(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """(id, fingerprint, keep): keep=0 iff the document's md5 content
    fingerprint appears anywhere in the reference corpus."""
    ref_text = ref_text_col or text_col
    ref_fp = (
        reference.select(F.md5(F.col(ref_text)).alias("fingerprint"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        docs.select(
            F.col(id_col), F.md5(F.col(text_col)).alias("fingerprint")
        )
        .join(ref_fp, "fingerprint", "left")
        .select(
            id_col,
            "fingerprint",
            F.when(F.col("_hit").isNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("keep"),
        )
    )


def dedup_against_exact_sql(
    docs_sql: str,
    reference_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> str:
    ref_text = ref_text_col or text_col
    return f"""
WITH ref AS (
  SELECT DISTINCT md5({ref_text}) AS fingerprint FROM ({reference_sql})
)
SELECT d.{id_col}, md5(d.{text_col}) AS fingerprint,
       CAST(CASE WHEN ref.fingerprint IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM ({docs_sql}) d
LEFT JOIN ref ON ref.fingerprint = md5(d.{text_col})
"""


def dedup_against_jaccard(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str | None = None,
    ref_text_col: str | None = None,
    threshold_ppm: int = 400_000,
    k: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """(id, max_jaccard_ppm, keep): keep=0 iff ANY reference document's
    exact k-shingle Jaccard with this document reaches the threshold.
    Documents with no shingles (or no cross-corpus candidate) keep=1 with
    max_jaccard_ppm=0. ``max_df`` drops shingles whose COMBINED document
    frequency across both corpora exceeds it (skew guard); dropped
    shingles still count in the union sizes, like the in-corpus op."""
    d_sh = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.col(text_col), " ").alias("toks"),
    ).select("id", shingles_col("toks", k).alias("sh"))
    r_sh = reference.select(
        F.col(ref_id_col or id_col).alias("rid"),
        F.split(F.col(ref_text_col or text_col), " ").alias("toks"),
    ).select("rid", shingles_col("toks", k).alias("sh"))

    d_sizes = d_sh.select("id", F.size("sh").alias("na")).filter("na > 0")
    r_sizes = r_sh.select("rid", F.size("sh").alias("nb")).filter("nb > 0")
    d_posts = d_sh.select("id", F.explode("sh").alias("s"))
    r_posts = r_sh.select("rid", F.explode("sh").alias("s"))
    if max_df is not None:
        hot = (
            d_posts.select("s")
            .unionAll(r_posts.select("s"))
            .groupBy("s")
            .count()
            .filter(F.col("count") > max_df)
            .select("s")
        )
        d_posts = d_posts.join(F.broadcast(hot), "s", "left_anti")
        r_posts = r_posts.join(F.broadcast(hot), "s", "left_anti")

    shared = (
        d_posts.join(r_posts, "s")
        .groupBy("id", "rid")
        .agg(F.count("*").cast("long").alias("shared"))
    )
    scored = (
        shared.join(d_sizes, "id")
        .join(r_sizes, "rid")
        .withColumn(
            "j_ppm",
            F.floor(
                F.col("shared") * PPM
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).cast("long"),
        )
        .groupBy("id")
        .agg(F.max("j_ppm").alias("max_jaccard_ppm"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("max_jaccard_ppm", F.lit(0)).cast("long")
            .alias("max_jaccard_ppm"),
            (
                F.coalesce("max_jaccard_ppm", F.lit(0)) < threshold_ppm
            ).cast("long").alias("keep"),
        )
    )


def dedup_against_jaccard_sql(
    docs_sql: str,
    reference_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_id_col: str | None = None,
    ref_text_col: str | None = None,
    threshold_ppm: int = 400_000,
    k: int = 3,
    max_df: int | None = None,
) -> str:
    rid = ref_id_col or id_col
    rtext = ref_text_col or text_col
    df_filter = (
        f"WHERE s NOT IN (SELECT s FROM all_posts GROUP BY s "
        f"HAVING count(*) > {max_df})"
        if max_df is not None
        else ""
    )
    return f"""
WITH d_sh AS (
  SELECT id, {shingles_sql('t', k)} AS sh
  FROM (SELECT {id_col} AS id, string_split({text_col}, ' ') AS t
        FROM ({docs_sql}))
), r_sh AS (
  SELECT rid, {shingles_sql('t', k)} AS sh
  FROM (SELECT {rid} AS rid, string_split({rtext}, ' ') AS t
        FROM ({reference_sql}))
), d_sizes AS (SELECT id, len(sh) AS na FROM d_sh WHERE len(sh) > 0),
r_sizes AS (SELECT rid, len(sh) AS nb FROM r_sh WHERE len(sh) > 0),
d_posts_all AS (SELECT id, unnest(sh) AS s FROM d_sh),
r_posts_all AS (SELECT rid, unnest(sh) AS s FROM r_sh),
all_posts AS (
  SELECT s FROM d_posts_all UNION ALL SELECT s FROM r_posts_all
),
d_posts AS (SELECT id, s FROM d_posts_all {df_filter}),
r_posts AS (SELECT rid, s FROM r_posts_all {df_filter}),
shared AS (
  SELECT d.id, r.rid, CAST(count(*) AS BIGINT) AS shared
  FROM d_posts d JOIN r_posts r ON d.s = r.s
  GROUP BY d.id, r.rid
), scored AS (
  SELECT shared.id,
         max(CAST(floor(shared * {PPM}.0 / (na + nb - shared)) AS BIGINT))
           AS max_jaccard_ppm
  FROM shared
  JOIN d_sizes ON d_sizes.id = shared.id
  JOIN r_sizes ON r_sizes.rid = shared.rid
  GROUP BY shared.id
)
SELECT d.{id_col},
       CAST(coalesce(scored.max_jaccard_ppm, 0) AS BIGINT)
         AS max_jaccard_ppm,
       CAST(CASE WHEN coalesce(scored.max_jaccard_ppm, 0) < {threshold_ppm}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM ({docs_sql}) d
LEFT JOIN scored ON scored.id = d.{id_col}
"""
