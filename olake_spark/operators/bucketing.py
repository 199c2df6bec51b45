"""Aspect-ratio bucketing + fixed-size batch packing for image training.

The NovelAI bucketing recipe (adopted by SDXL, Podell et al. 2023 §2.3
"Multi-Aspect Training"): variable-aspect images cannot share a training
batch, and center-cropping everything to one square throws away signal —
so the pipeline (1) generates a small grid of (w, h) resolutions whose
areas all fit a pixel budget, (2) assigns every image to the grid entry
with the closest aspect ratio, and (3) forms fixed-size batches WITHIN a
bucket so every batch is shape-homogeneous. This module is those three
steps over this engine's image+caption data model — the image-side
sibling of :func:`olake_spark.operators.pack.pack_sequences`.

Determinism contract: the grid is a pure function of
(max_pixels, step, min_side, max_side); assignment minimizes the integer
aspect-closeness ``greatest(a_img, a_bkt) * 1e6 div least(a_img, a_bkt)``
where each aspect is ``w * 1e6 div h`` (symmetric in portrait/landscape,
the integer twin of NovelAI's |log a − log b| criterion), ties broken on
ascending (bucket_w, bucket_h); batch coordinates come from the
cross-engine-exact md5 shard hash + a per-(bucket, shard) row_number in
ascending id order. Every step is exact int64 arithmetic re-derivable in
ANSI SQL, so the DuckDB oracle reproduces each row bit-for-bit.

Scale shape (the 10^12-image story):
  * The grid is tens of rows — it rides the plan as a LITERAL array of
    structs and assignment is one ``array_min(transform(...))`` fold per
    row: map-only, ZERO shuffles, zero joins (plan-pinned in
    ``tests/test_bucketing.py``). No broadcast needed — the grid is
    folded into the plan itself.
  * Batch packing shuffles ONCE on (bucket, shard): the md5 shard splits
    a hot bucket (web corpora are ~half 1:1-ish) across ``n_shards``
    independent tasks, so no task ever sorts more than ~|bucket| /
    n_shards rows and adding executors splits the work 1:1 — the same
    skew answer pack_sequences uses. The in-partition row_number is the
    only window, and its partition IS the shuffle key (no global
    window).

Downstream: ``(bucket_w, bucket_h)`` are the per-group resize targets —
:func:`olake_spark.operators.multimodal.resize_images` (or the decode
kernel) consumes them; the short tail batch of each (bucket, shard) is
the loader's drop-last set.

Reference parity: the reference engine has no training-batch layer (it
is an ingest/maintenance engine, SURVEY.md §2); this belongs to the
repo's LLM-data-pipeline layer alongside pack_sequences / image quality
rules, per the assignment's training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olake_spark.functions.curate import hash_mod_col, hash_mod_sql

__all__ = [
    "aspect_bucket_grid",
    "assign_aspect_buckets",
    "assign_aspect_buckets_sql",
    "pack_batches",
    "pack_batches_sql",
]

PPM = 1_000_000


def aspect_bucket_grid(
    max_pixels: int = 512 * 512,
    step: int = 64,
    min_side: int = 256,
    max_side: int = 1024,
) -> list[tuple[int, int]]:
    """The NovelAI bucket grid: for every width that is a multiple of
    ``step`` in [min_side, max_side], pair it with the largest
    step-multiple height that keeps ``w * h <= max_pixels`` (and its
    transpose, so portrait and landscape are symmetric). Sorted (w, h)
    tuples; a pure function of the parameters."""
    if step <= 0 or min_side <= 0 or min_side % step:
        raise ValueError(f"min_side must be a positive multiple of {step}")
    buckets: set[tuple[int, int]] = set()
    for w in range(min_side, max_side + 1, step):
        h = min((max_pixels // w) // step * step, max_side)
        if h >= min_side:
            buckets.add((w, h))
            buckets.add((h, w))
    if not buckets:
        raise ValueError(
            f"no bucket satisfies min_side={min_side} under "
            f"max_pixels={max_pixels}"
        )
    return sorted(buckets)


def _aspect_sql(w: str, h: str, div: str = "div") -> str:
    return f"(CAST({w} AS BIGINT) * {PPM} {div} CAST({h} AS BIGINT))"


def _closeness_sql(a_img: str, a_bkt: str, div: str = "div") -> str:
    """Integer aspect closeness (>= 1e6; == 1e6 iff equal aspects) — the
    symmetric ratio twin of |log a − log b|. max operand is
    a * 1e6 <= ~6.5e16 for 16-bit dimensions: exact in int64, NEVER a
    float (float64 rounds above 2^53 and the oracle would diverge).
    ``div`` is the engine's integer-division spelling (Spark ``div``,
    DuckDB ``//``) — the only token the two plans don't share."""
    return (
        f"(greatest({a_img}, {a_bkt}) * {PPM} "
        f"{div} least({a_img}, {a_bkt}))"
    )


def assign_aspect_buckets(
    df: DataFrame,
    grid: list[tuple[int, int]],
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Adds (aspect_ppm, bucket_w, bucket_h, closeness_ppm): the grid
    entry whose aspect ratio is closest to each row's, ties on ascending
    (bucket_w, bucket_h). The grid rides the plan as a literal struct
    array and the argmin is one ``array_min(transform(...))`` fold per
    row (struct ordering is field-lexicographic, so (r, bw, bh) IS the
    ranking) — map-only, no shuffle, no join. Rows with NULL or
    non-positive dimensions get NULL bucket columns (unknown is not
    assignable)."""
    lits = ", ".join(
        f"named_struct('bw', CAST({bw} AS BIGINT), 'bh', CAST({bh} AS "
        f"BIGINT), 'bap', CAST({bw * PPM // bh} AS BIGINT))"
        for bw, bh in grid
    )
    valid = (
        f"{w_col} IS NOT NULL AND {h_col} IS NOT NULL "
        f"AND {w_col} > 0 AND {h_col} > 0"
    )
    ap = _aspect_sql(w_col, h_col)
    best = (
        f"array_min(transform(array({lits}), b -> named_struct("
        f"'r', {_closeness_sql('_ap', 'b.bap')}, "
        f"'bw', b.bw, 'bh', b.bh)))"
    )
    return (
        df.withColumn(
            "_ap", F.expr(f"CASE WHEN {valid} THEN {ap} END")
        )
        .withColumn(
            "_best", F.expr(f"CASE WHEN _ap IS NOT NULL THEN {best} END")
        )
        .select(
            "*",
            F.col("_ap").alias("aspect_ppm"),
            F.col("_best.bw").alias("bucket_w"),
            F.col("_best.bh").alias("bucket_h"),
            F.col("_best.r").alias("closeness_ppm"),
        )
        .drop("_ap", "_best")
    )


def assign_aspect_buckets_sql(
    table: str,
    grid: list[tuple[int, int]],
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> str:
    """DuckDB twin of :func:`assign_aspect_buckets`: the same grid as a
    VALUES list, the same exact-integer closeness, the same
    (r, bw, bh) argmin via row_number. ``table`` may be any relation
    string (wrap subqueries in parentheses)."""
    values = ", ".join(
        f"(CAST({bw} AS BIGINT), CAST({bh} AS BIGINT), "
        f"CAST({bw * PPM // bh} AS BIGINT))"
        for bw, bh in grid
    )
    close = _closeness_sql("i.aspect_ppm", "g.bap", div="//")
    return f"""
WITH img AS (
  SELECT *,
         CASE WHEN {w_col} IS NOT NULL AND {h_col} IS NOT NULL
                   AND {w_col} > 0 AND {h_col} > 0
              THEN CAST({w_col} AS BIGINT) * {PPM} // CAST({h_col} AS BIGINT)
         END AS aspect_ppm
  FROM {table}
),
grid(bw, bh, bap) AS (VALUES {values}),
ranked AS (
  SELECT i.*, g.bw AS bucket_w, g.bh AS bucket_h, {close} AS closeness_ppm,
         row_number() OVER (
           PARTITION BY i.{id_col}
           ORDER BY {close} ASC, g.bw ASC, g.bh ASC
         ) AS _rn
  FROM img i JOIN grid g ON i.aspect_ppm IS NOT NULL
)
SELECT * EXCLUDE (_rn) FROM ranked WHERE _rn = 1
UNION ALL
SELECT *, NULL AS bucket_w, NULL AS bucket_h, NULL AS closeness_ppm
FROM img WHERE aspect_ppm IS NULL
"""


def pack_batches(
    df: DataFrame,
    id_col: str,
    batch_size: int,
    bucket_cols: tuple[str, str] = ("bucket_w", "bucket_h"),
    n_shards: int = 8,
) -> DataFrame:
    """Fixed-size shape-homogeneous batches within each aspect bucket:
    adds (shard, batch_idx, slot). Rows shard by the cross-engine md5
    hash of ``id_col`` (a hot bucket splits across ``n_shards``
    independent tasks); within (bucket, shard) rows take ascending-id
    positions, ``batch_idx = pos div batch_size``, ``slot = pos mod
    batch_size``. The tail batch of each (bucket, shard) may be short —
    the loader's drop-last set. Unassigned rows (NULL bucket) are
    excluded. ONE shuffle, keyed exactly by the window partition."""
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    bw, bh = bucket_cols
    win = Window.partitionBy(bw, bh, "shard").orderBy(F.col(id_col).asc())
    return (
        df.filter(F.col(bw).isNotNull())
        .withColumn("shard", hash_mod_col(id_col, n_shards))
        .withColumn(
            "_pos", (F.row_number().over(win) - F.lit(1)).cast("bigint")
        )
        .select(
            "*",
            F.expr(f"_pos div {batch_size}").alias("batch_idx"),
            F.expr(f"_pos % {batch_size}").alias("slot"),
        )
        .drop("_pos")
    )


def pack_batches_sql(
    table: str,
    id_col: str,
    batch_size: int,
    bucket_cols: tuple[str, str] = ("bucket_w", "bucket_h"),
    n_shards: int = 8,
) -> str:
    """DuckDB twin of :func:`pack_batches`."""
    bw, bh = bucket_cols
    shard = hash_mod_sql(id_col, n_shards)
    return f"""
WITH p AS (
  SELECT *, {shard} AS shard,
         CAST(row_number() OVER (
           PARTITION BY {bw}, {bh}, {shard}
           ORDER BY {id_col} ASC) - 1 AS BIGINT) AS _pos
  FROM {table}
  WHERE {bw} IS NOT NULL
)
SELECT * EXCLUDE (_pos),
       _pos // {batch_size} AS batch_idx,
       _pos % {batch_size} AS slot
FROM p
"""
