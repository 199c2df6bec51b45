"""SemDeDup: semantic deduplication over an embedding column.

The cluster-then-prune recipe from Abbas et al. 2023 (arXiv:2303.09540,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"), the stage LAION/web-scale curation pipelines run AFTER
exact and MinHash dedup: documents that are not textual near-duplicates
can still be semantic duplicates (the same fact re-worded, the same
image re-encoded), and pruning them improves training efficiency.

Shape of the algorithm, exactly as published:

1. k-means-cluster all embeddings into K cells (K ~ n/1000 keeps cells
   small; the coarse quantizer is shared with the IVF ANN index — the
   SAME trained centroids serve both).
2. Within each cell, order members by similarity to their centroid and
   drop every item whose cosine similarity to ANY higher-priority
   member of the cell reaches the threshold. The paper's released
   implementation compares each row against all rows above it in the
   sorted similarity matrix (an upper-triangular max), which is what
   this module computes — NOT a sequential leader scan — so the
   decision for row i depends only on the static priority order, never
   on other rows' keep/drop outcomes. With ``prefer="low"`` (the
   paper's default) the kept representative of a duplicate group is
   the member LEAST similar to the centroid.

Determinism contract (what lets the DuckDB oracle re-derive every row):
cell assignment ranks the fold-exact squared distance (`sqdist_expr`)
with cent_id tiebreak; the priority order is the integer
(cent_sim_ppm, id) tuple where cent_sim_ppm is the fold-exact cosine to
the own-cell centroid; and the drop decision re-scores every candidate
pair with the fold-exact `cosine_ppm_expr`. The BLAS kernel only ever
*finds* candidate pairs (threshold minus a 1e-7 margin that dwarfs the
~1e-15 summation-order discrepancy), never *scores* them — the same
find-then-rescore discipline as `dedup.embedding_near_dup`.

Scale shape: production assignment is the zero-shuffle Arrow-batch BLAS
path (`ann.assign_cells(exact=False)`); the centroid join is a
broadcast; pair-finding is ONE shuffle (groupBy cell) into a
memory-bounded chunked-gram kernel, so peak task allocation is
O(chunk × cell) under ``budget_bytes`` regardless of cell size; the
exact re-score joins only the sparse candidate pairs back to their two
vectors. Within-cell work is inherently O(c²) FLOPs — the paper's
answer is K large enough that c stays bounded (they run K=50,000 on
LAION-440M); a pathologically hot cell degrades one task's time, never
its memory. No cartesian product, no window, no per-row Python
(kernels are Arrow-batched; everything else is Catalyst expressions).

Reference parity: the reference engine has no semantic-dedup stage (it
is an ingest/maintenance engine, SURVEY.md §2); this belongs to the
repo's LLM-data-pipeline layer alongside exact/MinHash/SimHash/pHash
dedup, per the assignment's training-data-pipeline scope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.operators.ann import assign_cells, _sqdist_sql
from olake_spark.operators.dedup import cosine_ppm_expr, cosine_ppm_sql, PPM

__all__ = ["semantic_dedup", "semantic_dedup_sql"]


def _prior_cond(sa: str, ia: str, sb: str, ib: str, prefer: str) -> str:
    """SQL boolean: is row a strictly prior to row b in the keep order?

    ``prefer="low"`` keeps the LEAST centroid-similar member of a
    duplicate group (the paper's default), so low cent_sim ranks first;
    ``prefer="high"`` keeps the most typical member. Ties always break
    on ascending id, making the order total and engine-independent
    (both operands are integers)."""
    if prefer == "low":
        first = f"{sa} < {sb}"
    elif prefer == "high":
        first = f"{sa} > {sb}"
    else:  # pragma: no cover - validated by callers
        raise ValueError(f"prefer must be 'low' or 'high', got {prefer!r}")
    return f"(({first}) OR ({sa} = {sb} AND {ia} < {ib}))"


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    threshold_ppm: int = 950_000,
    prefer: str = "low",
    exact_assign: bool = False,
    exact_pairs: bool = False,
    budget_bytes: int = 64 << 20,
) -> DataFrame:
    """One row per input row: (id, cell_id, cent_sim_ppm, is_kept).

    ``centroids`` is any (cent_id, cv) frame — `ann.train_ivf_centroids_
    kmeans` in production, `ann.ivf_centroids_by_id` when the whole
    index must be a pure function of the data (the gate/oracle setup).
    ``exact_pairs=True`` swaps the chunked-BLAS pair finder for a pure
    within-cell expression join (the oracle twin's literal shape) —
    verification only; it materializes every prior pair through
    Catalyst."""
    if prefer not in ("low", "high"):
        raise ValueError(f"prefer must be 'low' or 'high', got {prefer!r}")
    assigned = assign_cells(
        df, id_col, vec_col, centroids, 1, out_id="id", exact=exact_assign
    )
    scored = (
        assigned.join(F.broadcast(centroids), "cent_id")
        .withColumn("cent_sim_ppm", cosine_ppm_expr("_v", "cv"))
        .select(
            "id",
            F.col("cent_id").cast("long").alias("cell_id"),
            "cent_sim_ppm",
            "_v",
        )
    )

    if exact_pairs:
        a = scored.select(
            F.col("id").alias("id_a"), F.col("cell_id").alias("cell_a"),
            F.col("cent_sim_ppm").alias("sim_a"), F.col("_v").alias("va"),
        )
        b = scored.select(
            F.col("id").alias("id_b"), F.col("cell_id").alias("cell_b"),
            F.col("cent_sim_ppm").alias("sim_b"), F.col("_v").alias("vb"),
        )
        prior = F.expr(_prior_cond("sim_a", "id_a", "sim_b", "id_b", prefer))
        dropped = (
            a.join(b, (F.col("cell_a") == F.col("cell_b")) & prior)
            .filter(cosine_ppm_expr("va", "vb") >= F.lit(threshold_ppm))
            .select(F.col("id_b").alias("_dropped_id"))
            .distinct()
        )
    else:
        dropped = _kernel_dropped(
            scored, threshold_ppm, prefer, budget_bytes,
            df.schema[id_col].dataType.simpleString(),
        )

    out = scored.join(
        dropped, scored["id"] == dropped["_dropped_id"], "left"
    )
    return out.select(
        "id", "cell_id", "cent_sim_ppm",
        F.col("_dropped_id").isNull().alias("is_kept"),
    )


def _kernel_dropped(
    scored: DataFrame,
    threshold_ppm: int,
    prefer: str,
    budget_bytes: int,
    id_type: str,
) -> DataFrame:
    """Candidate (prior, later) pairs per cell via chunked normalized
    gram, then fold-exact re-score — only the re-score decides."""
    thr = threshold_ppm / float(PPM) - 1e-7
    sim_asc = prefer == "low"

    def find(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series(dtype="object"),
                              "id_b": pd.Series(dtype="object")})
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values(
            by=["cent_sim_ppm", "id"], ascending=[sim_asc, True]
        ).reset_index(drop=True)
        A = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(A, axis=1, keepdims=True)
        A /= np.where(n == 0.0, 1.0, n)
        ids = pdf["id"].to_numpy()
        chunk = max(1, budget_bytes // (8 * len(A)))
        outs_a, outs_b = [], []
        for s in range(1, len(A), chunk):
            e = min(s + chunk, len(A))
            # rows s..e-1 against ALL rows before e; strict lower triangle
            C = A[s:e] @ A[:e].T
            ib, ja = np.nonzero(C >= thr)
            keep = ja < (ib + s)  # prior index strictly below the row's own
            outs_a.append(ids[ja[keep]])
            outs_b.append(ids[ib[keep] + s])
        if not outs_a:
            return empty
        return pd.DataFrame({"id_a": np.concatenate(outs_a),
                             "id_b": np.concatenate(outs_b)})

    cand = scored.groupBy("cell_id").applyInPandas(
        find, f"id_a {id_type}, id_b {id_type}"
    )
    va = scored.select(F.col("id").alias("id_a"), F.col("_v").alias("va"))
    vb = scored.select(F.col("id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(cosine_ppm_expr("va", "vb") >= F.lit(threshold_ppm))
        .select(F.col("id_b").alias("_dropped_id"))
        .distinct()
    )


def semantic_dedup_sql(
    corpus: str,
    id_col: str,
    threshold_ppm: int,
    n_cells: int,
    prefer: str = "low",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle twin of :func:`semantic_dedup` with the by-id
    codebook: rebuilds the identical index (same centroids, fold-exact
    distance ranks, fold-exact centroid similarities and pair scores,
    same priority tuples) from the same table."""
    prior = _prior_cond("a.cent_sim_ppm", "a.id", "b.cent_sim_ppm", "b.id",
                        prefer)
    return f"""
WITH c AS (SELECT {id_col} AS id, {vec_col} AS v FROM {corpus}),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY {id_col} ASC) - 1 AS BIGINT)
           AS cent_id,
         {vec_col} AS cv
  FROM {corpus} QUALIFY row_number() OVER (ORDER BY {id_col} ASC) <= {n_cells}
),
assign AS (
  SELECT id, cent_id, v, cv FROM (
    SELECT c.id, cents.cent_id, c.v, cents.cv,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {_sqdist_sql('v', 'cv')} ASC,
                                       cent_id ASC) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
scored AS (
  SELECT id, cent_id AS cell_id, {cosine_ppm_sql('v', 'cv')} AS cent_sim_ppm, v
  FROM assign
),
dropped AS (
  SELECT DISTINCT b.id
  FROM scored a JOIN scored b
    ON a.cell_id = b.cell_id AND {prior}
  WHERE {cosine_ppm_sql('a.v', 'b.v')} >= {threshold_ppm}
)
SELECT s.id, s.cell_id, s.cent_sim_ppm,
       (d.id IS NULL) AS is_kept
FROM scored s LEFT JOIN dropped d ON d.id = s.id
"""
