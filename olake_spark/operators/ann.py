"""Similarity search over an embedding column (`array<float>`).

- `knn_bruteforce`: exact cosine top-k — the correctness baseline. The small
  query side is broadcast; similarity is a fold-based Catalyst expression
  (whole-stage codegen, no Python); top-k is a per-query window. At corpus
  scale this is one broadcast-join pass over the corpus: no shuffle of the
  big side at all until the (tiny) per-query aggregation.
- `lsh_buckets` / `knn_lsh`: the scale path — random-hyperplane LSH maps
  each vector to a bucket id (vectorized numpy over Arrow batches); search
  touches only matching buckets (multi-probe over Hamming-1 neighbors keeps
  recall high). Bucket ids are uniform hashes → skew-free join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType

from olake_spark.operators.dedup import cosine_ppm_expr

N_PLANES = 8  # 2^8 = 256 buckets
_LSH_SEED = 7


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded).
    Returns (query_id, neighbor_id, rank, cos_ppm), rank 1..k, ties broken by
    neighbor id — fully deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_ppm", cosine_ppm_expr("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_ppm")
    )


def knn_bruteforce_sql(
    corpus: str, queries_pred: str, id_col: str, cos_ppm: str, k: int = 5
) -> str:
    """DuckDB oracle twin of :func:`knn_bruteforce`; `cos_ppm` is the SQL for
    cosine_ppm over columns qv / cv."""
    return f"""
WITH q AS (SELECT {id_col} AS query_id, embedding AS qv FROM {corpus}
           WHERE {queries_pred}),
c AS (SELECT {id_col} AS neighbor_id, embedding AS cv FROM {corpus}),
scored AS (
  SELECT query_id, neighbor_id, {cos_ppm} AS cos_ppm
  FROM c JOIN q ON query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_ppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_ppm
FROM ranked WHERE rank <= {k}
"""


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED + 1009 * table)
    return rng.standard_normal((n_planes, dim))


def auto_planes(n_rows: int, target_bucket_rows: int = 64) -> int:
    """Planes per table sized so a bucket holds ≈target_bucket_rows vectors:
    2^planes ≈ n/target. 10^9 vectors → 24 planes; recall lost to finer
    buckets is bought back with multiple tables + multiprobe."""
    import math

    return max(2, min(30, math.ceil(math.log2(max(2, n_rows / target_bucket_rows)))))


def lsh_bucket_exprs(
    vec_col: str, dim: int, n_planes: int = N_PLANES, n_tables: int = 1
) -> list:
    """Pure-Catalyst bucket ids, one Column per hash table: each plane's sign
    comes from a sequential double-precision left fold (`aggregate` over
    `zip_with` with the plane as a literal array) — the SAME fold shape as
    `cosine_ppm_expr`, so it is bit-identical to the DuckDB `list_reduce`
    twin in :func:`knn_lsh_sql` and the whole LSH becomes exactly oracle-able.

    The numpy UDF path (`lsh_bucket_udf`) computes the same buckets via one
    BLAS matmul per Arrow batch — the throughput path — but BLAS summation
    order is not the sequential fold, so a dot product within float-ulp of
    zero could (astronomically rarely) sign-flip across engines. This path is
    all JVM whole-stage codegen (zero Python), deterministic to the bit."""
    exprs = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        b = F.lit(0)
        for p in range(n_planes):
            arr = F.array(*[F.lit(float(v)) for v in planes[p]])
            prod = F.zip_with(
                F.col(vec_col), arr, lambda x, y: x.cast("double") * y
            )
            dot = F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)
            b = b + F.when(dot > F.lit(0.0), F.lit(1 << p)).otherwise(F.lit(0))
        exprs.append(b.cast("int"))
    return exprs


def lsh_bucket_udf(dim: int, n_planes: int = N_PLANES, n_tables: int = 1):
    """array<int> of one bucket id per hash table; a single stacked matmul
    per Arrow batch computes all tables at once."""
    flat = np.concatenate(
        [_hyperplanes(dim, n_planes, t) for t in range(n_tables)]
    )  # (T*P, dim)
    weights = 1 << np.arange(n_planes)

    def bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ flat.T) > 0  # (batch, T*P)
        ids = (
            (signs.reshape(len(m), n_tables, n_planes) * weights)
            .sum(axis=2)
            .astype(np.int32)
        )
        return pd.Series(list(ids))

    return pandas_udf(bucket, ArrayType(IntegerType()))


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = N_PLANES,
    n_tables: int = 1,
    exact: bool = False,
) -> DataFrame:
    """(id, v, table, bucket) — one row per (vector, hash table). `exact`
    swaps the BLAS-matmul pandas UDF for the bit-deterministic Catalyst fold
    (see lsh_bucket_exprs)."""
    buckets = (
        F.array(*lsh_bucket_exprs(vec_col, dim, n_planes, n_tables))
        if exact
        else lsh_bucket_udf(dim, n_planes, n_tables)(F.col(vec_col))
    )
    tagged = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        buckets.alias("buckets"),
    )
    return tagged.select(
        "id", "v", F.posexplode("buckets").alias("table", "bucket")
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    multiprobe: bool = True,
    n_planes: int | None = None,
    n_tables: int = 4,
    n_rows: int | None = None,
    exact_buckets: bool = False,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH: a candidate
    shares the query's bucket in ANY of `n_tables` independent tables (plus
    all Hamming-1 buckets per table under multi-probe). Same output schema as
    brute force; recall vs brute force is property-tested
    (tests/test_properties.py) — ≥0.9 for true near neighbors (cos ≈ 0.95+),
    the regime LSH is for. `n_planes` defaults to auto_planes(|corpus|), so
    buckets stay ≈64 rows at any corpus size (10^9 vectors → 24-bit buckets ×
    4 tables); the bucket join is uniform-hash skew-free. Auto-sizing needs
    the corpus cardinality — pass `n_rows` (e.g. from table metadata /
    `Table.total_records()`) to avoid the count() job re-running an expensive
    corpus lineage just to pick an integer."""
    if n_planes is None:
        n_planes = auto_planes(n_rows if n_rows is not None else corpus.count())
    cb = lsh_buckets(
        corpus, id_col, vec_col, dim, n_planes, n_tables, exact=exact_buckets
    ).withColumnRenamed("id", "neighbor_id")
    qb = lsh_buckets(
        queries, id_col, vec_col, dim, n_planes, n_tables, exact=exact_buckets
    ).withColumnRenamed("id", "query_id")
    if multiprobe:
        probes = F.explode(
            F.expr(
                f"array_union(array(bucket), transform(sequence(0, {n_planes - 1}), "
                f"i -> CAST(bucket ^ shiftleft(1, i) AS INT)))"
            )
        ).alias("probe")
        qb = qb.select("query_id", F.col("v").alias("qv"), "table", probes)
    else:
        qb = qb.select(
            "query_id", F.col("v").alias("qv"), "table", F.col("bucket").alias("probe")
        )
    scored = (
        cb.join(
            F.broadcast(qb),
            (F.col("bucket") == F.col("probe"))
            & (cb["table"] == qb["table"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_ppm", cosine_ppm_expr("qv", "v"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_ppm")
    )


def knn_lsh_sql(
    corpus: str,
    queries_pred: str,
    id_col: str,
    cos_ppm: str,
    dim: int,
    k: int = 5,
    n_planes: int = N_PLANES,
    n_tables: int = 4,
    multiprobe: bool = True,
) -> str:
    """DuckDB oracle twin of :func:`knn_lsh` with `exact_buckets=True`.

    The seeded hyperplanes are embedded as literal DOUBLE lists (shortest
    round-trip repr → both engines hold the identical IEEE754 doubles); each
    plane's sign comes from the same sequential left fold `cosine_ppm_sql`
    uses (`list_reduce` over element order, double precision), so bucket ids
    — and therefore the candidate set, the exact `cos_ppm` re-rank, and the
    final top-k — are bit-identical to the Spark expression path. Multiprobe
    replicates `bucket XOR (1<<i)` per plane. `cos_ppm` is the SQL for
    cosine_ppm over columns qv / cv."""
    rows = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        for p in range(n_planes):
            lits = ", ".join(repr(float(v)) for v in planes[p])
            rows.append(f"({t}, {p}, [{lits}])")
    plane_values = ",\n  ".join(rows)

    def dot(x: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"[CAST({x}[i] AS DOUBLE) * pv[i] "
            f"FOR i IN range(1, len({x}) + 1)]), (acc, v) -> acc + v)"
        )

    probes = (
        "list_prepend(bucket, ["
        + ", ".join(f"xor(bucket, {1 << i})" for i in range(n_planes))
        + "])"
        if multiprobe
        else "[bucket]"
    )
    return f"""
WITH planes(tbl, p, pv) AS (VALUES
  {plane_values}
),
c AS (SELECT {id_col} AS neighbor_id, embedding AS cv FROM {corpus}),
q AS (SELECT {id_col} AS query_id, embedding AS qv FROM {corpus}
      WHERE {queries_pred}),
cb AS (
  SELECT neighbor_id, tbl,
         CAST(SUM(CASE WHEN {dot('cv')} > 0 THEN 1 << p ELSE 0 END) AS INT)
           AS bucket
  FROM c CROSS JOIN planes GROUP BY neighbor_id, tbl
),
qb AS (
  SELECT query_id, tbl,
         CAST(SUM(CASE WHEN {dot('qv')} > 0 THEN 1 << p ELSE 0 END) AS INT)
           AS bucket
  FROM q CROSS JOIN planes GROUP BY query_id, tbl
),
qp AS (
  SELECT query_id, tbl, unnest({probes}) AS probe FROM qb
),
cand AS (
  SELECT DISTINCT qp.query_id, cb.neighbor_id
  FROM cb JOIN qp ON cb.tbl = qp.tbl AND cb.bucket = qp.probe
                 AND qp.query_id <> cb.neighbor_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos_ppm} AS cos_ppm
  FROM cand
  JOIN q ON q.query_id = cand.query_id
  JOIN c ON c.neighbor_id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_ppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_ppm
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------------------ IVF


def sqdist_expr(a: str, b: str) -> F.Column:
    """Squared L2 distance as the same sequential double-precision left fold
    cosine_ppm uses — bit-identical to the DuckDB twin, so distance RANKS
    (and therefore IVF cell assignments) agree across engines exactly."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (p, q) -> "
        f"(CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) * "
        f"(CAST(p AS DOUBLE) - CAST(q AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"FOR i IN range(1, len({a}) + 1)]), (acc, v) -> acc + v)"
    )


def ivf_centroids_by_id(
    df: DataFrame, id_col: str, vec_col: str, n_cells: int
) -> DataFrame:
    """Deterministic IVF codebook: the first `n_cells` corpus vectors by id.
    Structurally a real coarse quantizer (cells + posting lists + nprobe
    search are identical), chosen so the WHOLE index is a pure function of
    the data — which is what lets the DuckDB oracle rebuild it. Production
    swaps in `train_ivf_centroids_kmeans` for better cell balance; every
    downstream step is unchanged."""
    # orderBy+limit plans as TakeOrderedAndProject — a distributed partial
    # top-k, never a global single-task window — then the tiny result gets
    # its dense 0..n_cells-1 ids locally
    picked = (
        df.select(F.col(id_col).alias("cent_src"), F.col(vec_col).alias("cv"))
        .orderBy(F.col("cent_src").asc())
        .limit(n_cells)
        .collect()
    )
    return df.sparkSession.createDataFrame(
        [(int(i), r["cv"]) for i, r in enumerate(picked)], ["cent_id", "cv"]
    )


def _lloyd_kmeans(
    x: "np.ndarray",
    n_cells: int,
    iters: int,
    seed: int,
    budget_bytes: int = 64 << 20,
) -> "np.ndarray":
    """Lloyd's k-means over a driver-side sample. Assignment uses the same
    ‖x‖²−2xCᵀ+‖C‖² BLAS form as the production assign path (`nearest`),
    CHUNKED so peak allocation is O(chunk × cells) under `budget_bytes` —
    never the (N × C × dim) broadcast tensor, which at the module's
    documented scale (65,536-row sample, 3×10⁴ cells, 768-dim) would be
    petabytes. Centroid update is one np.add.at scatter + bincount; empty
    cells keep their previous centroid."""
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    xnorm = (x * x).sum(axis=1)  # (N,)
    chunk = max(1, budget_bytes // (8 * max(1, len(cents))))
    for _ in range(iters):
        cnorm = (cents * cents).sum(axis=1)  # (C,)
        lab = np.empty(len(x), dtype=np.int64)
        for s in range(0, len(x), chunk):
            xs = x[s:s + chunk]
            d = xnorm[s:s + chunk, None] - 2.0 * (xs @ cents.T) + cnorm[None, :]
            lab[s:s + chunk] = d.argmin(axis=1)
        sums = np.zeros_like(cents)
        np.add.at(sums, lab, x)
        counts = np.bincount(lab, minlength=len(cents)).astype(np.float64)
        nz = counts > 0
        cents[nz] = sums[nz] / counts[nz, None]
    return cents


def train_ivf_centroids_kmeans(
    df: DataFrame,
    vec_col: str,
    n_cells: int,
    sample_rows: int = 65536,
    iters: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Production codebook: Lloyd's k-means on a bounded driver-side sample
    (the standard IVF training recipe — FAISS trains on a sample too). The
    sample is O(sample_rows·dim) driver memory regardless of corpus size;
    assignment of the full corpus stays distributed."""
    x = _sample_matrix(df, vec_col, sample_rows, seed)
    cents = _lloyd_kmeans(x, n_cells, iters, seed)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(cents)],
        ["cent_id", "cv"],
    )


def assign_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: DataFrame,
    rank_limit: int = 1,
    out_id: str = "id",
    exact: bool = True,
) -> DataFrame:
    """Nearest-centroid assignment (rank_limit=1) or nprobe probe list
    (rank_limit=nprobe). Two paths, the LSH dual-path pattern:

    - **exact=True**: broadcast codebook cross join + fold-expression squared
      distance + per-vector rank window. Bit-deterministic (= the DuckDB
      oracle twin), but materializes |df|×|codebook| rows through the window
      — right for verification and small codebooks only.
    - **exact=False** (production): one numpy distance computation per Arrow
      batch against the collected codebook matrix (‖x‖²−2x·Cᵀ+‖C‖² via a
      single BLAS matmul), `argpartition` top-rank_limit per vector — ZERO
      extra rows, no shuffle, O(batch × cells) FLOPs inside the task. Right
      for √n-sized codebooks (10^9 vectors → ~3×10⁴ cells ≈ a few MB
      broadcast)."""
    if exact:
        pairs = df.select(
            F.col(id_col).alias(out_id), F.col(vec_col).alias("_v")
        ).join(F.broadcast(centroids))
        w = Window.partitionBy(out_id).orderBy(
            sqdist_expr("_v", "cv").asc(), F.col("cent_id").asc()
        )
        return (
            pairs.withColumn("_crn", F.row_number().over(w))
            .filter(F.col("_crn") <= rank_limit)
            .select(out_id, "_v", "cent_id")
        )

    rows = centroids.orderBy("cent_id").collect()
    cent_ids = np.array([r["cent_id"] for r in rows], dtype=np.int64)
    cmat = np.array([r["cv"] for r in rows], dtype=np.float64)  # (C, dim)
    cnorm = (cmat * cmat).sum(axis=1)  # (C,)
    limit = min(rank_limit, len(cent_ids))

    def nearest(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)  # (batch, dim)
        d = (m * m).sum(axis=1)[:, None] - 2.0 * (m @ cmat.T) + cnorm[None, :]
        if limit == 1:
            picks = d.argmin(axis=1)[:, None]
        else:
            part = np.argpartition(d, limit - 1, axis=1)[:, :limit]
            order = np.take_along_axis(d, part, axis=1).argsort(axis=1)
            picks = np.take_along_axis(part, order, axis=1)
        return pd.Series(list(cent_ids[picks]))

    nearest_udf = pandas_udf(nearest, ArrayType(LongType()))
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("_v"),
            nearest_udf(F.col(vec_col)).alias("_cells"),
        )
        .select(out_id, "_v", F.explode("_cells").alias("cent_id"))
    )


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    centroids: DataFrame | None = None,
    exact_assign: bool = False,
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus vectors live in the posting
    list of their nearest centroid; a query searches only its `nprobe`
    nearest cells, then exact cosine re-ranks the candidates. Output schema
    matches knn_bruteforce/knn_lsh. At 10^9-vector scale the posting-list
    join shuffles on cell id (cells ≈ √n keeps both codebook broadcast and
    cell size balanced); no pairwise work ever leaves the probed cells."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids_by_id(corpus, id_col, vec_col, n_cells)
    )
    cb = (
        assign_cells(corpus, id_col, vec_col, cents, 1,
                     out_id="neighbor_id", exact=exact_assign)
        .withColumnRenamed("_v", "cv")
        .withColumnRenamed("cent_id", "c_cell")
    )
    qb = (
        assign_cells(queries, id_col, vec_col, cents, nprobe,
                     out_id="query_id", exact=exact_assign)
        .withColumnRenamed("_v", "qv")
        .withColumnRenamed("cent_id", "q_cell")
    )
    scored = (
        cb.join(
            F.broadcast(qb),
            (F.col("c_cell") == F.col("q_cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cos_ppm", cosine_ppm_expr("qv", "cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"), "cos_ppm")
    )


def knn_ivf_sql(
    corpus: str,
    queries_pred: str,
    id_col: str,
    cos_ppm: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> str:
    """DuckDB oracle twin of :func:`knn_ivf` with the by-id codebook: the
    oracle rebuilds the identical index (same centroids, same fold-exact
    distance ranks, same probe lists) from the same table."""
    return f"""
WITH c AS (SELECT {id_col} AS id, embedding AS v FROM {corpus}),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY {id_col} ASC) - 1 AS BIGINT)
           AS cent_id,
         embedding AS cv
  FROM {corpus} QUALIFY row_number() OVER (ORDER BY {id_col} ASC) <= {n_cells}
),
assign AS (
  SELECT id, cent_id FROM (
    SELECT c.id, cents.cent_id,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {_sqdist_sql('v', 'cv')} ASC,
                                       cent_id ASC) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
q AS (SELECT {id_col} AS query_id, embedding AS qv FROM {corpus}
      WHERE {queries_pred}),
qprobe AS (
  SELECT query_id, cent_id FROM (
    SELECT q.query_id, cents.cent_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_sqdist_sql('qv', 'cv')} ASC,
                                       cent_id ASC) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT qprobe.query_id, assign.id AS neighbor_id
  FROM qprobe JOIN assign ON assign.cent_id = qprobe.cent_id
  WHERE assign.id <> qprobe.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos_ppm} AS cos_ppm
  FROM cand
  JOIN q ON q.query_id = cand.query_id
  JOIN (SELECT id, v AS cv FROM c) cc ON cc.id = cand.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_ppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_ppm
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------------------------ PQ (IVF-PQ's
# storage half): product quantization — the canonical billion-scale ANN
# memory story. A D-dim float vector becomes m uint8-sized codes (one per
# D/m-dim subspace, each pointing at one of n_codes sub-centroids): 768-dim
# float32 = 3 KB/vector shrinks to m bytes (m=96 → 32×), so 10^9 vectors fit
# the aggregate RAM of a modest cluster. Search is ADC (asymmetric distance
# computation): the query stays uncompressed, each candidate's distance is m
# table lookups. Compose with knn_ivf for sublinear scan (probe cells →
# ADC-scan their posting lists → exact re-rank of the short list).


def _sample_matrix(
    df: DataFrame, vec_col: str, sample_rows: int, seed: int
) -> "np.ndarray":
    """Bounded driver-side training sample shared by both trainers:
    O(sample_rows·dim) driver memory regardless of corpus size."""
    n = df.count()
    frac = min(1.0, sample_rows / max(1, n))
    rows = (
        df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_rows)
    ).collect()
    return np.array([r[0] for r in rows], dtype=np.float64)


def _codebook_tensor(codebooks: DataFrame):
    """Collect a PQ codebook DataFrame into the dense lookup form every
    production path uses: (tensor (m, K, d), tnorm (m, K), m, K, d)."""
    rows = codebooks.orderBy("s", "code_id").collect()
    m = 1 + max(r["s"] for r in rows)
    K = 1 + max(r["code_id"] for r in rows)
    d = len(rows[0]["cv_sub"])
    tensor = np.zeros((m, K, d), dtype=np.float64)
    for r in rows:
        tensor[r["s"], r["code_id"]] = r["cv_sub"]
    return tensor, (tensor * tensor).sum(axis=2), m, K, d


def pq_codebooks_by_id(
    df: DataFrame, id_col: str, vec_col: str, m: int, n_codes: int
) -> DataFrame:
    """Deterministic PQ codebooks: the first `n_codes` corpus vectors by id,
    sliced into `m` subspaces — columns (s, code_id, cv_sub). Structurally a
    real product quantizer (codes, reconstruction, and ADC search are
    identical); chosen so the WHOLE index is a pure function of the data,
    which is what lets the DuckDB oracle rebuild it (the same trick as
    ivf_centroids_by_id). Production swaps in `train_pq_codebooks`."""
    spark = df.sparkSession
    picked = (
        df.select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v"))
        .orderBy("_i")
        .limit(n_codes)
        .collect()
    )
    dim = len(picked[0]["_v"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    rows = [
        (s, code, [float(x) for x in r["_v"][s * d:(s + 1) * d]])
        for code, r in enumerate(picked)
        for s in range(m)
    ]
    return spark.createDataFrame(rows, ["s", "code_id", "cv_sub"])


def train_pq_codebooks(
    df: DataFrame, vec_col: str, m: int, n_codes: int,
    sample_rows: int = 65536, iters: int = 10, seed: int = 7,
) -> DataFrame:
    """Production PQ codebooks: per-subspace Lloyd k-means on a bounded
    driver-side sample (the standard recipe — FAISS trains PQ on a sample
    too). Reuses the memory-bounded chunked-matmul trainer; O(sample·dim)
    driver memory regardless of corpus size."""
    x = _sample_matrix(df, vec_col, sample_rows, seed)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    spark = df.sparkSession
    out = []
    for s in range(m):
        cents = _lloyd_kmeans(x[:, s * d:(s + 1) * d], n_codes, iters,
                              seed + s)
        out.extend(
            (s, int(c), [float(v) for v in cents[c]])
            for c in range(len(cents))
        )
    return spark.createDataFrame(out, ["s", "code_id", "cv_sub"])


def pq_encode(
    df: DataFrame, id_col: str, vec_col: str, codebooks: DataFrame,
    exact: bool = False,
) -> DataFrame:
    """Vector → m-code assignment, columns (id, codes array<long>) with
    codes[s] = argmin over the subspace-s codebook of squared distance.
    (Codes are conceptually uint8 — n_codes ≤ 256; stored as long here for
    cross-engine hash parity.) Two paths, the assign_cells pattern:

    - exact=True: one broadcast join against all (s, code) rows + the
      fold-expression squared distance on the sliced subvector + an
      argmin window per (id, s) — bit-deterministic, the oracle twin.
    - exact=False (production): per Arrow batch, one (m·K·d) codebook
      tensor lookup — reshape to (batch, m, d), one matmul per subspace,
      argmin — ZERO extra rows, no shuffle."""
    tensor, tnorm, m, K, d = _codebook_tensor(codebooks)
    if exact:
        pairs = df.select(
            F.col(id_col).alias("_i"), F.col(vec_col).alias("_v")
        ).join(F.broadcast(codebooks))
        sub = "slice(_v, s * {d} + 1, {d})".format(d=d)
        dist = F.expr(
            f"aggregate(zip_with({sub}, cv_sub, (p, q) -> "
            f"(CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) * "
            f"(CAST(p AS DOUBLE) - CAST(q AS DOUBLE))), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        w = Window.partitionBy("_i", "s").orderBy(
            dist.asc(), F.col("code_id").asc()
        )
        return (
            pairs.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .groupBy("_i")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(s, code_id)))"
                    ", x -> CAST(x.code_id AS LONG))"
                ).alias("codes")
            )
            .select(F.col("_i").alias(id_col), "codes")
        )

    def encode(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)  # (b, D)
        b = x.shape[0]
        xs = x.reshape(b, m, d)  # (b, m, s-dim)
        # ||x_s - c||² = ||x_s||² - 2 x_s·cᵀ + ||c||², argmin over codes
        dots = np.einsum("bmd,mkd->bmk", xs, tensor)
        dist = -2.0 * dots + tnorm[None, :, :]  # ||x_s||² constant in argmin
        codes = dist.argmin(axis=2)  # (b, m)
        return pd.Series(list(codes.astype(np.int64)))

    enc = pandas_udf(encode, ArrayType(LongType()))
    return df.select(
        F.col(id_col).alias(id_col), enc(F.col(vec_col)).alias("codes")
    )


def pq_reconstruct(codes: DataFrame, id_col: str,
                   codebooks: DataFrame) -> DataFrame:
    """Codes → approximate vector: concat of the chosen sub-centroids in
    subspace order — columns (id, rv). The reconstructed vector makes the
    ADC distance expressible as ONE sequential fold over the full dimension
    (sqdist(q, rv) ≡ Σ_s sqdist(q_s, c_s)), which is the bit-identical
    cross-engine form the oracle needs."""
    return (
        codes.select(
            id_col, F.posexplode("codes").alias("s", "code_id")
        )
        .join(F.broadcast(codebooks), ["s", "code_id"])
        .groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list("
                "struct(s, cv_sub))), x -> x.cv_sub))"
            ).alias("rv")
        )
    )


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    codebooks: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """Approximate top-k via product quantization: corpus vectors stored as
    m codes, queries uncompressed, candidates ranked by the asymmetric
    (query-to-reconstruction) squared distance — ascending, id tiebreak.
    Output (query_id, neighbor_id, rank, adist_ppm).

    exact=True ranks by the fold-expression distance on reconstructed
    vectors (oracle twin); exact=False is the production ADC scan — per
    Arrow batch of codes, each candidate costs m table lookups into the
    per-query (m × K) distance tables (built once per task from the
    broadcast queries + codebook tensor), never a D-dim computation. At
    10^9 vectors compose with knn_ivf: probe cells, ADC-scan only their
    posting lists, exact-rerank the short list."""
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks_by_id(corpus, id_col, vec_col, m, n_codes)
    )
    codes = pq_encode(corpus, id_col, vec_col, cb, exact=exact)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    if exact:
        recon = pq_reconstruct(codes, id_col, cb).withColumnRenamed(
            id_col, "neighbor_id"
        )
        scored = recon.join(
            F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
        ).withColumn("_ad", sqdist_expr("qv", "rv"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("_ad").asc(), F.col("neighbor_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                "query_id", "neighbor_id", F.col("rank").cast("long"),
                F.floor(F.col("_ad") * 1e6).cast("long").alias("adist_ppm"),
            )
        )

    tensor, tnorm, mm, K, d = _codebook_tensor(cb)
    qrows = q.collect()  # queries are the small side by contract
    qids = [r["query_id"] for r in qrows]
    qmat = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    nq = len(qids)
    # per-query ADC tables: tables[qi, s, code] = ||q_s - c||²
    qs = qmat.reshape(nq, mm, d)
    tables = (
        (qs * qs).sum(axis=2)[:, :, None]
        - 2.0 * np.einsum("qmd,mkd->qmk", qs, tensor)
        + tnorm[None, :, :]
    )

    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = (f"query_id {id_type}, neighbor_id {id_type}, "
                  "adist double")

    def scan(batches):
        for b in batches:
            ids = b[id_col]
            cmat = np.stack(b["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # dist[qi, i] = Σ_s tables[qi, s, codes[i, s]]
            dist = tables[:, np.arange(mm)[None, :], cmat].sum(axis=2)
            take = min(k + 1, dist.shape[1])
            rows_out = []
            for qi in range(nq):
                # tie-aware cutoff: keep EVERY candidate at or below the
                # take-th smallest distance, so a boundary tie can never
                # drop the lower-id winner before the global window's
                # deterministic (adist, id) ordering sees it
                kth = np.partition(dist[qi], take - 1)[take - 1]
                for j in np.nonzero(dist[qi] <= kth)[0]:
                    if ids.iloc[j] == qids[qi]:
                        continue
                    rows_out.append(
                        {"query_id": qids[qi],
                         "neighbor_id": ids.iloc[j],
                         "adist": float(dist[qi, j])}
                    )
            yield pd.DataFrame(rows_out,
                               columns=["query_id", "neighbor_id", "adist"])

    cand = codes.mapInPandas(scan, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long"),
            F.floor(F.col("adist") * 1e6).cast("long").alias("adist_ppm"),
        )
    )


def _pq_recon_ctes(m: int, n_codes: int, dim: int) -> str:
    """Shared oracle CTE block (assumes a prior ``c(id, v)`` CTE): by-id
    sub-codebooks → fold-exact code assignment → reconstructed vectors.
    One source of truth for knn_pq_sql AND knn_ivfpq_sql — an oracle fix
    applied to one can't silently desynchronize the other gate row."""
    d = dim // m
    sub_v = f"c.v[cb.s*{d}+1 : cb.s*{d}+{d}]"
    return f"""picked AS (
  SELECT v, CAST(row_number() OVER (ORDER BY id ASC) - 1 AS BIGINT)
           AS code_id
  FROM c QUALIFY row_number() OVER (ORDER BY id ASC) <= {n_codes}
),
cb AS (
  SELECT s, code_id, v[s*{d}+1 : s*{d}+{d}] AS cv_sub
  FROM picked, (SELECT unnest(range({m})) AS s)
),
codes AS (
  SELECT id, s, code_id FROM (
    SELECT c.id, cb.s, cb.code_id,
           row_number() OVER (PARTITION BY c.id, cb.s
                              ORDER BY {_sqdist_sql(sub_v, 'cb.cv_sub')} ASC,
                                       cb.code_id ASC) AS rn
    FROM c CROSS JOIN cb
  ) WHERE rn = 1
),
recon AS (
  SELECT codes.id, flatten(list(cb.cv_sub ORDER BY cb.s)) AS rv
  FROM codes JOIN cb ON cb.s = codes.s AND cb.code_id = codes.code_id
  GROUP BY codes.id
)"""


def _adist_rank_sql(k: int) -> str:
    """Shared final ranking block (assumes a prior ``scored(query_id,
    neighbor_id, ad)`` CTE): (adist ASC, id ASC) top-k + floor-ppm."""
    return f"""ranked AS (
  SELECT query_id, neighbor_id, ad,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ad ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
       CAST(floor(ad * 1e6) AS BIGINT) AS adist_ppm
FROM ranked WHERE rank <= {k}"""


def knn_pq_sql(
    corpus: str,
    queries_pred: str,
    id_col: str,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB oracle twin of :func:`knn_pq` with the by-id codebooks: the
    oracle rebuilds the identical quantizer (same sub-centroids, same
    fold-exact code assignments), reconstructs each candidate, and ranks by
    the same full-dimension sequential fold — bit-identical doubles, so
    ranks AND floor-ppm distances match exactly."""
    return f"""
WITH c AS (SELECT {id_col} AS id, embedding AS v FROM {corpus}),
{_pq_recon_ctes(m, n_codes, dim)},
q AS (SELECT {id_col} AS query_id, embedding AS qv FROM {corpus}
      WHERE {queries_pred}),
scored AS (
  SELECT q.query_id, recon.id AS neighbor_id,
         {_sqdist_sql('q.qv', 'recon.rv')} AS ad
  FROM q CROSS JOIN recon
  WHERE recon.id <> q.query_id
),
{_adist_rank_sql(k)}
"""


def knn_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """IVF-PQ — the canonical billion-scale index (FAISS IndexIVFPQ):
    corpus vectors live in the posting list of their nearest coarse cell
    AND are stored as m PQ codes; a query probes its `nprobe` nearest
    cells and ADC-scores only those posting lists. At 10^9 vectors the scan
    touches nprobe/n_cells of the corpus and each candidate costs m table
    lookups on an m-byte code — sublinear work over compressed storage.
    Output matches knn_pq: (query_id, neighbor_id, rank, adist_ppm),
    ranked by asymmetric (query-to-reconstruction) squared distance.

    exact=True is the fold-deterministic oracle twin (by-id coarse
    centroids + by-id sub-codebooks make the WHOLE index a pure function of
    the table); exact=False is the production path (numpy cell assign +
    numpy codes + per-task ADC tables)."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids_by_id(corpus, id_col, vec_col, n_cells)
    )
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks_by_id(corpus, id_col, vec_col, m, n_codes)
    )
    posting = (
        assign_cells(corpus, id_col, vec_col, cents, 1,
                     out_id="neighbor_id", exact=exact)
        .select("neighbor_id", F.col("cent_id").alias("c_cell"))
        .join(
            pq_encode(corpus, id_col, vec_col, cb, exact=exact)
            .withColumnRenamed(id_col, "neighbor_id"),
            "neighbor_id",
        )
    )
    # candidate rows carry (query_id, neighbor_id, codes) — NEVER the query
    # vector: at 768-dim a per-candidate qv is ~6 KB of join/shuffle width
    # and forces D-dim FLOPs per candidate, exactly the constant IVF-PQ
    # exists to eliminate. The exact oracle twin joins qv back on the
    # (tiny, broadcast) query side only for its fold expression.
    qprobe = assign_cells(
        queries, id_col, vec_col, cents, nprobe,
        out_id="query_id", exact=exact,
    ).select("query_id", F.col("cent_id").alias("q_cell"))
    cand = (
        posting.join(
            F.broadcast(qprobe),
            (F.col("c_cell") == F.col("q_cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", "codes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_ad").asc(), F.col("neighbor_id").asc()
    )
    if exact:
        recon = pq_reconstruct(
            cand.select(F.col("neighbor_id").alias("_cid"), "codes")
            .dropDuplicates(["_cid"]),
            "_cid", cb,
        )
        qv = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
        scored = (
            cand.join(recon, cand["neighbor_id"] == recon["_cid"])
            .join(F.broadcast(qv), "query_id")
            .withColumn("_ad", sqdist_expr("qv", "rv"))
        )
    else:
        tensor, tnorm, mm, K, d = _codebook_tensor(cb)
        # per-query ADC tables (nq × m × K doubles), built ONCE driver-side
        # from the small-by-contract query set and shipped in the UDF
        # closure — each candidate then costs m table gathers on its m-byte
        # code, independent of D (the knn_pq pattern).
        qrows = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).collect()
        qids = [r["query_id"] for r in qrows]
        qs = np.stack(
            [np.asarray(r["qv"], dtype=np.float64) for r in qrows]
        ).reshape(len(qids), mm, d)
        tables = (
            (qs * qs).sum(axis=2)[:, :, None]
            - 2.0 * np.einsum("qmd,mkd->qmk", qs, tensor)
            + tnorm[None, :, :]
        )
        qindex = {qid: i for i, qid in enumerate(qids)}

        def adc(query_ids: pd.Series, codes: pd.Series) -> pd.Series:
            if len(query_ids) == 0:
                return pd.Series([], dtype=np.float64)
            qi = query_ids.map(qindex).to_numpy(dtype=np.int64)
            cm = np.stack(codes.to_numpy()).astype(np.int64)  # (n, m)
            dist = tables[qi[:, None], np.arange(mm)[None, :], cm].sum(axis=1)
            return pd.Series(dist)

        adc_udf = pandas_udf(adc, "double")
        scored = cand.withColumn("_ad", adc_udf(F.col("query_id"),
                                                F.col("codes")))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.col("rank").cast("long"),
            F.floor(F.col("_ad") * 1e6).cast("long").alias("adist_ppm"),
        )
    )


def knn_ivfpq_sql(
    corpus: str,
    queries_pred: str,
    id_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
) -> str:
    """DuckDB oracle twin of :func:`knn_ivfpq`: the by-id coarse centroids
    + by-id sub-codebooks rebuild the identical index; candidates are the
    probed cells' posting lists; ranking is the same reconstructed-vector
    fold as knn_pq_sql — ranks and floor-ppm distances bit-exact."""
    return f"""
WITH c AS (SELECT {id_col} AS id, embedding AS v FROM {corpus}),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY id ASC) - 1 AS BIGINT) AS cent_id,
         v AS cv
  FROM c QUALIFY row_number() OVER (ORDER BY id ASC) <= {n_cells}
),
assign AS (
  SELECT id, cent_id FROM (
    SELECT c.id, cents.cent_id,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {_sqdist_sql('c.v', 'cents.cv')} ASC,
                                       cent_id ASC) AS rn
    FROM c CROSS JOIN cents
  ) WHERE rn = 1
),
{_pq_recon_ctes(m, n_codes, dim)},
q AS (SELECT {id_col} AS query_id, embedding AS qv FROM {corpus}
      WHERE {queries_pred}),
qprobe AS (
  SELECT query_id, cent_id FROM (
    SELECT q.query_id, cents.cent_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_sqdist_sql('q.qv', 'cents.cv')} ASC,
                                       cent_id ASC) AS rn
    FROM q CROSS JOIN cents
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT DISTINCT qprobe.query_id, assign.id AS neighbor_id
  FROM qprobe JOIN assign ON assign.cent_id = qprobe.cent_id
  WHERE assign.id <> qprobe.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_sqdist_sql('q.qv', 'recon.rv')} AS ad
  FROM cand
  JOIN q ON q.query_id = cand.query_id
  JOIN recon ON recon.id = cand.neighbor_id
),
{_adist_rank_sql(k)}
"""


# --------------------------------------------------------------- SQ8
# Scalar quantization (FAISS ScalarQuantizer QT_8bit shape): the rung of
# the vector-memory ladder between fp32 and PQ — 768-dim float32 costs
# 3 KB/vector; SQ8 stores 768 one-byte codes + one float64 scale (~4x),
# loses far less recall than PQ, and needs no trained codebook. Search
# is asymmetric (FAISS convention): the query stays fp32 and corpus
# vectors are dequantized per candidate, so quantization error enters
# each distance once, not twice.
#
# Exactness contract (what lets the DuckDB oracle reproduce every code
# and every rank): amax is a greatest() fold (order-insensitive, exact),
# scale = amax/127 in float64, each code is
# least(127, greatest(-127, floor(v/scale + 0.5))) — floor(x + 0.5) is
# the ONE rounding both engines spell identically (SQL round() is
# half-away in Spark but banker's in some engines; floor is floor
# everywhere) — and ranking runs the same sequential-fold cosine as
# every other exact twin in this module.


def sq8_encode(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, codes array<tinyint>, scale double): symmetric per-vector
    8-bit scalar quantization. A zero vector encodes as all-zero codes
    with scale 0 (dequantizes to itself)."""
    amax = (
        f"aggregate({vec_col}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
    )
    codes = (
        f"transform({vec_col}, x -> CAST(CASE WHEN _scale = 0.0 THEN 0.0 "
        f"ELSE least(CAST(127.0 AS DOUBLE), greatest(CAST(-127.0 AS DOUBLE), "
        f"floor(CAST(x AS DOUBLE) / _scale + 0.5))) END AS TINYINT))"
    )
    return (
        df.withColumn("_scale", F.expr(f"{amax} / 127.0"))
        .select(
            F.col(id_col).alias("id"),
            F.expr(codes).alias("codes"),
            F.col("_scale").alias("scale"),
        )
    )


def sq8_encode_sql(corpus: str, id_col: str, vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`sq8_encode` (a relation, for CTE reuse)."""
    amax = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"[abs(CAST({vec_col}[i] AS DOUBLE)) "
        f"FOR i IN range(1, len({vec_col}) + 1)]), "
        f"(acc, v) -> greatest(acc, v))"
    )
    return f"""
SELECT id, CASE WHEN scale = 0.0
            THEN [CAST(0 AS TINYINT) FOR _x IN v]
            ELSE [CAST(least(CAST(127.0 AS DOUBLE),
                             greatest(CAST(-127.0 AS DOUBLE),
                                      floor(CAST(_x AS DOUBLE) / scale + 0.5)))
                       AS TINYINT) FOR _x IN v]
       END AS codes, scale
FROM (SELECT {id_col} AS id, {vec_col} AS v, {amax} / 127.0 AS scale
      FROM {corpus})"""


def knn_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Asymmetric top-k over the SQ8-compressed corpus: fp32 queries
    against dequantized (codes × scale) corpus vectors, same output
    shape and determinism as :func:`knn_bruteforce` (rank 1..k, ties on
    neighbor id). The scan reads 1 byte/dim instead of 4 — on a
    bandwidth-bound brute scan that IS the speedup — and the whole plan
    is JVM codegen (folds over the dequantized array), broadcast query
    side, one window keyed by query."""
    enc = sq8_encode(corpus, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.expr(
            "transform(codes, c -> CAST(c AS DOUBLE) * scale)"
        ).alias("rv"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        enc.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_ppm", cosine_ppm_expr("qv", "rv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("long"),
                "cos_ppm")
    )


def knn_sq8_sql(
    corpus: str,
    queries_pred: str,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 5,
) -> str:
    """DuckDB oracle twin of :func:`knn_sq8` — re-encodes the corpus
    with the identical quantizer and ranks by the identical fold."""
    from olake_spark.operators.dedup import cosine_ppm_sql

    return f"""
WITH enc AS ({sq8_encode_sql(corpus, id_col, vec_col)}),
recon AS (
  SELECT id AS neighbor_id,
         [CAST(c AS DOUBLE) * scale FOR c IN codes] AS rv
  FROM enc
),
q AS (SELECT {id_col} AS query_id, {vec_col} AS qv FROM {corpus}
      WHERE {queries_pred}),
scored AS (
  SELECT query_id, neighbor_id, {cosine_ppm_sql('qv', 'rv')} AS cos_ppm
  FROM recon JOIN q ON query_id <> neighbor_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_ppm,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_ppm DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_ppm
FROM ranked WHERE rank <= {k}
"""
