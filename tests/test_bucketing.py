"""Aspect-ratio bucketing + batch packing (operators/bucketing.py).

Covers: grid generation properties, known/symmetric assignments, the
NULL/non-positive-dimension contract, exact Spark ≡ DuckDB equality on a
varied-aspect corpus derived from the documents fixture, batch-shape
properties (homogeneous shapes, contiguous slots, one short tail per
(bucket, shard)), and the scale-plan pins (assignment is map-only — no
exchange, no join; packing shuffles once, keyed by its window
partition)."""

import os

import duckdb
import pytest

from olake_spark.operators.bucketing import (
    aspect_bucket_grid,
    assign_aspect_buckets,
    assign_aspect_buckets_sql,
    pack_batches,
    pack_batches_sql,
)

SF = os.environ.get("OLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")
PPM = 1_000_000


def _dims_sql(div: str) -> str:
    """Varied-aspect (w, h) derived from documents — identical text on
    both engines except the integer-division token. doc_id%97 plants
    NULL widths, %89 plants zero heights (the unassignable rows)."""
    return (
        "SELECT doc_id, "
        "CAST(CASE WHEN doc_id % 97 = 0 THEN NULL "
        "ELSE 32 * (1 + doc_id % 40) END AS INT) AS w, "
        f"CAST(CASE WHEN doc_id % 89 = 0 THEN 0 "
        f"ELSE 32 * (1 + (doc_id {div} 7) % 40) END AS INT) AS h "
        "FROM documents"
    )


@pytest.fixture(scope="module")
def dims(spark):
    spark.read.parquet(os.path.join(SF, "documents.parquet")) \
        .createOrReplaceTempView("documents")
    return spark.sql(_dims_sql("div"))


# ------------------------------------------------------------------ grid


def test_grid_properties():
    grid = aspect_bucket_grid(512 * 512, 64, 256, 1024)
    assert grid == sorted(set(grid))
    for w, h in grid:
        assert w % 64 == 0 and h % 64 == 0
        assert 256 <= w <= 1024 and 256 <= h <= 1024
        assert w * h <= 512 * 512
        assert (h, w) in set(grid)  # portrait/landscape symmetric
    assert (512, 512) in grid  # the square budget bucket always exists
    # maximality: growing any bucket's height by one step breaks a bound
    gs = set(grid)
    for w, h in grid:
        assert w * (h + 64) > 512 * 512 or h + 64 > 1024 or (w, h + 64) in gs


def test_grid_validation():
    with pytest.raises(ValueError, match="multiple"):
        aspect_bucket_grid(512 * 512, 64, min_side=100)
    with pytest.raises(ValueError, match="no bucket"):
        aspect_bucket_grid(max_pixels=64 * 64, step=64, min_side=256)


# ------------------------------------------------------------ assignment


def test_known_assignments(spark):
    grid = aspect_bucket_grid()
    df = spark.createDataFrame(
        [(1, 512, 512), (2, 1920, 1080), (3, 1080, 1920), (4, 10000, 100),
         (5, None, 100), (6, 100, 0)],
        "id long, w int, h int",
    )
    got = {
        r["id"]: (r["bucket_w"], r["bucket_h"], r["aspect_ppm"])
        for r in assign_aspect_buckets(df, grid).collect()
    }
    assert got[1] == (512, 512, PPM)  # exact square
    # 16:9 → the closest landscape bucket; transpose gets its mirror
    bw, bh, _ = got[2]
    assert (bw, bh) == (got[3][1], got[3][0])
    assert bw > bh
    # extreme banner clamps to the widest bucket in the grid
    assert (got[4][0], got[4][1]) == (1024, 256)
    # NULL / non-positive dims are unassignable, not mis-assigned
    assert got[5] == (None, None, None)
    assert got[6] == (None, None, None)


def test_assignment_is_true_argmin(spark):
    """Brute-force the argmin in python for every corpus row."""
    grid = aspect_bucket_grid()
    rows = [(i, 32 * (1 + i % 40), 32 * (1 + (i // 7) % 40))
            for i in range(1, 300)]
    df = spark.createDataFrame(rows, "id long, w int, h int")
    got = {r["id"]: (r["bucket_w"], r["bucket_h"], r["closeness_ppm"])
           for r in assign_aspect_buckets(df, grid).collect()}
    for i, w, h in rows:
        ap = w * PPM // h
        best = min(
            ((max(ap, bw * PPM // bh) * PPM // min(ap, bw * PPM // bh),
              bw, bh) for bw, bh in grid)
        )
        assert got[i] == (best[1], best[2], best[0]), (i, w, h)


# ---------------------------------------------------------------- oracle


def test_assign_and_pack_match_duckdb(spark, dims):
    grid = aspect_bucket_grid()
    got = (
        pack_batches(assign_aspect_buckets(dims, grid), "doc_id", 16,
                     n_shards=4)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(SF, 'documents.parquet')}')"
    )
    osql = pack_batches_sql(
        "(" + assign_aspect_buckets_sql(
            "(" + _dims_sql("//") + ")", grid, id_col="doc_id") + ")",
        "doc_id", 16, n_shards=4,
    )
    want = con.execute(osql).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(got.columns):
        assert (got[c].fillna(-1) == want[c].fillna(-1)).all(), c


def test_null_dims_rows_survive_assign_and_drop_at_pack(spark, dims):
    grid = aspect_bucket_grid()
    assigned = assign_aspect_buckets(dims, grid)
    n_all = assigned.count()
    n_null = assigned.filter("bucket_w IS NULL").count()
    assert n_null > 0  # the fixture plants unassignable rows
    packed = pack_batches(assigned, "doc_id", 16, n_shards=4)
    assert packed.count() == n_all - n_null
    assert packed.filter("bucket_w IS NULL").count() == 0


# ------------------------------------------------------- batch semantics


def test_batches_are_shape_homogeneous_and_contiguous(spark, dims):
    grid = aspect_bucket_grid()
    packed = pack_batches(assign_aspect_buckets(dims, grid), "doc_id", 16,
                          n_shards=4).toPandas()
    groups = packed.groupby(["bucket_w", "bucket_h", "shard"])
    for (bw, bh, shard), g in groups:
        g = g.sort_values("doc_id").reset_index(drop=True)
        # positions are the dense 0..n-1 sequence in ascending-id order
        pos = (g["batch_idx"] * 16 + g["slot"]).to_list()
        assert pos == list(range(len(g)))
        # every batch except (at most) the tail is exactly batch_size
        sizes = g.groupby("batch_idx").size()
        assert (sizes.iloc[:-1] == 16).all()
        assert sizes.iloc[-1] <= 16


def test_pack_batches_validation(spark, dims):
    with pytest.raises(ValueError, match="positive"):
        pack_batches(assign_aspect_buckets(dims, aspect_bucket_grid()),
                     "doc_id", 0)


def test_hot_bucket_splits_across_shards(spark):
    """The web-corpus reality: ~80% of images land in one near-square
    bucket. The md5 shard must split that hot bucket into n_shards
    independent window partitions of ~equal size — no task sorts the
    whole bucket."""
    n, hot = 4000, 0.8
    rows = [(i, 512, 512) if i < n * hot else (i, 1024, 256)
            for i in range(n)]
    df = spark.createDataFrame(rows, "id long, w int, h int")
    packed = pack_batches(
        assign_aspect_buckets(df, aspect_bucket_grid()), "id", 16,
        n_shards=8,
    ).toPandas()
    hot_g = packed[packed.bucket_w == 512]
    assert len(hot_g) == n * hot
    sizes = hot_g.groupby("shard").size()
    assert len(sizes) == 8
    # md5 spreads uniformly: every shard within 25% of the mean
    mean = len(hot_g) / 8
    assert (sizes > mean * 0.75).all() and (sizes < mean * 1.25).all()
    # batches are full inside every shard except one tail each
    short = hot_g.groupby(["shard", "batch_idx"]).size()
    assert (short == 16).sum() >= len(short) - 8


# ------------------------------------------------------------- plan pins


def test_assign_plan_is_map_only(spark, dims):
    """The grid rides the plan as a literal — assignment must add NO
    exchange, NO join, and NO Python eval (pure Catalyst)."""
    plan = assign_aspect_buckets(
        dims, aspect_bucket_grid()
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_pack_plan_single_exchange_on_window_key(spark, dims):
    """Packing shuffles ONCE, keyed exactly by the (bucket, shard)
    window partition — no global (empty-key) window."""
    plan = pack_batches(
        assign_aspect_buckets(dims, aspect_bucket_grid()), "doc_id", 16,
        n_shards=4,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan
