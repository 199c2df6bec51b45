"""Randomized multi-batch MERGE fuzz: arbitrary interleavings of c/u/d events
across several sequential merge batches must end in exactly the state the
sequentially-applied oracle predicts (the A1 rule per batch, write-order
across batches — the reference's equality-delete semantics)."""

import os
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

from olake_spark.icelite import Table
from olake_spark.operators.merge import apply_changes_oracle, merge_into
from olake_spark.verify import row_sets_equal

SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)
CH_SCHEMA = StructType(
    SCHEMA.fields
    + [
        StructField("_op_type", StringType(), False),
        StructField("_cdc_timestamp", TimestampType(), False),
    ]
)

KEYS = [f"k{i:03d}" for i in range(30)]


def _random_batch(rng: random.Random, batch_idx: int, size: int):
    import datetime as dt

    rows = []
    for j in range(size):
        key = rng.choice(KEYS)
        op = rng.choice(["c", "u", "d", "r"])
        # timestamps deliberately collide sometimes → op-priority ties
        ts = dt.datetime(2026, 1, 1) + dt.timedelta(
            seconds=batch_idx * 1000 + rng.randrange(0, 50)
        )
        if op == "d":
            rows.append((key, None, None, "d", ts))
        else:
            rows.append((key, f"cap-{batch_idx}-{j}", rng.randrange(0, 10**6), op, ts))
    return rows


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_sequential_merges_match_sequential_oracle(spark, tmp_table_dir, seed):
    rng = random.Random(seed)
    t = Table.create(
        spark, os.path.join(tmp_table_dir, f"fuzz{seed}"), SCHEMA,
        identifier_fields=("image_id",),
    )
    base = [(k, f"base-{k}", i) for i, k in enumerate(KEYS[:20])]
    t.append(spark.createDataFrame(base, SCHEMA))

    expected = spark.createDataFrame(base, SCHEMA)
    for b in range(4):
        batch = spark.createDataFrame(
            _random_batch(rng, b, rng.randrange(5, 25)), CH_SCHEMA
        )
        merge_into(t, batch)
        expected = apply_changes_oracle(expected, batch, ["image_id"])

    got = t.scan()
    assert row_sets_equal(expected, got), (
        f"seed {seed}: merge diverged from oracle"
    )
    # identifier uniqueness invariant survives arbitrary op soup
    assert got.count() == got.select(F.countDistinct("image_id")).collect()[0][0]
