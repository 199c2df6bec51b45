"""Per-file Bloom index: build, prune, correctness (icelite/bloom.py).

The layout under test is the adversarial one the module exists for: every
data file spans the whole image_id key space (round-robin slices, the shape
a Hilbert-clustered table has), so manifest min/max pruning keeps every
file and only the Bloom index can shrink a point lookup.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from olake_spark.icelite.bloom import (
    bloom_file_filter,
    build_bloom_index,
    point_lookup,
)
from olake_spark.icelite.table import DATA, Table

SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("w", IntegerType(), True),
        StructField("phash", LongType(), True),
        StructField("caption", StringType(), True),
    ]
)

N = 600
SLICES = 6


def _rows(spark):
    return spark.range(N).select(
        F.format_string("img-%06d", F.col("id")).alias("image_id"),
        (F.col("id") % 64).cast("int").alias("w"),
        (F.col("id") * 7919).alias("phash"),
        F.concat(F.lit("caption "), F.col("id")).alias("caption"),
    )


@pytest.fixture()
def table(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "imgs"),
        SCHEMA,
        identifier_fields=("image_id",),
    )
    rows = _rows(spark)
    # each slice covers the full id range -> per-file min/max ~ whole space
    for r in range(SLICES):
        t.append(rows.filter(F.col("phash") % SLICES == r).coalesce(1))
    return t


def _data_files(t):
    return {e.file_path for e in t.entries() if e.content == DATA}


def test_build_registers_and_prunes(table):
    idx = build_bloom_index(table, "image_id")
    files = _data_files(table)
    assert idx["n_files"] == len(files) == SLICES
    # min/max pruning really is powerless on this layout
    unpruned = table.scan(predicates=[("image_id", "==", "img-000123")])
    assert unpruned.count() == 1
    # bloom pruning: one present key -> its one owning file (± rare fp)
    ff = bloom_file_filter(table, "image_id", ["img-000123"])
    assert ff is not None and ff <= files
    assert len(ff) <= 2  # fpp=1%, 6 files: >1 extra file is a regression


def test_no_false_negatives_over_every_key(table, spark):
    build_bloom_index(table, "image_id")
    # owner file of each key, from the ground truth scan
    truth = {
        r["image_id"]: r["_input_file"]
        for r in table.scan(columns=["image_id"], with_input_file=True).collect()
    }
    assert len(truth) == N
    all_ids = sorted(truth)
    # batched probes: every key's candidate set must include its owner file
    abs_by_key = {
        os.path.abspath(os.path.join(table.root, e.file_path)): e.file_path
        for e in table.entries()
        if e.content == DATA
    }
    for i in range(0, N, 100):
        batch = all_ids[i : i + 100]
        ff = bloom_file_filter(table, "image_id", batch)
        kept_abs = {os.path.abspath(os.path.join(table.root, p)) for p in ff}
        for key in batch:
            assert os.path.abspath(truth[key]) in kept_abs
    # and the point lookup returns exactly the right rows
    got = point_lookup(
        table, "image_id", ["img-000000", "img-000599", "img-000300"]
    )
    assert sorted(r["image_id"] for r in got.collect()) == [
        "img-000000",
        "img-000300",
        "img-000599",
    ]


def test_absent_keys_prune_everything(table):
    build_bloom_index(table, "image_id")
    ff = bloom_file_filter(
        table, "image_id", [f"missing-{i:04d}" for i in range(20)]
    )
    # 20 absent probes x 6 files at fpp=1%: expected ~1 false-positive file
    assert len(ff) <= 3
    assert point_lookup(table, "image_id", ["missing-0001"]).count() == 0


def test_post_build_appends_always_kept(table, spark):
    before = _data_files(table)
    build_bloom_index(table, "image_id")
    extra = spark.createDataFrame(
        [("img-900001", 8, 1, "late")], SCHEMA
    )
    table.append(extra)
    appended = _data_files(table) - before
    assert len(appended) == 1
    ff = bloom_file_filter(table, "image_id", ["img-900001"])
    # the uncovered new file must be in the candidate set even though no
    # bitmap admits the key
    assert appended <= ff
    assert point_lookup(table, "image_id", ["img-900001"]).count() == 1
    # an old key still resolves too (its file is covered and admitted)
    assert point_lookup(table, "image_id", ["img-000001"]).count() == 1


def test_rebuild_replaces_sidecars(table):
    first = build_bloom_index(table, "image_id")
    second = build_bloom_index(table, "image_id", fpp=0.001)
    bloom_dir = os.path.join(table.root, "metadata", "bloom")
    on_disk = set(os.listdir(bloom_dir))
    for rel in first["shards"]:
        assert os.path.basename(rel) not in on_disk
    for rel in second["shards"]:
        assert os.path.basename(rel) in on_disk
    assert point_lookup(table, "image_id", ["img-000042"]).count() == 1


def test_null_probes_and_null_rows(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "n"), SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(
        spark.createDataFrame(
            [("a", 1, 1, None), ("b", None, 2, "x")], SCHEMA
        )
    )
    build_bloom_index(t, "caption")
    # NULL probe matches nothing; the non-null value still resolves
    assert bloom_file_filter(t, "caption", [None]) == set()
    assert point_lookup(t, "caption", [None, "x"]).count() == 1


def test_all_null_file_prunes(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "an"), SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(
        spark.createDataFrame(
            [("a", 1, 1, None), ("b", 2, 2, None)], SCHEMA
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame([("c", 3, 3, "real")], SCHEMA).coalesce(1)
    )
    build_bloom_index(t, "caption")
    ff = bloom_file_filter(t, "caption", ["real"])
    assert len(ff) == 1  # the all-NULL file's zero bitmap prunes it


def test_unindexed_column_returns_none(table):
    assert bloom_file_filter(table, "caption", ["caption 3"]) is None


def test_survives_deletes(table):
    build_bloom_index(table, "image_id")
    table.delete_where(F.col("image_id") == "img-000123")
    # bloom still admits the file; the scan's delete reconciliation wins
    assert point_lookup(table, "image_id", ["img-000123"]).count() == 0
    assert point_lookup(table, "image_id", ["img-000124"]).count() == 1


def test_incremental_build_is_o_delta(table, spark):
    import json as _json

    first = build_bloom_index(table, "image_id")
    extra = spark.createDataFrame(
        [(f"img-90{i:04d}", 8, i, f"late {i}") for i in range(5)], SCHEMA
    )
    table.append(extra.coalesce(1))
    second = build_bloom_index(table, "image_id", incremental=True)
    # only the appended file was scanned/built; prior shards re-referenced
    assert second["n_files"] == SLICES + 1
    assert second["n_files_built"] == 1
    assert set(first["shards"]) <= set(second["shards"])
    # covered files' bitmaps are byte-identical (reused, not recomputed)
    def shard_map(idx):
        out = {}
        for rel in idx["shards"]:
            out.update(
                _json.loads(
                    open(os.path.join(table.root, rel)).read()
                )["files"]
            )
        return out
    before, after = shard_map(first), shard_map(second)
    for key, meta in before.items():
        assert after[key]["bits"] == meta["bits"]
    # lookups exact across old and new keys
    assert point_lookup(table, "image_id", ["img-900003"]).count() == 1
    assert point_lookup(table, "image_id", ["img-000123"]).count() == 1
    # and the new file actually prunes: an absent probe keeps ~0 files
    assert len(bloom_file_filter(table, "image_id", ["nope-1"])) <= 2


def test_incremental_with_changed_fpp_rebuilds_fully(table):
    build_bloom_index(table, "image_id", fpp=0.01)
    idx = build_bloom_index(table, "image_id", fpp=0.001, incremental=True)
    assert idx["n_files_built"] == idx["n_files"] == SLICES


def test_incremental_after_compaction_degrades_to_full(table):
    from olake_spark.operators.compact import run_compaction

    build_bloom_index(table, "image_id")
    run_compaction(table, "blm-compact", fill_ratio=1.0)
    idx = build_bloom_index(table, "image_id", incremental=True)
    # every pre-compaction file is gone -> nothing reusable
    assert idx["n_files_built"] == idx["n_files"]
    assert point_lookup(table, "image_id", ["img-000123"]).count() == 1


def test_time_travel_lookup_sees_predeleted_rows(table):
    # REGRESSION (review finding): bitmaps must hash the RAW file contents,
    # not the delete-reconciled view — otherwise a lookup pinned to a
    # snapshot BEFORE the delete false-negatives on the deleted key.
    pre_delete = table.current_snapshot_id
    table.delete_where(F.col("image_id") == "img-000123")
    build_bloom_index(table, "image_id")  # built AFTER the delete
    # current snapshot: the delete wins (predicate re-applied)
    assert point_lookup(table, "image_id", ["img-000123"]).count() == 0
    # time travel to before the delete: the row MUST come back
    got = point_lookup(
        table, "image_id", ["img-000123"], snapshot_id=pre_delete
    )
    assert got.count() == 1


def test_incremental_with_changed_max_bits_rebuilds_fully(table):
    build_bloom_index(table, "image_id", max_bits=1 << 20)
    idx = build_bloom_index(table, "image_id", incremental=True)  # default cap
    assert idx["n_files_built"] == idx["n_files"] == SLICES


def test_failed_build_orphan_shards_swept(table):
    import json as _json

    first = build_bloom_index(table, "image_id")
    # simulate a build that died after writing a shard but before the index
    bloom_dir = os.path.join(table.root, "metadata", "bloom")
    orphan = os.path.join(
        bloom_dir, "bloom-image_id-" + "ab" * 16 + ".json"
    )
    with open(orphan, "w") as f:
        _json.dump({"files": {}}, f)
    # a shard of ANOTHER column must survive the sweep
    other = os.path.join(
        bloom_dir, "bloom-caption-" + "cd" * 16 + ".json"
    )
    with open(other, "w") as f:
        _json.dump({"files": {}}, f)
    second = build_bloom_index(table, "image_id", incremental=True)
    on_disk = set(os.listdir(bloom_dir))
    assert os.path.basename(orphan) not in on_disk
    assert os.path.basename(other) in on_disk
    for rel in second["shards"]:
        assert os.path.basename(rel) in on_disk


def test_driver_xxh64_bit_identical_to_spark(spark):
    # the lookup hashes probes DRIVER-SIDE (no Spark job); this pin keeps
    # that implementation bit-identical to the JVM expressions the build
    # uses — across every XXH64 length-class branch for strings AND across
    # every supported column type's lane width (Spark hashes int/short/
    # byte/date/boolean as 4-byte lanes, long as 8, float/double via
    # their IEEE bit patterns — a wrong lane width silently breaks every
    # covered-file lookup, which is exactly what this test exists to stop)
    import datetime as _dt
    import random

    from pyspark.sql.types import (BooleanType, ByteType, DateType,
                                   DoubleType, FloatType, IntegerType,
                                   LongType, ShortType, StringType,
                                   StructField, StructType)

    from olake_spark.icelite.bloom import (_H2_TAG, _spark_serialize,
                                           _xxhash64_chain)

    rng = random.Random(7)

    def pin(dtype, simple, vals):
        df = spark.createDataFrame(
            [(v,) for v in vals], StructType([StructField("v", dtype)])
        )
        tag = _H2_TAG.encode("utf-8")
        for r in df.select(
            F.xxhash64("v").alias("h1"),
            F.xxhash64(F.lit(_H2_TAG), F.col("v")).alias("h2"),
            "v",
        ).collect():
            lane = _spark_serialize(r["v"], simple)
            assert _xxhash64_chain([lane]) == r["h1"], (simple, r["v"])
            assert _xxhash64_chain([tag, lane]) == r["h2"], (simple, r["v"])

    strs = (
        ["", "a", "abc", "img-000000000123", "x" * 31, "y" * 32, "z" * 33,
         "w" * 100, "h\u00e9llo w\u00f6rld \u00fcn\u00efcode \u2713", "\u00e9" * 40]
        + ["".join(rng.choice("abcdefgh0123-_")
                   for _ in range(rng.randint(0, 64))) for _ in range(30)]
    )
    pin(StringType(), "string", strs)
    longs = [0, 1, -1, 42, 2 ** 62, -(2 ** 62), 7919] + [
        rng.randint(-(2 ** 63), 2 ** 63 - 1) for _ in range(15)
    ]
    pin(LongType(), "bigint", longs)
    ints = [0, 1, -1, 5, 2 ** 31 - 1, -(2 ** 31)] + [
        rng.randint(-(2 ** 31), 2 ** 31 - 1) for _ in range(15)
    ]
    pin(IntegerType(), "int", ints)
    pin(ShortType(), "smallint", [0, 1, -1, 32767, -32768])
    pin(ByteType(), "tinyint", [0, 1, -1, 127, -128])
    pin(BooleanType(), "boolean", [True, False])
    pin(DateType(), "date",
        [_dt.date(1970, 1, 1), _dt.date(2026, 8, 21), _dt.date(1900, 2, 3)])
    pin(FloatType(), "float", [0.0, -0.0, 1.5, -273.15, 3.0e38])
    pin(DoubleType(), "double", [0.0, -0.0, 1.5, -2.5e300, 3.14159])


def test_long_column_index_and_lookup(table):
    # phash is BIGINT: integral lanes hash as 8-byte LE two's-complement —
    # same build/probe agreement as strings (negative values included)
    build_bloom_index(table, "phash")
    vals = [0, 7919 * 123, 7919 * 599]
    got = point_lookup(table, "phash", vals, columns=["image_id", "phash"])
    assert sorted(r["phash"] for r in got.collect()) == sorted(vals)
    ff = bloom_file_filter(table, "phash", [7919 * 123])
    assert len(ff) <= 2


def test_int_column_index_and_lookup(table):
    # REGRESSION (review finding): IntegerType hashes as a 4-BYTE lane in
    # Spark; an 8-byte probe lane silently pruned every covered file
    build_bloom_index(table, "w")
    got = point_lookup(table, "w", [5], columns=["image_id", "w"]).collect()
    assert got and all(r["w"] == 5 for r in got)
    # value present in many files: candidates nonzero, lookup non-empty
    assert len(bloom_file_filter(table, "w", [5])) >= 1
