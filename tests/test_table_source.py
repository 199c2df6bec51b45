"""icelite Structured Streaming source (Python Data Source API) tests —
Iceberg SparkMicroBatchStream parity: snapshot-id offsets, append-class
delta per micro-batch, rewrite invisibility, delete-snapshot refusal,
checkpoint resume.
"""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction
from olake_spark.streaming import read_table_stream

NUM = "cast(substring(image_id, 5, 12) as bigint)"


@pytest.fixture()
def tbl(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "imgs"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 60), max_records_per_file=20)
    return t


def _drain(spark, root, ckpt, out_dir, **opts):
    """Run the feed to exhaustion into a parquet sink (the memory sink
    cannot recover from a checkpoint). Returns the CUMULATIVE sink
    DataFrame; callers assert count deltas across drains."""
    q = (
        read_table_stream(spark, root, **opts)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(out_dir)
    except Exception:  # sink dir never created: zero rows drained
        return spark.createDataFrame([], "image_id string")


def test_earliest_drains_full_history_and_resumes(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out).count() == 60
    # new append while the stream is down; resume from the SAME checkpoint
    tbl.append(datagen.gen_images_df(spark, 90), max_records_per_file=30)
    got = _drain(spark, tbl.root, ckpt, out)
    assert got.count() == 150  # +90: only the delta was re-read
    assert {r[0] for r in got.select(F.expr(NUM)).collect()} == set(range(90))


def test_rewrites_never_resurface_rows(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out).count() == 60
    run_compaction(tbl, "src-compact", fill_ratio=1.0)
    assert _drain(spark, tbl.root, ckpt, out).count() == 60  # no new rows


def test_starting_latest_sees_only_new_appends(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out, starting="latest").count() == 0
    tbl.append(datagen.gen_images_df(spark, 70), max_records_per_file=70)
    got = _drain(spark, tbl.root, ckpt, out, starting="latest")
    assert got.count() == 70


def test_delete_snapshot_fails_stream_by_default(spark, tbl, tmp_table_dir):
    tbl.delete_where(f"{NUM} % 3 = 0")
    with pytest.raises(Exception, match="delete|retraction|STREAM"):
        _drain(
            spark, tbl.root,
            os.path.join(tmp_table_dir, "c1"),
            os.path.join(tmp_table_dir, "s1"),
        )
    # Iceberg's streaming-skip-delete-snapshots escape hatch
    got = _drain(
        spark, tbl.root,
        os.path.join(tmp_table_dir, "c2"),
        os.path.join(tmp_table_dir, "s2"),
        skip_delete_snapshots=True,
    )
    assert got.count() == 60  # inserts only; retractions not representable


def test_schema_matches_table(spark, tbl, tmp_table_dir):
    feed = read_table_stream(spark, tbl.root)
    assert feed.schema == tbl.schema


def test_batch_read_refused(spark, tbl):
    from olake_spark.streaming import table_source

    table_source.register(spark)
    with pytest.raises(Exception, match="Table.scan|batch|NotImplemented"):
        spark.read.format("icelite").option("path", tbl.root).load().collect()
