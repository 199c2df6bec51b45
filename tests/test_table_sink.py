"""icelite Structured Streaming SINK tests (Python Data Source stream
writer): executor-side Arrow parquet writes + driver-side atomic snapshot
commit with idempotent-txn exactly-once; composed with the streaming
SOURCE into a table-to-table pipeline.
"""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction
from olake_spark.streaming import read_table_stream
from olake_spark.streaming.table_sink import (IceliteCommitMessage,
                                              IceliteStreamWriter,
                                              write_table_stream)


@pytest.fixture()
def src(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "a"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 60), max_records_per_file=20)
    return t


@pytest.fixture()
def dst(spark, tmp_table_dir):
    return Table.create(
        spark,
        os.path.join(tmp_table_dir, "b"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )


def _pipe(spark, src_root, dst_root, ckpt):
    q = write_table_stream(
        read_table_stream(spark, src_root),
        dst_root, ckpt, txn_app="t2t",
    )
    q.awaitTermination(180)


def _rows(t):
    return {
        tuple(r)
        for r in t.scan(columns=["image_id", "caption", "w", "h"]).collect()
    }


def test_table_to_table_pipeline_and_resume(spark, src, dst, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    _pipe(spark, src.root, dst.root, ckpt)
    dst.refresh()
    assert _rows(dst) == _rows(src)
    # stream is down; source advances; resume moves ONLY the delta
    src.append(datagen.gen_images_df(spark, 90), max_records_per_file=30)
    _pipe(spark, src.root, dst.root, ckpt)
    dst.refresh()
    assert dst.scan().count() == 150
    assert _rows(dst) == _rows(src)
    # streamed files carry footer stats into manifests
    e = [x for x in dst.entries() if x.record_count > 0][0]
    assert "image_id" in e.mins and "image_id" in e.maxs


def test_exactly_once_replayed_batch_is_noop(spark, src, dst):
    w = IceliteStreamWriter(dst.schema, {"path": dst.root, "txn_app": "x1"})
    msgs = [
        IceliteCommitMessage("data/f1.parquet", 10, 100, {}, {}, {}),
    ]
    # fabricate the data file so the replay-skip cleanup has a target
    open(os.path.join(dst.root, "data", "f1.parquet"), "wb").close()
    w.commit(msgs, batchId=0)
    dst.refresh()
    n_snaps = len(dst.snapshots())
    # replay of batch 0 (crash between commit and checkpoint): the replayed
    # tasks wrote a NEW file; the commit must skip and remove it
    replay = os.path.join(dst.root, "data", "f1-replay.parquet")
    open(replay, "wb").close()
    w.commit(
        [IceliteCommitMessage("data/f1-replay.parquet", 10, 100, {}, {}, {})],
        batchId=0,
    )
    dst.refresh()
    assert len(dst.snapshots()) == n_snaps  # no new snapshot
    assert not os.path.exists(replay)  # replayed file cleaned up


def test_abort_removes_batch_files(spark, dst):
    w = IceliteStreamWriter(dst.schema, {"path": dst.root, "txn_app": "x2"})
    p = os.path.join(dst.root, "data", "doomed.parquet")
    open(p, "wb").close()
    w.abort(
        [IceliteCommitMessage("data/doomed.parquet", 5, 50, {}, {}, {}), None],
        batchId=3,
    )
    assert not os.path.exists(p)


def test_schema_mismatch_refused(spark, dst):
    from pyspark.sql.types import StringType, StructField, StructType

    bad = StructType([StructField("nope", StringType())])
    with pytest.raises(ValueError, match="schema mismatch"):
        IceliteStreamWriter(bad, {"path": dst.root})


def test_streamed_table_is_maintainable(spark, src, dst, tmp_table_dir):
    _pipe(spark, src.root, dst.root, os.path.join(tmp_table_dir, "c"))
    dst.refresh()
    before = _rows(dst)
    res = run_compaction(dst, "post-stream", fill_ratio=1.0)
    assert res["bins_executed"] >= 1  # streamed files are compaction debt
    dst.refresh()
    assert _rows(dst) == before
