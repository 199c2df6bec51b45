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


def _feed(spark, df, feed_dir, ckpt, dst_root):
    """Drain one availableNow micro-batch of `df` through the upsert sink."""
    os.makedirs(feed_dir, exist_ok=True)
    df.write.mode("append").parquet(feed_dir)
    stream = spark.readStream.schema(datagen.IMAGES_SCHEMA).parquet(feed_dir)
    q = write_table_stream(stream, dst_root, ckpt, txn_app="ups",
                           mode="upsert")
    q.awaitTermination(180)


def test_upsert_sink_delete_before_insert(spark, dst, tmp_table_dir):
    """mode=upsert mirrors the reference's default streaming destination
    (IcebergTableWriterFactory.java:45-58 / BaseDeltaTaskWriter.java:50-61):
    each batch's keys equality-delete prior rows, the batch's own rows
    survive, and a second batch's re-update wins over the first."""
    dst.append(datagen.gen_images_df(spark, 40), max_records_per_file=10)
    feed = os.path.join(tmp_table_dir, "feed")
    ckpt = os.path.join(tmp_table_dir, "ck-ups")

    upd1 = (
        datagen.gen_images_df(spark, 10)  # keys img-0..9 (overlap)
        .withColumn("caption", F.concat(F.col("caption"), F.lit("-v2")))
    )
    new1 = datagen.gen_images_df(spark, 110).filter(
        F.col("image_id") >= "img-000000000100"
    )  # keys img-100..109 (fresh)
    _feed(spark, upd1.unionByName(new1), feed, ckpt, dst.root)
    dst.refresh()
    got = {r[0]: r[1] for r in dst.scan(columns=["image_id", "caption"]).collect()}
    assert len(got) == 50  # 40 base − 10 replaced + 10 updated + 10 new
    for i in range(10):
        assert got[f"img-{i:012d}"].endswith("-v2")

    # resume with a second batch: update 5..14 again — latest wins
    upd2 = (
        datagen.gen_images_df(spark, 15)
        .filter(F.col("image_id") >= "img-000000000005")
        .withColumn("caption", F.concat(F.col("caption"), F.lit("-v3")))
    )
    _feed(spark, upd2, feed, ckpt, dst.root)
    dst.refresh()
    got = {r[0]: r[1] for r in dst.scan(columns=["image_id", "caption"]).collect()}
    assert len(got) == 50
    for i in range(5):
        assert got[f"img-{i:012d}"].endswith("-v2")
    for i in range(5, 15):
        assert got[f"img-{i:012d}"].endswith("-v3")
    # equals the batch MERGE result: upserts applied key-by-key, last wins
    base = {r[0] for r in dst.scan(columns=["image_id"]).collect()}
    assert base == {f"img-{i:012d}" for i in range(40)} | {
        f"img-{i:012d}" for i in range(100, 110)
    }


def test_upsert_replay_is_noop_and_cleans_both_files(spark, dst):
    dst.append(datagen.gen_images_df(spark, 10))
    w = IceliteStreamWriter(
        dst.schema, {"path": dst.root, "txn_app": "u1", "mode": "upsert"}
    )
    os.makedirs(os.path.join(dst.root, "deletes"), exist_ok=True)

    def msg(tag):
        dp = f"data/u-{tag}.parquet"
        ep = f"deletes/u-{tag}.parquet"
        open(os.path.join(dst.root, dp), "wb").close()
        open(os.path.join(dst.root, ep), "wb").close()
        return IceliteCommitMessage(
            dp, 3, 30, {}, {}, {},
            delete_rel_path=ep, delete_record_count=3,
            delete_file_size_bytes=20, delete_mins={}, delete_maxs={},
            delete_nulls={},
        )

    w.commit([msg("a")], batchId=0)
    dst.refresh()
    n = len(dst.snapshots())
    w.commit([msg("b")], batchId=0)  # replay after crash
    dst.refresh()
    assert len(dst.snapshots()) == n
    assert not os.path.exists(os.path.join(dst.root, "data", "u-b.parquet"))
    assert not os.path.exists(
        os.path.join(dst.root, "deletes", "u-b.parquet")
    )


def test_upsert_requires_identifier_fields(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "noid"), datagen.IMAGES_SCHEMA,
        PartitionSpec(()),
    )
    with pytest.raises(ValueError, match="identifier_fields"):
        IceliteStreamWriter(
            t.schema, {"path": t.root, "txn_app": "u2", "mode": "upsert"}
        )


def test_streamed_table_is_maintainable(spark, src, dst, tmp_table_dir):
    _pipe(spark, src.root, dst.root, os.path.join(tmp_table_dir, "c"))
    dst.refresh()
    before = _rows(dst)
    res = run_compaction(dst, "post-stream", fill_ratio=1.0)
    assert res["bins_executed"] >= 1  # streamed files are compaction debt
    dst.refresh()
    assert _rows(dst) == before
