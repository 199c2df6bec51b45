"""Streaming gap-sessionization tests: in-stream session close (gap
observed between micro-batches), timeout flush of idle sessions, and
equivalence with the batch operator on the closed set."""

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.streaming.sessions import sessionize_stream

GAP = 100


def _write(spark, d, name, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_epoch"])
    (
        spark.createDataFrame(pdf)
        .withColumn("ts", F.to_timestamp(F.col("ts_epoch")))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(d, name))
    )


def test_stream_sessions_close_and_flush(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "feed")
    os.makedirs(src)
    # batch A: two in-gap events per user; batch B: a far-future event that
    # CLOSES the first session in-stream
    _write(spark, src, "a.parquet", [(1, 7, 1000), (2, 7, 1010), (3, 9, 500)])
    time.sleep(0.05)
    _write(spark, src, "b.parquet", [(4, 7, 50_000)])

    schema = spark.read.parquet(os.path.join(src, "a.parquet")).schema
    feed = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "*"))
    )
    out = sessionize_stream(
        feed, "user_id", "ts", "event_id", GAP, idle_emit_ms=3_000
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_feed")
        .outputMode("append")
        .option(
            "checkpointLocation", os.path.join(tmp_table_dir, "ck")
        )
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        def rows():
            return {
                (r["user"], r["session_start"], r["session_end"],
                 r["n_events"], r["span_s"])
                for r in spark.sql("select * from sess_feed").collect()
            }

        # in-stream close: user 7's first session ends once the far event
        # lands in a later micro-batch
        deadline = time.time() + 120
        while (7, 1000, 1010, 2, 10) not in rows():
            assert time.time() < deadline, f"no in-stream close: {rows()}"
            time.sleep(0.5)
        # timeout flush: with the source drained, the idle timer closes the
        # remaining open sessions (user 9's singleton + user 7's far event)
        deadline = time.time() + 120
        want = {
            (7, 1000, 1010, 2, 10),
            (9, 500, 500, 1, 0),
            (7, 50_000, 50_000, 1, 0),
        }
        while rows() != want:
            assert time.time() < deadline, f"timeout flush stalled: {rows()}"
            time.sleep(0.5)
        # at-most-once: nothing is ever emitted twice
        all_rows = spark.sql("select * from sess_feed").collect()
        assert len(all_rows) == len(want)
    finally:
        q.stop()
