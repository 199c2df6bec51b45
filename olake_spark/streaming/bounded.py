"""Bounded change-feed consumption — Structured Streaming rendition of the
reference's CDC drain loop.

The reference consumes WAL/binlog until the position captured at start, then
stops (pkg/waljs/waljs.go:172-179 — `ClientXLogPos >= CurrentWalPosition`;
same for the MySQL binlog reader). The Spark-native equivalent is
`trigger(availableNow=True)`: process everything available at start across
rate-limited micro-batches, then terminate — identical "consume up to
captured position" semantics with exactly-once sink state in the checkpoint
dir (the analogue of the reference's resume tokens / LSN state,
types/state.go:63-68).

Late/out-of-order events are handled the way the reference's A1 dedup does
(last-writer-wins by timestamp): watermarked event-time windows here, the
MERGE pre-dedup window in batch.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def bounded_file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """A file-based change feed read as a stream (parquet dir = the 'log');
    maxFilesPerTrigger is the rate limit (the reference's chunked drain)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Watermarked tumbling-window aggregation over event time."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def run_available_now(
    agg: DataFrame, checkpoint_dir: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain the bounded stream to completion into a memory sink and return
    the result as a batch DataFrame."""
    name = f"bounded_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg.sparkSession.table(name)
