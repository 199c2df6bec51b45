"""Maintenance log: per-partition lineage + metrics + idempotent resume (F4).

The Spark rendition of the reference's chunk-set resume state
(types/state.go:187-230 — a chunk is removed from the state file only after
its writer thread closes cleanly; restart skips completed chunks,
drivers/abstract/backfill.go:44-58). Here: every maintenance job plans chunks,
logs `planned`, executes, logs `done` (with rows/bytes/snapshot lineage);
a restart with the same job_id skips chunks already logged `done`.

The log itself is an icelite table (dogfooding: same atomic-commit format),
with a driver-side pyarrow append fast path so control-plane writes don't pay
a Spark job each.
"""

from __future__ import annotations

import datetime as dt
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

from olake_spark.icelite.stats import footer_stats
from olake_spark.icelite.table import DATA, FileEntry, Table

LOG_SCHEMA = StructType(
    [
        StructField("job_id", StringType(), False),
        StructField("op", StringType(), False),
        StructField("partition", StringType(), True),
        StructField("chunk_id", StringType(), False),
        StructField("rows", LongType(), True),
        StructField("bytes_in", LongType(), True),
        StructField("bytes_out", LongType(), True),
        StructField("snapshot_before", LongType(), True),
        StructField("snapshot_after", LongType(), True),
        StructField("status", StringType(), False),
        StructField("started_at", TimestampType(), True),
        StructField("finished_at", TimestampType(), True),
    ]
)

_PA_SCHEMA = pa.schema(
    [
        ("job_id", pa.string()),
        ("op", pa.string()),
        ("partition", pa.string()),
        ("chunk_id", pa.string()),
        ("rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("snapshot_before", pa.int64()),
        ("snapshot_after", pa.int64()),
        ("status", pa.string()),
        ("started_at", pa.timestamp("us")),
        ("finished_at", pa.timestamp("us")),
    ]
)


class MaintenanceLog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        meta = os.path.join(root, "metadata")
        if not os.path.isdir(meta) or not os.listdir(meta):
            self.table = Table.create(spark, root, LOG_SCHEMA)
        else:
            self.table = Table.load(spark, root)

    def _append_rows(self, rows: list[dict]) -> None:
        """Driver-side parquet append (no Spark job) through the same atomic
        snapshot commit as any other write."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        for r in rows:
            r.setdefault("partition", None)
            r.setdefault("rows", None)
            r.setdefault("bytes_in", None)
            r.setdefault("bytes_out", None)
            r.setdefault("snapshot_before", None)
            r.setdefault("snapshot_after", None)
            r.setdefault("started_at", now)
            r.setdefault("finished_at", None)
        cols = {f.name: [r.get(f.name) for r in rows] for f in _PA_SCHEMA}
        t = self.table
        t.refresh()
        seq = t.meta["last_sequence_number"] + 1
        dest = os.path.join(t.root, "data", f"{seq:06d}-{uuid.uuid4().hex}.parquet")
        pq.write_table(pa.table(cols, schema=_PA_SCHEMA), dest)
        st = footer_stats(dest)
        entry = FileEntry(
            DATA, os.path.relpath(dest, t.root), {}, seq,
            st["record_count"], st["file_size_bytes"],
            st["mins"], st["maxs"], st["null_counts"],
        )
        t._commit_snapshot("append", [entry], seq_used=seq)

    def log_planned(self, job_id: str, op: str, chunks: list[dict]) -> None:
        self._append_rows(
            [{"job_id": job_id, "op": op, "status": "planned", **c} for c in chunks]
        )

    def log_done(self, job_id: str, op: str, chunk: dict) -> None:
        self.log_done_many(job_id, op, [chunk])

    def log_done_many(self, job_id: str, op: str, chunks: list[dict]) -> None:
        """One atomic log append for a batch of finished chunks."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        self._append_rows(
            [
                {"job_id": job_id, "op": op, "status": "done",
                 "finished_at": now, **c}
                for c in chunks
            ]
        )

    def done_chunk_ids(self, job_id: str) -> set[str]:
        df = self.table.scan(columns=["job_id", "chunk_id", "status"])
        rows = (
            df.filter((df.job_id == job_id) & (df.status == "done"))
            .select("chunk_id")
            .collect()
        )
        return {r["chunk_id"] for r in rows}

    def metrics_df(self):
        return self.table.scan()
