"""icelite as a Structured Streaming SINK — Iceberg's Spark streaming write
(``df.writeStream.format("iceberg")``) re-expressed through PySpark 4.1's
Arrow stream-writer Data Source API.

    spark.dataSource.register(IceliteSinkDataSource)
    (df.writeStream.format("icelite-sink")
       .option("path", table_root)
       .option("txn_app", "my-query")       # exactly-once identity
       .option("checkpointLocation", ckpt)
       .start())

Execution shape (the Iceberg sink's, executor-driven):
  * ``write`` runs per task on executors: Arrow record batches stream
    straight into ONE parquet file per task under the table's data/
    directory (no staging hop, no driver bytes), and the file's
    min/max/null manifest stats are harvested from its footer in the same
    task — zero extra jobs, zero driver I/O.
  * ``commit`` runs once per micro-batch on the driver: one atomic
    metadata-only snapshot commit registering every task's file. The commit
    carries ``txn=(txn_app, batchId)`` — the idempotent-writer transaction
    checked inside the commit CAS — so a micro-batch replayed after a crash
    between commit and checkpoint is a provable no-op and its re-written
    files are removed (exactly-once, the txnAppId/txnVersion pattern).
  * ``abort`` removes the failed batch's files in one batched FileIO call;
    a crash that skips abort leaves orphans for ``remove_orphan_files``.

Files are written unpartitioned ({} partition values, no in-stream sort):
scans stay correct because icelite recomputes partition values from row
values, and the nightly compaction/cluster pass migrates streamed files
into layout — exactly how the reference splits ingest (fast, append-only)
from maintenance (layout-restoring rewrites).

Append output mode only — retractions go through merge/CDC
(``sync.apply_cdc_stream``), which needs key semantics a blind sink
doesn't have.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (DataSource, DataSourceStreamArrowWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

from olake_spark.icelite.stats import footer_stats
from olake_spark.icelite.table import DATA, FileEntry, Table


@dataclass
class IceliteCommitMessage(WriterCommitMessage):
    rel_path: str | None  # None: the task saw zero rows, wrote nothing
    record_count: int
    file_size_bytes: int
    mins: dict
    maxs: dict
    nulls: dict


class IceliteStreamWriter(DataSourceStreamArrowWriter):
    def __init__(self, schema: StructType, options: dict):
        self.root = os.path.abspath(options["path"])
        self.txn_app = options.get("txn_app", "icelite-sink")
        self.columns = [f.name for f in schema.fields]
        table_fields = {f.name: f.dataType for f in self._table().schema.fields}
        missing = set(table_fields) - set(self.columns)
        extra = set(self.columns) - set(table_fields)
        if missing or extra:
            raise ValueError(
                f"stream schema mismatch: missing {sorted(missing)}, "
                f"unknown {sorted(extra)}"
            )
        # types too: a name-only check would durably commit parquet the
        # table's schema-enforced reader can't scan
        drift = {
            f.name: (str(f.dataType), str(table_fields[f.name]))
            for f in schema.fields
            if f.dataType != table_fields[f.name]
        }
        if drift:
            raise ValueError(f"stream schema type mismatch: {drift}")

    def _table(self) -> Table:
        # metadata-only view (commit/abort never launch Spark jobs); the
        # Table is built per call — it holds an RLock and must not be
        # pickled to executors with the writer
        return Table(None, self.root).refresh()

    # ------------------------------------------------------ executor side

    def write(self, iterator: Iterator) -> IceliteCommitMessage:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rel = os.path.join("data", f"stream-{uuid.uuid4().hex}.parquet")
        path = os.path.join(self.root, rel)
        writer: pq.ParquetWriter | None = None
        rows = 0
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return IceliteCommitMessage(None, 0, 0, {}, {}, {})
        writer.close()
        st = footer_stats(path)  # same manifest-stats conventions as append
        return IceliteCommitMessage(
            rel, st["record_count"], st["file_size_bytes"],
            st["mins"], st["maxs"], st["null_counts"],
        )

    # -------------------------------------------------------- driver side

    def commit(self, messages, batchId: int) -> None:
        t = self._table()
        seq = t.meta["last_sequence_number"] + 1
        entries = [
            FileEntry(
                DATA, m.rel_path, {}, seq,
                m.record_count, m.file_size_bytes, m.mins, m.maxs, m.nulls,
            )
            for m in messages
            if m is not None and m.rel_path is not None
        ]
        # commit even when empty: the txn version must still advance, or a
        # replay of a later non-empty batch could double-apply after a
        # crash that lost only the empty batch's checkpoint entry
        t._commit_snapshot(
            "append", entries, seq_used=seq,
            txn=(self.txn_app, batchId),
            extra_summary={"streaming-batch-id": batchId},
        )

    def abort(self, messages, batchId: int) -> None:
        victims = [
            os.path.join(self.root, m.rel_path)
            for m in messages
            if m is not None and m.rel_path is not None
        ]
        if victims:
            try:
                self._table().io.remove_many(victims)
            except OSError:
                pass  # best effort; the orphan reaper collects stragglers


class IceliteSinkDataSource(DataSource):
    """``format("icelite-sink")`` — streaming append writes to icelite."""

    @classmethod
    def name(cls) -> str:
        return "icelite-sink"

    def streamWriter(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "icelite-sink supports append output mode only; retractions "
                "go through sync.apply_cdc_stream (merge/CDC semantics)"
            )
        return IceliteStreamWriter(schema, dict(self.options))


def register(spark) -> None:
    spark.dataSource.register(IceliteSinkDataSource)


def write_table_stream(df, root: str, checkpoint: str, txn_app: str,
                       trigger: dict | None = None):
    """Convenience: register + start an append stream into a table root."""
    register(df.sparkSession)
    w = (
        df.writeStream.format("icelite-sink")
        .option("path", root)
        .option("txn_app", txn_app)
        .option("checkpointLocation", checkpoint)
    )
    return w.trigger(**(trigger or {"availableNow": True})).start()
