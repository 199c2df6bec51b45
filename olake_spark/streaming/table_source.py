"""icelite as a Structured Streaming SOURCE — Iceberg's Spark streaming
read (``spark.readStream.format("iceberg")``) re-expressed through PySpark
4's Python Data Source API.

    spark.dataSource.register(IceliteDataSource)
    feed = (spark.readStream.format("icelite")
                 .option("path", table_root)
                 .option("starting", "earliest")   # | "latest" | "<snap id>"
                 .load())

Contract (mirrors Iceberg's SparkMicroBatchStream):
  * Offsets are snapshot ids; each micro-batch is the set of data files
    ADDED by append-class commits (append / rowdelta / published
    stage-append / cherrypick / clone) in ``(start, end]`` on the parent
    chain — the same window rule as :meth:`Table.incremental_scan`, so
    rewrite commits (compact / cluster / manifests) never re-surface rows.
  * A commit that added DELETE files in the window fails the stream by
    default — exactly Iceberg's ``streaming-skip-delete-snapshots`` rule —
    because an append-only feed cannot represent retractions; set
    ``skip_delete_snapshots=true`` to tail the inserts anyway (consumers
    needing retractions use :meth:`Table.changelog_scan`).
  * One InputPartition per data file: planning is metadata-only on the
    driver (O(new files) per micro-batch), reads are Arrow record batches
    straight out of parquet on the executors — no row-at-a-time Python.

Scale shape: the per-batch work is proportional to the DELTA (files added
since the last offset), never to table size; a 10^12-row table tails as
cheaply as a small one. Batch analytics should keep using ``Table.scan``
(native parquet scan, delete-aware, codegen'd) — this source is the
low-latency incremental feed, where per-batch volumes are small and the
Arrow-over-Python-worker path is not the bottleneck.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)
from pyspark.sql.types import StructType

from olake_spark.icelite.table import DATA, Table

_APPEND_OPS = ("append", "rowdelta", "stage-append", "cherrypick", "clone")
# retraction-carrying commits (merge-on-read DELETE / UPDATE): refused by
# default; with skip_delete_snapshots=true the WHOLE snapshot is skipped —
# an overwrite's data files are rewritten copies of existing rows, emitting
# them would duplicate the feed (Iceberg skips them the same way)
_DELETE_OPS = ("delete", "overwrite")


class IceliteFilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class IceliteStreamReader(DataSourceStreamReader):
    """Driver-side planning over table metadata; executor-side Arrow reads.

    Holds only plain strings/ints (the reader object is pickled to
    executors for ``read``); a metadata-only :class:`Table` view is opened
    per driver call — Table carries an RLock and must never ride along.
    """

    def __init__(self, schema: StructType, options: dict):
        self.root = os.path.abspath(options["path"])
        self.starting = options.get("starting", "earliest")
        self.skip_deletes = (
            str(options.get("skip_delete_snapshots", "false")).lower() == "true"
        )
        self.columns = [f.name for f in schema.fields]
        # rate limit (Iceberg's streaming-max-files-per-micro-batch): cap
        # how many data files one micro-batch may plan. Applied by holding
        # latestOffset back to the last snapshot that fits the budget, so
        # each batch stays a clean snapshot range and the checkpoint
        # contract is untouched. 0 = unbounded.
        self.max_files = int(options.get("max_files_per_batch", 0))
        # rate-limit walk state. Spark only calls initialOffset() on a
        # FRESH query; on a checkpoint restart the committed offset is
        # recovered engine-side and never shown to latestOffset(). So the
        # budget walk may only be seeded from initialOffset() when we SAW
        # that call — after a restart the first batch runs unbounded (to
        # current), and bounding resumes from there. Seeding from
        # initialOffset() after a restart would plan an offset BEHIND the
        # checkpoint: Spark would then call partitions(ckpt, older) and the
        # ancestor walk would raise on every retry, wedging the query.
        self._last_planned: int | None = None

    def _table(self) -> Table:
        # metadata-only view: snapshots / manifests / chain walks never
        # touch the SparkSession, so none is needed (or available) here
        return Table(None, self.root).refresh()

    def initialOffset(self) -> dict:
        if self.starting == "earliest":
            off = {"snapshot_id": 0}
        elif self.starting == "latest":
            off = {"snapshot_id": self._table().current_snapshot_id or 0}
        else:
            off = {"snapshot_id": int(self.starting)}
        self._last_planned = off["snapshot_id"]  # fresh query: safe seed
        return off

    def latestOffset(self) -> dict:
        t = self._table()
        cur = t.current_snapshot_id or 0
        if not self.max_files or cur == 0:
            return {"snapshot_id": cur}
        start = self._last_planned
        if start is None:  # restart: checkpoint offset unknown — unbounded
            self._last_planned = cur
            return {"snapshot_id": cur}
        if start == cur:
            return {"snapshot_id": cur}
        budget = self.max_files
        end = start
        for i, snap in enumerate(self._chain(t, start, cur)):
            if start == 0 and i == 0 and snap["operation"] not in _APPEND_OPS:
                # expired-history root: partitions() emits its FULL state
                n = sum(
                    1
                    for x in t.entries(snap["snapshot_id"])
                    if x.content == DATA and x.record_count > 0
                )
            elif snap["operation"] in _APPEND_OPS:
                n = sum(
                    1
                    for a in t._added_entries(snap)
                    if a.content == DATA and a.record_count > 0
                )
            else:
                n = 0
            if n > budget and end != start:
                break  # budget exhausted: hold the offset back
            budget -= n
            end = snap["snapshot_id"]
            if budget <= 0:
                break
        self._last_planned = end
        return {"snapshot_id": end}

    def _chain(self, t: Table, start: int, end: int) -> list[dict]:
        if start == 0:
            # full history: walk the parent chain from `end` to the root
            chain = t._ancestor_chain(self._root_of(t, end), end)
            root = next(
                s for s in t.meta["snapshots"]
                if s["snapshot_id"] == self._root_of(t, end)
            )
            return [root, *chain]
        return t._ancestor_chain(start, end)

    @staticmethod
    def _root_of(t: Table, end: int) -> int:
        by_id = {s["snapshot_id"]: s for s in t.meta["snapshots"]}
        cur = by_id[end]
        while True:
            pid = (
                cur["summary"].get("rolled-back-to")
                if cur["operation"] == "rollback"
                else cur["parent_id"]
            )
            if pid is None or pid not in by_id:
                return cur["snapshot_id"]
            cur = by_id[pid]

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = start["snapshot_id"], end["snapshot_id"]
        # self-heal the rate-limit walk after planning (e is what the
        # engine will checkpoint, so it is always a safe future seed)
        if self._last_planned is None or e > 0:
            self._last_planned = max(self._last_planned or 0, e)
        if s == e or e == 0:
            return []
        t = self._table()
        parts: list[IceliteFilePartition] = []
        chain = self._chain(t, s, e)
        if s == 0 and chain and chain[0]["operation"] not in _APPEND_OPS:
            # expired-history table: the oldest retained snapshot is a
            # rewrite/delete commit, so "files it added" would silently
            # drop the table's prior state. Its manifests carry the FULL
            # state — emit them all, refusing if live delete files exist
            # (raw data files would resurrect the rows they mask).
            root = chain[0]
            ents = t.entries(root["snapshot_id"])
            if any(x.content != DATA for x in ents):
                raise ValueError(
                    f"oldest retained snapshot {root['snapshot_id']} "
                    f"({root['operation']}) carries live delete files: "
                    "streaming its raw data files would resurrect deleted "
                    "rows. Compact (folds the marks in) or start from a "
                    "later snapshot."
                )
            parts.extend(
                IceliteFilePartition(t._abs(x.file_path), self.columns)
                for x in ents
                if x.record_count > 0
            )
            chain = chain[1:]
        for snap in chain:
            if snap["operation"] in _DELETE_OPS:
                if not self.skip_deletes:
                    raise ValueError(
                        f"snapshot {snap['snapshot_id']} is a "
                        f"{snap['operation']} commit: an append-only stream "
                        "cannot represent retractions. Set "
                        "skip_delete_snapshots=true to skip it, or consume "
                        "changelog_scan instead."
                    )
                continue
            if snap["operation"] not in _APPEND_OPS:
                continue
            added = t._added_entries(snap)
            dels = [a for a in added if a.content != DATA]
            if dels and not self.skip_deletes:
                raise ValueError(
                    f"snapshot {snap['snapshot_id']} added {len(dels)} delete "
                    "file(s): an append-only stream cannot represent "
                    "retractions. Set skip_delete_snapshots=true to stream "
                    "the inserts only, or consume changelog_scan instead."
                )
            parts.extend(
                IceliteFilePartition(t._abs(a.file_path), self.columns)
                for a in added
                if a.content == DATA and a.record_count > 0
            )
        return parts

    def read(self, partition: IceliteFilePartition) -> Iterator:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        yield from pf.iter_batches(columns=partition.columns)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to release


class IceliteDataSource(DataSource):
    """``format("icelite")`` — streaming reads over icelite tables."""

    @classmethod
    def name(cls) -> str:
        return "icelite"

    def schema(self) -> StructType:
        # resolve via Table.refresh (max version listing), never the
        # version hint — the hint is an advisory cache that can lag a
        # crash-interrupted commit or a schema evolution
        return Table(None, os.path.abspath(self.options["path"])).refresh().schema

    def streamReader(self, schema: StructType) -> IceliteStreamReader:
        return IceliteStreamReader(schema, dict(self.options))

    def reader(self, schema: StructType):
        raise NotImplementedError(
            "batch reads go through Table.scan (native parquet, "
            "delete-aware, codegen'd) — format('icelite') is the "
            "streaming source"
        )


def register(spark) -> None:
    spark.dataSource.register(IceliteDataSource)


def read_table_stream(spark, root: str, starting: str = "earliest",
                      skip_delete_snapshots: bool = False):
    """Convenience: register + readStream.load over a table root."""
    register(spark)
    return (
        spark.readStream.format("icelite")
        .option("path", root)
        .option("starting", starting)
        .option("skip_delete_snapshots", str(skip_delete_snapshots).lower())
        .load()
    )
