"""icelite as a Structured Streaming SOURCE — Iceberg's Spark streaming
read (``spark.readStream.format("iceberg")``) re-expressed through PySpark
4's Python Data Source API.

    spark.dataSource.register(IceliteDataSource)
    feed = (spark.readStream.format("icelite")
                 .option("path", table_root)
                 .option("starting", "earliest")   # | "latest" | "<snap id>"
                 .load())

``option("stream_from_timestamp_ms", <ms>)`` is Iceberg's
``stream-from-timestamp``: start the feed at the first retained snapshot
committed at or after that wall-clock time (before the oldest → from the
beginning; after the newest → empty until new commits arrive). Mutually
exclusive with ``starting``.

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

``option("mode", "changelog")`` turns the feed delete-aware (the streaming
counterpart of :meth:`Table.changelog_scan`): every change commit emits its
added data files as ``_change_type='insert'`` rows, its positional-delete
files as FULL before-image ``'delete'`` rows (the referenced parent files
are read executor-side and the marked ordinals taken — pure pyarrow, no
Spark job, bounded by the files the commit touched), and its equality-delete
files as KEYED ``'delete'`` rows (identifier columns populated, the rest
null — the reference's Mongo CDC delete envelope is key-only the same way,
cdc.go:81-84; full eq-delete before-images need the batch read's
parent-snapshot join). Rows carry ``_commit_snapshot_id``; rewrites remain
invisible; the mode never refuses delete snapshots.

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

from olake_spark.icelite.table import DATA, EQ_DELETES, POS_DELETES, Table

_APPEND_OPS = ("append", "rowdelta", "stage-append", "cherrypick", "clone")
# retraction-carrying commits (merge-on-read DELETE / UPDATE): refused by
# default; with skip_delete_snapshots=true the WHOLE snapshot is skipped —
# an overwrite's data files are rewritten copies of existing rows, emitting
# them would duplicate the feed (Iceberg skips them the same way)
_DELETE_OPS = ("delete", "overwrite")


class IceliteFilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str], col_types: list[str]):
        self.path = path
        self.columns = columns
        self.col_types = col_types  # Spark simpleString per column


class IceliteChangePartition(InputPartition):
    """One changelog work unit: an added data file (kind='insert'), an added
    equality-delete key file (kind='delete_keys'), or an added
    positional-delete file (kind='delete_pos' — resolved against the
    referenced parent data files executor-side). Holds only plain values."""

    def __init__(self, kind: str, path: str, root: str, snap_id: int,
                 columns: list[str], col_types: list[str],
                 key_cols: list[str]):
        self.kind = kind
        self.path = path
        self.root = root
        self.snap_id = snap_id
        self.columns = columns
        self.col_types = col_types  # Spark simpleString per column
        self.key_cols = key_cols


def _pa_type(spark_simple: str):
    """Spark simpleString → CANONICAL pyarrow type. Batch columns are cast
    to this (see :func:`_target_schema`) so by-reference files from other
    writers (timestamp[ns], large_list, ...) surface uniformly; declared
    types this mapping cannot express (struct/map/nested) keep the file's
    own arrow type, and only then must the column be file-supplied."""
    import pyarrow as pa

    s = spark_simple.strip()
    if s.startswith("array<") and s.endswith(">"):
        return pa.list_(_pa_type(s[len("array<"):-1]))
    if s.startswith("decimal(") and s.endswith(")"):
        prec, scale = s[len("decimal("):-1].split(",")
        return pa.decimal128(int(prec), int(scale))
    m = {
        "string": pa.string(), "bigint": pa.int64(), "int": pa.int32(),
        "smallint": pa.int16(), "tinyint": pa.int8(),
        "double": pa.float64(), "float": pa.float32(),
        "boolean": pa.bool_(), "binary": pa.binary(),
        "date": pa.date32(), "timestamp": pa.timestamp("us", tz="UTC"),
    }
    if s not in m:
        raise ValueError(
            f"changelog stream: no arrow mapping for column type "
            f"{spark_simple!r}"
        )
    return m[s]


def _target_schema(file_schema, columns: list[str], col_types: list[str],
                   extra_fields=()):
    """Arrow schema for an output batch. Primitive columns are normalized
    to the CANONICAL arrow type for the declared Spark type (so a
    by-reference file written by another writer — e.g. imported
    real-Iceberg parquet carrying timestamp[ns] — is cast to what the
    source declared, not shipped raw); columns whose declared type
    :func:`_pa_type` cannot express (struct/map/nested) take the file's own
    arrow type, which parquet supplies natively; missing columns are
    null-backfilled at the canonical type."""
    import pyarrow as pa

    have = set(file_schema.names) if file_schema is not None else set()
    fields = []
    for c, t in zip(columns, col_types):
        try:
            fields.append(pa.field(c, _pa_type(t)))
        except ValueError:
            if c not in have:
                raise  # cannot synthesize a null column of this type
            fields.append(file_schema.field(c))
    return pa.schema(fields + list(extra_fields))


class IceliteStreamReader(DataSourceStreamReader):
    """Driver-side planning over table metadata; executor-side Arrow reads.

    Holds only plain strings/ints (the reader object is pickled to
    executors for ``read``); a metadata-only :class:`Table` view is opened
    per driver call — Table carries an RLock and must never ride along.
    """

    def __init__(self, schema: StructType, options: dict):
        self.root = os.path.abspath(options["path"])
        self.changelog = (
            str(options.get("mode", "append")).lower() == "changelog"
        )
        self.starting = options.get("starting", "earliest")
        self.from_ts: int | None = None
        if options.get("stream_from_timestamp_ms") is not None:
            if "starting" in options:
                raise ValueError(
                    "stream_from_timestamp_ms and starting are mutually "
                    "exclusive — pick one way to anchor the stream"
                )
            self.from_ts = int(options["stream_from_timestamp_ms"])
        self.skip_deletes = (
            str(options.get("skip_delete_snapshots", "false")).lower() == "true"
        )
        self.columns = [
            f.name for f in schema.fields
            if f.name not in ("_change_type", "_commit_snapshot_id")
        ]
        t = self._table()
        by_name = {f.name: f.dataType.simpleString() for f in t.schema.fields}
        missing = [c for c in self.columns if c not in by_name]
        if missing:
            raise ValueError(
                f"stream schema column(s) {missing} not in the table schema "
                f"({sorted(by_name)}) — the icelite source reads the table's "
                "own schema; drop the explicit .schema(...) or evolve the "
                "table first"
            )
        self.col_types = [by_name[c] for c in self.columns]
        self.key_cols = list(t.identifier_fields)
        if self.changelog and not self.key_cols:
            raise ValueError(
                "mode=changelog needs identifier_fields on the table "
                "(equality-delete retractions are keyed rows)"
            )
        # rate limit (Iceberg's streaming-max-files-per-micro-batch): cap
        # how many data files one micro-batch may plan. Applied by holding
        # latestOffset back to the last snapshot that fits the budget, so
        # each batch stays a clean snapshot range and the checkpoint
        # contract is untouched. 0 = unbounded.
        self.max_files = int(options.get("max_files_per_batch", 0))
        # rate-limit walk state. The engine calls latestOffset() BEFORE
        # initialOffset() even on a fresh query (constructNextBatch precedes
        # runBatch, which is where batch 0's start is resolved), and on a
        # checkpoint restart the committed offset is recovered engine-side
        # and never shown to latestOffset() at all — so at the first
        # latestOffset() call, fresh and restarted streams are
        # indistinguishable. The safe default is therefore an UNBOUNDED
        # first batch (to current), with bounding resuming once the walk is
        # seeded: anchoring that first walk at the stream's `starting`
        # position would, after a restart, plan an offset BEHIND the
        # checkpoint — Spark then calls partitions(ckpt, older) and the
        # ancestor walk raises on every retry, wedging the query (and any
        # end offset behind the checkpoint re-emits committed rows).
        #
        # option("initial_batch_bounded", true) opts into bounding the
        # FIRST batch too, for callers that KNOW the checkpoint is fresh
        # (they own its lifecycle — e.g. the table mirror checks the
        # checkpoint dir before setting this). Never set it on a query that
        # may be restarting from an existing checkpoint.
        self.bounded_initial = (
            str(options.get("initial_batch_bounded", "false")).lower()
            == "true"
        )
        self._last_planned: int | None = None

    def _table(self) -> Table:
        # metadata-only view: snapshots / manifests / chain walks never
        # touch the SparkSession, so none is needed (or available) here
        return Table(None, self.root).refresh()

    def initialOffset(self) -> dict:
        off = self._anchor()
        self._last_planned = off["snapshot_id"]  # fresh query: safe seed
        return off

    def _anchor(self) -> dict:
        """The stream's declared starting offset (pure — no walk-state
        mutation): initialOffset() seeds the rate-limit walk from it, and
        an `initial_batch_bounded` latestOffset() anchors there when the
        engine asks for an offset before ever resolving batch 0's start."""
        if self.from_ts is not None:
            # Iceberg stream-from-timestamp: the offset is the NEWEST
            # retained lineage snapshot committed strictly before T, so the
            # feed carries every commit with timestamp >= T. No such
            # snapshot (T predates retained history) → from the beginning;
            # every snapshot older than T → start at current (empty until
            # the next commit).
            t = self._table()
            cur = t.current_snapshot_id or 0
            off = {"snapshot_id": 0}
            if cur:
                before = [
                    s for s in self._chain(t, 0, cur)
                    if s["timestamp_ms"] < self.from_ts
                ]
                if before:
                    off = {"snapshot_id": before[-1]["snapshot_id"]}
        elif self.starting == "earliest":
            off = {"snapshot_id": 0}
        elif self.starting == "latest":
            off = {"snapshot_id": self._table().current_snapshot_id or 0}
        else:
            off = {"snapshot_id": int(self.starting)}
        return off

    def latestOffset(self) -> dict:
        t = self._table()
        cur = t.current_snapshot_id or 0
        if not self.max_files or cur == 0:
            return {"snapshot_id": cur}
        start = self._last_planned
        if start is None:
            if self.bounded_initial and self.starting != "latest":
                # caller vouched the checkpoint is fresh: anchor the walk
                # at the declared start so even batch 0 is budget-bounded
                # (the catch-up case — a large committed backlog). A
                # "latest" stream is excluded: its anchor is call-time
                # dependent — a commit racing between this call and the
                # engine's later initialOffset() would put batch 0's start
                # AHEAD of a bounded end — and its backlog is empty by
                # definition, so there is nothing to bound.
                start = self._anchor()["snapshot_id"]
            else:
                # checkpoint offset unknown (could be a restart) — the
                # first batch runs unbounded; see __init__'s rationale
                self._last_planned = cur
                return {"snapshot_id": cur}
        if start == cur:
            return {"snapshot_id": cur}
        budget = self.max_files
        end = start
        for i, snap in enumerate(self._chain(t, start, cur)):
            if start == 0 and i == 0:
                # chain root when streaming from earliest: partitions()
                # always bootstraps it from its FULL entries() state (its
                # parent may be expired — see _bootstrap)
                n = sum(
                    1
                    for x in t.entries(snap["snapshot_id"])
                    if x.content == DATA and x.record_count > 0
                )
            elif snap["operation"] in _APPEND_OPS or (
                self.changelog and snap["operation"] in _DELETE_OPS
            ):
                # count every file this snapshot will plan in the active
                # mode: data files always; delete files too in changelog
                # mode (each becomes a retraction partition there)
                n = sum(
                    1
                    for a in t._added_entries(snap)
                    if a.record_count > 0
                    and (self.changelog or a.content == DATA)
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
    def _bootstrap(t: Table, s: int, chain: list[dict]):
        """Split the chain for a from-earliest stream: the root snapshot's
        state can NEVER be derived from manifest diffs — its parent is gone
        (either it truly has none, or expiry removed it, in which case
        ``_added_entries`` silently returns the FULL live state and would
        mis-attribute older commits' rows AND their delete files to the
        root). So the root is always emitted as a full-state bootstrap from
        ``entries()`` — refused when live delete files exist, because raw
        data files would resurrect the rows they mask — and only the rest
        of the chain goes through per-commit diff planning.

        Returns ``(root_snap_or_None, bootstrap_entries, remaining_chain)``.
        """
        if s != 0 or not chain:
            return None, [], chain
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
        return root, [x for x in ents if x.record_count > 0], chain[1:]

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
        if self.changelog:
            return self._changelog_partitions(t, s, e)
        parts: list[IceliteFilePartition] = []
        _, boot, chain = self._bootstrap(t, s, self._chain(t, s, e))
        parts.extend(
            IceliteFilePartition(
                t._abs(x.file_path), self.columns, self.col_types
            )
            for x in boot
        )
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
                IceliteFilePartition(
                    t._abs(a.file_path), self.columns, self.col_types
                )
                for a in added
                if a.content == DATA and a.record_count > 0
            )
        return parts

    def _changelog_partitions(
        self, t: Table, s: int, e: int
    ) -> Sequence[InputPartition]:
        """The delete-aware feed: every append-class, delete, or overwrite
        commit in (s, e] contributes its added data files as inserts, its
        added equality-delete files as keyed retractions, and its added
        positional-delete files as full before-image retractions (resolved
        against the referenced parent files executor-side). Rewrites are
        skipped — bytes move, logical rows don't. Divergence from the batch
        changelog_scan (documented): equality-delete retractions carry the
        KEY columns with other columns null — the reference's Mongo CDC
        delete envelope is key-only too (cdc.go:81-84); full before-images
        for eq-deletes need the batch read (parent-snapshot join)."""
        parts: list[IceliteChangePartition] = []

        def mk(kind: str, path: str, snap_id: int) -> IceliteChangePartition:
            return IceliteChangePartition(
                kind, path, self.root, snap_id,
                self.columns, self.col_types, self.key_cols,
            )

        root, boot, chain = self._bootstrap(t, s, self._chain(t, s, e))
        if root is not None:
            parts.extend(
                mk("insert", t._abs(x.file_path), root["snapshot_id"])
                for x in boot
            )
        change_ops = _APPEND_OPS + _DELETE_OPS
        for snap in chain:
            if snap["operation"] not in change_ops:
                continue  # rewrites: invisible
            sid = snap["snapshot_id"]
            added, removed = t._entry_diff(snap)
            if any(r.content == DATA for r in removed):
                raise ValueError(
                    f"snapshot {sid} replaced whole partitions "
                    "(overwrite_partitions): its retractions are the "
                    "removed files' rows AT THE PARENT SNAPSHOT (older "
                    "deletes applied), which this metadata-only stream "
                    "cannot materialize exactly. Read the window with "
                    "Table.changelog_scan instead."
                )
            for a in added:
                if a.record_count == 0:
                    continue
                if a.content == DATA:
                    parts.append(mk("insert", t._abs(a.file_path), sid))
                elif a.content == EQ_DELETES:
                    parts.append(mk("delete_keys", t._abs(a.file_path), sid))
                elif a.content == POS_DELETES:
                    parts.append(mk("delete_pos", t._abs(a.file_path), sid))
        return parts

    def read(self, partition) -> Iterator:
        if isinstance(partition, IceliteChangePartition):
            yield from _read_change_partition(partition)
            return
        yield from _padded_batches(
            partition.path, partition.columns, partition.col_types
        )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing to release




def _padded_batches(path: str, columns: list[str],
                    col_types: list[str]) -> "Iterator":
    """Stream a parquet file's batches projected to `columns` — columns the
    file predates (added by schema evolution after it was written) are
    null-backfilled, matching Table.scan's spark.read.schema() behavior,
    instead of failing the stream on the first pre-evolution file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    have = set(pf.schema_arrow.names)
    avail = [c for c in columns if c in have]
    if avail == columns:
        yield from pf.iter_batches(columns=columns)
        return
    target = _target_schema(pf.schema_arrow, columns, col_types)
    for b in pf.iter_batches(columns=avail):
        by = {c: b.column(i) for i, c in enumerate(b.schema.names)}
        yield pa.RecordBatch.from_arrays(
            [
                by[f.name].cast(f.type)
                if f.name in by
                else pa.nulls(b.num_rows, f.type)
                for f in target
            ],
            schema=target,
        )


def _read_change_partition(p: "IceliteChangePartition") -> "Iterator":
    """Executor-side changelog materialization — pure pyarrow, no Spark.

    insert:      stream the data file's batches, append the change columns.
    delete_keys: stream the equality-delete key file; key columns populated,
                 every other column null (keyed retraction).
    delete_pos:  read the (file_path, pos) marks, group by referenced file,
                 take those row ordinals from each parent data file — full
                 before-image retractions. Work is bounded by the files the
                 commit actually touched.
    """
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    extra = [pa.field("_change_type", pa.string()),
             pa.field("_commit_snapshot_id", pa.int64())]
    # target is derived from the file actually being read (nested/decimal
    # columns keep their native parquet types); only columns the file lacks
    # — null-backfilled — go through _pa_type. delete_pos resolves against
    # parent data files, so its target comes from the first parent.
    target: "pa.Schema | None" = None

    def out_batch(cols_by_name: dict, n: int, kind: str) -> pa.RecordBatch:
        arrays = []
        for f in target:
            if f.name == "_change_type":
                arrays.append(pa.array([kind] * n, f.type))
            elif f.name == "_commit_snapshot_id":
                arrays.append(pa.array([p.snap_id] * n, f.type))
            elif f.name in cols_by_name:
                arrays.append(cols_by_name[f.name].cast(f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.RecordBatch.from_arrays(arrays, schema=target)

    if p.kind == "insert":
        # out_batch null-pads columns the file predates (schema evolution)
        pf = pq.ParquetFile(p.path)
        have = set(pf.schema_arrow.names)
        target = _target_schema(pf.schema_arrow, p.columns, p.col_types, extra)
        for b in pf.iter_batches(columns=[c for c in p.columns if c in have]):
            yield out_batch(
                {c: b.column(i) for i, c in enumerate(b.schema.names)},
                b.num_rows, "insert",
            )
    elif p.kind == "delete_keys":
        pf = pq.ParquetFile(p.path)
        target = _target_schema(pf.schema_arrow, p.columns, p.col_types, extra)
        for b in pf.iter_batches(columns=p.key_cols):
            yield out_batch(
                {c: b.column(i) for i, c in enumerate(b.schema.names)},
                b.num_rows, "delete",
            )
    elif p.kind == "delete_pos":
        marks = pq.read_table(p.path, columns=["file_path", "pos"])
        by_file: dict[str, list[int]] = {}
        for fp, pos in zip(
            marks.column("file_path").to_pylist(),
            marks.column("pos").to_pylist(),
        ):
            by_file.setdefault(fp, []).append(pos)
        for fp, positions in sorted(by_file.items()):
            ref = fp if _os.path.isabs(fp) else _os.path.join(p.root, fp)
            ref_schema = pq.ParquetFile(ref).schema_arrow
            if target is None:
                target = _target_schema(ref_schema, p.columns, p.col_types,
                                        extra)
            have = set(ref_schema.names)
            rows = pq.read_table(
                ref, columns=[c for c in p.columns if c in have]
            ).take(sorted(positions))
            yield out_batch(
                {c: rows.column(c).combine_chunks() for c in rows.schema.names},
                rows.num_rows, "delete",
            )
    else:  # pragma: no cover
        raise ValueError(f"unknown change partition kind {p.kind!r}")


class IceliteDataSource(DataSource):
    """``format("icelite")`` — streaming reads over icelite tables."""

    @classmethod
    def name(cls) -> str:
        return "icelite"

    def schema(self) -> StructType:
        # resolve via Table.refresh (max version listing), never the
        # version hint — the hint is an advisory cache that can lag a
        # crash-interrupted commit or a schema evolution
        base = Table(
            None, os.path.abspath(self.options["path"])
        ).refresh().schema
        if str(self.options.get("mode", "append")).lower() == "changelog":
            from pyspark.sql.types import (LongType, StringType, StructField,
                                           StructType as _St)

            return _St(
                list(base.fields)
                + [StructField("_change_type", StringType(), False),
                   StructField("_commit_snapshot_id", LongType(), False)]
            )
        return base

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
                      skip_delete_snapshots: bool = False,
                      mode: str = "append",
                      from_timestamp_ms: int | None = None,
                      max_files_per_batch: int = 0,
                      initial_batch_bounded: bool = False):
    """Convenience: register + readStream.load over a table root.
    mode="changelog" streams the delete-aware CDC feed (rows +
    _change_type + _commit_snapshot_id) instead of the append-only one;
    from_timestamp_ms anchors the stream at wall-clock time instead of
    `starting` (Iceberg's stream-from-timestamp); max_files_per_batch > 0
    rate-limits each micro-batch to whole snapshots summing to at most that
    many source files (a single over-budget snapshot still plans whole —
    snapshots are the atomic unit). By engine necessity the FIRST batch of
    a (re)started query runs unbounded — Spark shows latestOffset neither
    the checkpoint nor the initial offset — unless initial_batch_bounded
    is set, which is safe ONLY when the checkpoint is known fresh (see
    IceliteStreamReader.__init__)."""
    register(spark)
    if from_timestamp_ms is not None and starting != "earliest":
        raise ValueError(
            "from_timestamp_ms and starting are mutually exclusive — "
            "pick one way to anchor the stream"
        )
    r = (
        spark.readStream.format("icelite")
        .option("path", root)
        .option("skip_delete_snapshots", str(skip_delete_snapshots).lower())
        .option("mode", mode)
    )
    if max_files_per_batch:
        r = r.option("max_files_per_batch", int(max_files_per_batch))
        if initial_batch_bounded:
            r = r.option("initial_batch_bounded", "true")
    if from_timestamp_ms is not None:
        r = r.option("stream_from_timestamp_ms", int(from_timestamp_ms))
    else:
        r = r.option("starting", starting)
    return r.load()
