"""Zero-copy table clone — Iceberg's `snapshot` procedure
(SnapshotTableProcedure): create a NEW independent table whose first
snapshot references the source's current data files by absolute path,
copying ZERO data bytes.

Semantics mirrored from Iceberg:
  * The clone is fully writable and maintainable — deletes, upserts,
    compaction, clustering all work. Rewrites migrate rows into files the
    clone OWNS (under its root) and simply drop the by-reference entries;
    like `add_files` imports, the engine never physically deletes a file it
    didn't write, so the source table is never harmed by any clone
    operation (the GC-hazard rule Iceberg documents for snapshot tables).
  * Per-entry sequence numbers are preserved and the clone's
    last_sequence_number starts at the source's, so merge-on-read delete
    ordering (equality deletes kill strictly-older files) keeps meaning
    exactly what it meant in the source — a delete committed to the clone
    applies to every cloned row, and cloned equality deletes keep masking
    only the cloned data files they preceded.
  * Positional-delete files are the one thing physically re-written (they
    are metadata-sized, not data-sized): their `file_path` row-identity keys
    are source-root-relative, but the clone scans those same data files by
    ABSOLUTE path, so each pos-delete file is remapped rel→abs and written
    into the clone's own deletes/ directory. Equality-delete files carry
    only key values — they are referenced by absolute path like data files.

Scale: the whole operation is one manifest read + one pos-delete rewrite
(driver-side pyarrow over the small delete files) + one metadata commit —
O(live files) metadata work, independent of table data size, exactly like
the reference procedure.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import replace

import pyarrow.parquet as pq

from .fileio import FileIO
from .table import DATA, EQ_DELETES, POS_DELETES, FileEntry, Table


def snapshot_table(
    src: Table,
    dest_root: str,
    io: FileIO | None = None,
    properties: dict[str, str] | None = None,
) -> Table:
    """Clone `src`'s current snapshot into a new table at `dest_root`."""
    src.refresh()
    src_root = os.path.abspath(src.root)

    def abs_key(k: str) -> str:
        return k if os.path.isabs(k) else os.path.join(src_root, k)

    dest = Table.create(
        src.spark,
        dest_root,
        src.schema,
        partition_spec=src.spec,
        identifier_fields=tuple(src.identifier_fields),
        sort_order=tuple(src.sort_order),
        properties={
            **src.meta["properties"],
            **(properties or {}),
            "snapshot-source": src_root,
        },
        io=io or src.io,
    )
    if src.current_snapshot_id is None:
        return dest  # empty source: empty clone

    entries: list[FileEntry] = []
    for e in src.entries():
        if e.content in (DATA, EQ_DELETES):
            entries.append(replace(e, file_path=abs_key(e.file_path)))
        elif e.content == POS_DELETES:
            # remap row-identity keys to how the CLONE will tag those rows:
            # absolute for files outside the clone root (all cloned files)
            t = pq.read_table(src._abs(e.file_path))
            cols = t.to_pydict()
            cols["file_path"] = [abs_key(p) for p in cols["file_path"]]
            rel = os.path.join("deletes", f"posdel-clone-{uuid.uuid4().hex}.parquet")
            out = os.path.join(dest.root, rel)
            import pyarrow as pa

            pq.write_table(pa.table(cols, schema=t.schema), out)
            entries.append(
                replace(
                    e,
                    file_path=rel,
                    mins={**e.mins, "file_path": min(cols["file_path"], default=None)},
                    maxs={**e.maxs, "file_path": max(cols["file_path"], default=None)},
                )
            )
        else:  # pragma: no cover - future content kinds
            raise ValueError(f"snapshot_table: unknown content {e.content}")

    src_seq = src.meta["last_sequence_number"]
    dest._commit_snapshot(
        "clone",
        entries,
        seq_used=src_seq,
        extra_summary={
            "cloned-from": src_root,
            "cloned-snapshot-id": src.current_snapshot_id,
            "added-files-by-reference": sum(
                1 for e in entries if os.path.isabs(e.file_path)
            ),
        },
    )
    return dest.refresh()
