"""Manifest rewrite with per-file min/max column stats (north_star:
"manifest rewrite with per-file min/max column stats").

The reference gets per-file stats for free from Iceberg's
GenericAppenderFactory metrics config (IcebergUtil.java:234-253) and never
reorganizes manifests. At 10^12-image scale manifest organization IS the
planning bottleneck: a scan that must read every manifest to prune by
partition or phash range pays O(total files). This operator:

1. groups the current snapshot's live entries by partition value, ordered by
   (partition, min phash), and packs them into manifests of ≈`target_entries`
   — so partition pruning touches only the manifests of matching partitions
   and phash-range pruning benefits from clustered min/max runs;
2. optionally **audits** stats by re-reading parquet footers (driver-side
   pyarrow, no data read) and comparing against manifest values — the
   verification demanded by SURVEY.md §7 step 7;
3. commits a metadata-only snapshot: identical file set, new manifest list
   (readers pinned to the old snapshot are untouched).
"""

from __future__ import annotations

import json

from olake_spark.icelite.stats import footer_stats
from olake_spark.icelite.table import DATA, FileEntry, Table


def rewrite_manifests(
    table: Table, target_entries: int = 1000, audit: bool = False
) -> dict:
    table.refresh()
    entries = table.entries()
    if not entries:
        return {"manifests_before": 0, "manifests_after": 0, "entries": 0}
    snap = table.snapshot()
    n_before = len(snap["manifests"])

    audited = 0
    if audit:
        for e in entries:
            if e.content != DATA:
                continue
            st = footer_stats(table._abs(e.file_path))
            if st["record_count"] != e.record_count:
                raise AssertionError(
                    f"manifest stats drift for {e.file_path}: "
                    f"rows {e.record_count} != footer {st['record_count']}"
                )
            for col, lo in st["mins"].items():
                if col in e.mins and json.dumps(e.mins[col], default=str) != json.dumps(
                    lo, default=str
                ):
                    raise AssertionError(
                        f"min({col}) drift for {e.file_path}: {e.mins[col]} != {lo}"
                    )
            audited += 1

    def sort_key(e: FileEntry):
        ph = e.mins.get("phash")
        return (
            json.dumps(e.partition, sort_keys=True),
            e.content,
            ph if isinstance(ph, int) else 0,
            e.file_path,
        )

    ordered = sorted(entries, key=sort_key)
    groups: list[list[FileEntry]] = []
    cur_part = object()
    for e in ordered:
        pj = json.dumps(e.partition, sort_keys=True)
        if pj != cur_part or len(groups[-1]) >= target_entries:
            groups.append([])
            cur_part = pj
        groups[-1].append(e)

    def build(meta: dict) -> dict:
        new_manifests = [table._new_manifest(g) for g in groups]
        snap_id = meta["last_snapshot_id"] + 1
        new = dict(meta)
        new["last_snapshot_id"] = snap_id
        new["current_snapshot_id"] = snap_id
        new["snapshots"] = meta["snapshots"] + [
            table._snapshot_dict(
                meta,
                snap_id,
                meta["last_sequence_number"],
                "rewrite-manifests",
                new_manifests,
                {
                    "manifests-before": n_before,
                    "manifests-after": len(new_manifests),
                    "entries": len(entries),
                },
            )
        ]
        return new

    table._commit(build)
    return {
        "manifests_before": n_before,
        "manifests_after": len(groups),
        "entries": len(entries),
        "audited": audited,
    }
