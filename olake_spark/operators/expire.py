"""Snapshot expiry + orphan-file reaping (north_star: "snapshot expiry with
orphan-file reaping").

The reference leans on Iceberg's retention procedures; here the semantics are
re-implemented over icelite metadata (SURVEY.md §7 step 6):

- `expire_snapshots`: drop snapshot entries older than the retention window
  (always keeping the current snapshot and the newest `keep_last`). Metadata
  only — instant, atomic.
- `remove_orphan_files`: diff the physical listing under data/ deletes/
  metadata/manifests/ against the union of files referenced by RETAINED
  snapshots; delete unreferenced files older than `grace_seconds` (files
  inside the grace window may belong to an in-flight, not-yet-committed
  write — never touch them).

At deployment scale the physical listing is a distributed object-store list
job; the reconciliation is the same set difference.
"""

from __future__ import annotations

from olake_spark.checkpoint import MaintenanceLog
from olake_spark.icelite.table import Table


def run_expire(
    table: Table,
    keep_last: int | None = None,  # None → table retention properties
    older_than_ms: int | None = None,
    grace_seconds: float = 0.0,
    reap_orphans: bool = True,
    dry_run: bool = False,
    job_id: str | None = None,
    log: MaintenanceLog | None = None,
) -> dict:
    expired = table.expire_snapshots(keep_last=keep_last, older_than_ms=older_than_ms)
    orphans: list[str] = []
    if reap_orphans:
        orphans = table.remove_orphan_files(grace_seconds=grace_seconds, dry_run=dry_run)
    out = {
        "snapshots_expired": expired["expired"],
        "orphans_removed": 0 if dry_run else len(orphans),
        "orphans_found": len(orphans),
    }
    if log is not None and job_id is not None:
        log.log_done(
            job_id,
            "expire",
            {
                "chunk_id": f"expire-{table.current_snapshot_id}",
                "rows": out["snapshots_expired"],
                "bytes_out": out["orphans_removed"],
                "snapshot_after": table.current_snapshot_id,
            },
        )
    return out
