"""Z-order / Hilbert clustering rewrite with salted repartitioning.

Generalizes the reference's clustered write (sort batch rows by partition
comparator so the writer holds one open file, IcebergTableOperator.java:303-344)
into a space-filling-curve layout rewrite. Two-pass plan, both passes sized
for 10^12-row tables:

1. **Boundary pass (cheap):** scan ONLY (phash, w, h) — the heavy `bytes`
   column is pruned at the parquet reader — compute the curve key with the
   vectorized Arrow kernel, and take equal-frequency boundaries via
   `approxQuantile` over a coarse `(key>>32)*16+salt` partitioning key.
   This replaces `repartitionByRange`'s sampling, which would evaluate the
   FULL child plan (bytes included) a second time.
2. **Rewrite pass (one full scan):** recompute the key, assign each row its
   partition id by binary-searching the literal boundary array (JVM-side
   `filter`+`size` over a small array), hash-shuffle on the id (identity
   assignment — ids are already range buckets), sort within partitions by
   (table partition, full curve key), write ≈target-sized files.

Salt: the coarse key appends 4 salt bits below the curve key, so rows with
IDENTICAL keys (the planted hot 0xBEEF phash prefix) straddle boundary
cuts and split across tasks, while global curve order is preserved to
coarse-key resolution. After the rewrite, per-file min/max of `phash`
tighten, so phash-range scans prune files (verified in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from olake_spark.checkpoint import MaintenanceLog
from olake_spark.functions.zorder import hilbert_key_col, zorder_key_col
from olake_spark.icelite.table import DATA, Table

SALT_BITS = 4  # 16 salt buckets inside each coarse key


def _coarse_key(ckey, salt):
    # top 31 bits of the curve key, salt in the low 4 bits: fits int64,
    # order-preserving at coarse resolution
    return F.shiftleft(F.shiftright(ckey, 32), SALT_BITS) + salt


def run_cluster_rewrite(
    table: Table,
    job_id: str,
    curve: str = "zorder",  # or "hilbert"
    log: MaintenanceLog | None = None,
    target_bytes: int | None = None,
    key_cols: tuple[str, str, str] = ("phash", "w", "h"),
    boundary_sample_rows: int = 1_000_000,
    verify: bool = False,
) -> dict:
    """Rewrite the whole table clustered by the chosen curve key."""
    table.refresh()
    if target_bytes is None:
        target_bytes = int(
            table.meta["properties"].get(
                "write.target-file-size-bytes", 512 * 1024 * 1024
            )
        )
    snap_before = table.current_snapshot_id
    entries = table.entries()
    data_entries = [e for e in entries if e.content == DATA]
    # rewrite guard: a delete committed after this pin must conflict, not be
    # silently out-raced by the re-sequenced rows (see Table._commit_snapshot)
    pinned_dels = {e.file_path for e in entries if e.content != DATA}
    if not data_entries:
        return {"files_in": 0, "files_out": 0, "rows": 0}
    total_bytes = sum(e.file_size_bytes for e in data_entries)
    total_rows = sum(e.record_count for e in data_entries)
    chunk_id = f"cluster-{curve}"
    if log is not None:
        if chunk_id in log.done_chunk_ids(job_id):
            return {"files_in": 0, "files_out": 0, "rows": 0, "skipped": True}
        log.log_planned(
            job_id, "cluster",
            [{"chunk_id": chunk_id, "rows": total_rows, "bytes_in": total_bytes}],
        )

    keyfn = zorder_key_col if curve == "zorder" else hilbert_key_col
    n_parts = max(1, math.ceil(total_bytes / target_bytes))
    avg_row = max(1, total_bytes // max(1, total_rows))
    per_file = max(1, target_bytes // avg_row)

    # ---- pass 1: boundaries from the pruned projection (never reads bytes)
    id_col = table.identifier_fields[0] if table.identifier_fields else key_cols[0]
    slim = table.scan(columns=[id_col, *key_cols])
    frac = min(1.0, boundary_sample_rows / max(1, total_rows))
    if frac < 1.0:
        slim = slim.sample(fraction=frac, seed=42)
    skey = _coarse_key(
        keyfn(*[F.col(c) for c in key_cols]),
        F.pmod(F.xxhash64(id_col), F.lit(1 << SALT_BITS)),
    )
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = (
        slim.select(skey.alias("_skey")).approxQuantile("_skey", probs, 0.001)
        if probs
        else []
    )

    # ---- pass 2: single full scan → deterministic bucket → shuffle → sort
    df = table.scan(with_partition_cols=False)
    if verify:
        from olake_spark.verify import inline_pixel_check

        df = inline_pixel_check(df)
    df = df.withColumn("_ckey", keyfn(*[F.col(c) for c in key_cols]))
    df = df.withColumn(
        "_skey",
        _coarse_key(F.col("_ckey"), F.pmod(F.xxhash64(id_col), F.lit(1 << SALT_BITS))),
    )
    if bounds:
        arr = ", ".join(str(int(b)) for b in bounds)
        df = df.withColumn(
            "_pid", F.expr(f"size(filter(array({arr}), b -> b <= _skey))")
        )
    else:
        df = df.withColumn("_pid", F.lit(0))
    spec = table.spec
    df = spec.apply(df)
    clustered = (
        df.repartition(n_parts, *[F.col(n) for n in spec.names], F.col("_pid"))
        .sortWithinPartitions(*spec.names, "_ckey")
        .drop("_ckey", "_skey", "_pid")
    )
    seq = table.meta["last_sequence_number"] + 1
    # sort_within_by=[]: the curve sort above IS this rewrite's file order —
    # the table's declared PK sort order must not override it
    added = table._stage_write(
        clustered, seq, max_records_per_file=per_file, sort_within_by=[]
    )
    snap = table.rewrite_files(
        {e.file_path for e in data_entries}, added, op="cluster",
        extra_summary={"job_id": job_id, "curve": curve}, seq_used=seq,
        known_delete_paths=pinned_dels,
    )
    if log is not None:
        log.log_done(
            job_id, "cluster",
            {"chunk_id": chunk_id, "rows": total_rows, "bytes_in": total_bytes,
             "bytes_out": sum(e.file_size_bytes for e in added),
             "snapshot_before": snap_before,
             "snapshot_after": snap.get("snapshot_id")},
        )
    return {
        "files_in": len(data_entries),
        "files_out": len(added),
        "rows": total_rows,
        "curve": curve,
    }
