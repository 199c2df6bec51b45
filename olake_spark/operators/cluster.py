"""Z-order / Hilbert clustering rewrite with salted repartitioning.

Generalizes the reference's clustered write (sort batch rows by partition
comparator so the writer holds one open file, IcebergTableOperator.java:303-344)
into a space-filling-curve layout rewrite:

    key = interleave(phash_top21, w, h)        (vectorized Arrow UDF)
    repartitionByRange(key, salt)              (salt = tiebreaker that splits
                                                identical hot keys — the 0xBEEF
                                                phash prefix — across tasks)
    sortWithinPartitions(partition_cols, key)
    rewrite files atomically

`repartitionByRange` samples the key distribution (equal-frequency
boundaries), which absorbs *distributional* skew; the salt handles the
degenerate case of one key value exceeding a task (identical phash dupes).
After the rewrite, per-file min/max of `phash` in the manifests become tight,
so phash-range scans prune files (verified in tests).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from olake_spark.checkpoint import MaintenanceLog
from olake_spark.functions.zorder import hilbert_key_col, zorder_key_col
from olake_spark.icelite.table import DATA, Table

SALT_BUCKETS = 16


def run_cluster_rewrite(
    table: Table,
    job_id: str,
    curve: str = "zorder",  # or "hilbert"
    log: MaintenanceLog | None = None,
    target_bytes: int | None = None,
    key_cols: tuple[str, str, str] = ("phash", "w", "h"),
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
    data_entries = [e for e in table.entries() if e.content == DATA]
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
    df = table.scan(with_partition_cols=False)
    df = df.withColumn("_ckey", keyfn(*[F.col(c) for c in key_cols]))
    # salt: splits identical hot keys across range partitions while preserving
    # global key order (salt only breaks ties within one key value)
    df = df.withColumn("_salt", F.pmod(F.xxhash64("image_id"), F.lit(SALT_BUCKETS)))
    # repartitionByRange's boundary-sampling pass would otherwise re-run the
    # scan + Arrow key UDF a second time; persist so keys are computed once
    # (at cluster scale: MEMORY_AND_DISK spills, or sample boundaries offline)
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)

    n_parts = max(1, math.ceil(total_bytes / target_bytes))
    avg_row = max(1, total_bytes // max(1, total_rows))
    per_file = max(1, target_bytes // avg_row)
    # range-partition by (table partition, key, salt): each task holds a
    # contiguous slice of ONE partition's curve — the writer's partitionBy
    # then opens ~one file per task instead of one per (task × partition)
    spec = table.spec
    df = spec.apply(df)
    range_cols = [F.col(n) for n in spec.names] + [F.col("_ckey"), F.col("_salt")]
    clustered = (
        df.repartitionByRange(n_parts, *range_cols)
        .sortWithinPartitions(*spec.names, "_ckey")
        .drop("_ckey", "_salt")
    )
    seq = table.meta["last_sequence_number"] + 1
    added = table._stage_write(clustered, seq, max_records_per_file=per_file)
    df.unpersist()
    snap = table.rewrite_files(
        {e.file_path for e in data_entries}, added, op="cluster",
        extra_summary={"job_id": job_id, "curve": curve}, seq_used=seq,
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
