"""Live table→table replication: tail a source table's streaming CHANGELOG
and apply it to a destination table as keyed row-deltas — the reference's
whole program (replicate an OLTP source into Iceberg, backfill then CDC,
olake.go / protocol sync verb) re-expressed with both ends being tables.

    q = mirror_table_stream(spark, src_root, dst_root, ckpt)

Shape:
  * Source: ``format("icelite") mode=changelog`` — the initial micro-batch
    carries the full base state as inserts (bootstrap ≙ backfill), later
    batches carry only deltas (≙ CDC tailing); rewrites on the source are
    invisible, so maintenance there never re-replicates rows.
  * Apply: one ``row_delta`` per micro-batch — equality-deletes for EVERY
    key the batch touches (replaced or deleted), data files for the new
    row versions, committed atomically with ``txn=(app, batchId)`` so a
    replayed batch is a no-op (exactly-once, same as the sinks).
  * Within-batch collapse: a key may appear several times (an upsert is a
    delete+insert pair at one commit; later commits supersede earlier
    ones). The winner is picked by (commit snapshot id, insert-over-delete
    at the same commit) — delete-then-insert IS the upsert order, so the
    insert wins its own pair, while a bare delete (no paired insert) wins
    and removes the row.

Scale: per batch the work is O(changed rows) — the window dedup keys on
the identifier (one shuffle of the delta, never the table), and row_delta
writes only the delta's files. The destination stays independently
maintainable (compact/cluster/expire run there on their own schedule).

Replication-lag model (catch-up bound): with a backlog of F source files
across K commits and ``max_files_per_batch = m``, a mirror started on a
FRESH checkpoint converges in at most K batches and at least ceil(F/m) —
each batch bundles whole commits until the m-file budget is spent (a
snapshot is the atomic unit: one over-budget commit still plans whole, so
a batch reads at most max(m, largest-single-commit) files). Per batch the
cost is that bounded file read + one delta shuffle + one atomic commit,
independent of destination size; steady-state lag is one trigger interval
plus one such batch. Source rewrites add zero batches (the changelog
skips them), so maintenance on the source never stalls catch-up. One
engine-imposed exception: a mirror RESTARTED from an existing checkpoint
runs its first batch unbounded — Spark shows the source neither the
checkpoint nor the initial offset before asking for the latest one — and
bounding resumes from batch two (IceliteStreamReader.__init__ has the
full rationale). (tests/test_mirror.py::test_catchup_rate_bounded_converges)
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from olake_spark.icelite.table import Table
from olake_spark.streaming.table_source import read_table_stream


def apply_changelog_batch(dst: Table, batch_df, txn=None) -> dict:
    """Collapse one changelog micro-batch to its per-key outcome and apply
    it as a single atomic row-delta. Returns the commit dict."""
    keys = list(dst.identifier_fields)
    if not keys:
        raise ValueError("mirror destination needs identifier_fields")
    # rank: newer commit wins; within one commit the insert half of an
    # upsert pair outranks its delete half
    rank = (
        F.col("_commit_snapshot_id") * 2
        + F.when(F.col("_change_type") == "insert", 1).otherwise(0)
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(rank))
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    latest = latest.localCheckpoint(eager=True)  # plan once, use thrice
    data_cols = [
        f.name for f in dst.schema.fields
    ]
    inserts = (
        latest.filter(F.col("_change_type") == "insert").select(*data_cols)
    )
    # a truly empty destination (no snapshot yet — the bootstrap batch of a
    # fresh mirror) has nothing to retract: skip the equality-delete files
    # entirely, or the bootstrap would write a table-sized key file set that
    # deletes nothing and taxes every scan until the next purge
    touched_keys = (
        None if dst.current_snapshot_id is None else latest.select(*keys)
    )
    return dst.row_delta(
        inserts if not inserts.isEmpty() else None,
        touched_keys if touched_keys is not None and not touched_keys.isEmpty()
        else None,
        txn=txn,
    )


def _checkpoint_known_fresh(ck: str) -> bool:
    """True only when we can POSITIVELY see the checkpoint is absent.
    Local paths (and file: URIs) are checked on disk; any other scheme
    (hdfs:, s3a:, ...) is unverifiable from here, so the answer is False —
    the mirror then keeps Spark's mandatory unbounded first batch rather
    than risk a bounded initial on what may be a RESTART (the one
    configuration table_source.py documents as unsafe)."""
    import os
    from urllib.parse import urlparse

    parsed = urlparse(ck)
    if parsed.scheme == "":
        return not os.path.exists(ck)
    if parsed.scheme == "file":
        return not os.path.exists(parsed.path)
    return False


def mirror_table_stream(spark, src_root: str, dst_root: str,
                        checkpoint: str, app: str = "icelite-mirror",
                        trigger: dict | None = None,
                        max_files_per_batch: int = 0):
    """Start the replication query. The destination must exist with the
    source's schema and identifier fields (create it or clone an empty
    shell first). max_files_per_batch bounds how many source files one
    micro-batch may plan (whole commits only — see the module docstring's
    catch-up model); because the mirror owns the checkpoint it can tell a
    fresh start from a restart, so the bound covers the very first batch
    on fresh checkpoints and a RESTARTED mirror keeps Spark's mandatory
    unbounded first batch (see IceliteStreamReader.__init__)."""
    feed = read_table_stream(
        spark, src_root, mode="changelog",
        max_files_per_batch=max_files_per_batch,
        initial_batch_bounded=bool(max_files_per_batch)
        and _checkpoint_known_fresh(checkpoint),
    )

    def apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dst = Table.load(spark, dst_root)
        apply_changelog_batch(dst, batch_df, txn=(app, batch_id))

    return (
        feed.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
