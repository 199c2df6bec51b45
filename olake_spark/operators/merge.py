"""MERGE INTO — CDC upsert/delete apply with equality-delete reconciliation.

Mirrors the reference's write path end-to-end (SURVEY.md §2.3/§2.4 A1/§2.9):

1. **Change envelope** — rows carry `_op_type` ∈ {r,c,u,d} + `_cdc_timestamp`
   (+ `_olake_timestamp`), the OLake RawRecord shape
   (types/data_types.go:60-66). Mongo-style deletes carry the key only
   (drivers/mongodb/internal/cdc.go:81-84).
2. **Batch pre-dedup (A1)** — one surviving row per key: max by
   (`_cdc_timestamp`, then op priority INSERT < READ < UPDATE < DELETE),
   replicating IcebergTableOperator.java:70-141's concurrent hash-merge as a
   window `row_number()` — the idiomatic-Spark rendition.
3. **Delete-before-insert** — an equality delete is emitted for EVERY
   surviving key, even inserts, so duplicates from backfill/CDC overlap die
   (BaseDeltaTaskWriter.java:50-61); data files are written for non-delete
   survivors; both commit in ONE atomic row-delta snapshot
   (RowDelta.addRows/addDeletes, IcebergTableOperator.java:219-281).
4. **Reconciliation join** — readers anti-join data against equality deletes
   at scan time (icelite Table._apply_deletes): Spark picks broadcast-hash
   for small delete sets (we hint `broadcast()` under a row threshold) and
   sort-merge for large — the north star's "broadcast-or-sort-merge join
   against equality-delete reconciliation".
5. **keep-deletes tombstones** — with `keep_deletes=True` (the reference's
   `upsert-keep-deletes`, destination/iceberg/iceberg_utils.go:180), deleted
   rows are retained as tombstones with `_op_type='d'`; requires the target
   table schema to carry the metadata columns.

Scale notes: the dedup window shuffles once on the key (map-side partial via
AQE); no target-table read happens at merge time at all — the cost of a merge
is O(|changes|), independent of table size, exactly like the reference's
delta writer. The reconciliation cost is paid (and then erased) by
compaction, which materializes deletes and drops the delete files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olake_spark.checkpoint import MaintenanceLog
from olake_spark.icelite.table import Table

# op priority: INSERT < READ < UPDATE < DELETE
# (IcebergTableOperator.java:70-141's OperationPriority)
_OP_PRIORITY = {"c": 1, "r": 2, "u": 3, "d": 4}

META_COLS = ("_op_type", "_cdc_timestamp", "_olake_timestamp")


def op_priority_col(op_col: str = "_op_type"):
    c = F.col(op_col)
    expr = F.lit(0)
    for op, p in _OP_PRIORITY.items():
        expr = F.when(c == op, p).otherwise(expr)
    return expr


def dedup_changes(changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """A1: one row per key — latest `_cdc_timestamp`, ties broken by op
    priority (DELETE beats UPDATE beats READ beats INSERT), then by a hash
    of the full row: a (key, ts, op) collision with different payloads still
    resolves to the SAME winner on every evaluation/plan (the reference's
    concurrent hash-merge leaves that case arbitrary)."""
    hashable = [
        f.name for f in changes.schema.fields if f.dataType.typeName() != "binary"
    ]
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("_cdc_timestamp").desc(),
        op_priority_col().desc(),
        F.xxhash64(*[F.col(c) for c in hashable]).desc(),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_into(
    table: Table,
    changes: DataFrame,
    keep_deletes: bool | None = None,
    job_id: str | None = None,
    log: MaintenanceLog | None = None,
    allow_partial: bool | set[str] | list[str] | tuple[str, ...] = False,
    evolve: bool = False,
    txn: tuple[str, int] | None = None,
) -> dict:
    """Apply a CDC change batch to the table in one atomic snapshot.

    `txn` = (app_id, version): idempotent-writer transaction — a replayed
    micro-batch (foreachBatch crash between commit and checkpoint) is a
    provable no-op because the version is recorded atomically with the
    RowDelta commit and checked inside the CAS.

    `changes` must contain the table's identifier fields, the table's data
    columns (nullable for deletes), `_op_type` and `_cdc_timestamp`.
    Returns the commit's snapshot dict.

    `keep_deletes=None` resolves the table property `upsert-keep-deletes`
    (the reference's name AND default — iceberg_utils.go:180 defaults true).
    The reference can always honor it because its sink schema always carries
    the metadata columns; here a table opts in by carrying `_op_type`, so the
    unset-property default is "true iff the schema can express tombstones".
    An explicit property (or argument) is honored strictly — `true` on a
    schema without `_op_type` raises.
    """
    keys = table.identifier_fields
    if not keys:
        raise ValueError("merge_into requires identifier fields (append-only table)")
    table_cols = [f.name for f in table.schema.fields]
    if keep_deletes is None:
        prop = table.meta["properties"].get("upsert-keep-deletes")
        if prop is not None:
            keep_deletes = str(prop).lower() == "true"
        else:
            keep_deletes = "_op_type" in table_cols

    missing_keys = [k for k in keys if k not in changes.columns]
    if missing_keys:
        raise ValueError(f"change batch lacks identifier fields {missing_keys}")
    # `evolve`: the reference's schema-drift handling — a batch carrying NEW
    # columns union-by-names them into the table before the write
    # (updateSchema().unionByNameWith, IcebergTableOperator.java:153-166);
    # a type conflict goes through the promotion lattice (legal in-place
    # widenings only). Without evolve, unknown batch columns are dropped by
    # the projection below (the pre-round-3 contract).
    if evolve:
        from pyspark.sql.types import StructField, StructType

        known = set(table_cols) | set(META_COLS)
        extra = [
            StructField(f.name, f.dataType, True)
            for f in changes.schema.fields
            if f.name not in known
        ]
        conflicts = [
            f
            for f in changes.schema.fields
            if f.name in table_cols
            and f.dataType != table.schema[f.name].dataType
        ]
        if extra or conflicts:
            table.evolve_schema(StructType(extra + conflicts))
            table_cols = [f.name for f in table.schema.fields]
    # merge is delete-before-insert (full-row replacement): a batch missing a
    # data column would overwrite that column with NULL table-wide. That must
    # be a loud error on upstream schema drift, and a deliberate choice when
    # the caller opted in. `allow_partial` is either True (waive the guard
    # entirely) or the exact SET of columns allowed to be missing —
    # apply_cdc_stream passes its P7 exclusion set, so drift on any
    # NON-excluded column still raises instead of null-filling table-wide.
    missing_data = [
        f.name for f in table.schema.fields if f.name not in changes.columns
    ]
    if missing_data and allow_partial is not True:
        allowed = set(allow_partial) if allow_partial else set()
        drifted = [c for c in missing_data if c not in allowed]
        if drifted:
            raise ValueError(
                f"change batch lacks table columns {drifted}; pass "
                f"allow_partial=True (or include them in the allowed-missing "
                f"set) to null-fill them deliberately"
            )
    survivors = dedup_changes(changes, keys)

    # partial-column batches (P7 exclusion / sparse CDC payloads) null-fill
    # the table columns they don't carry — only the keys are mandatory
    present = set(survivors.columns)
    proj = [
        F.col(f.name) if f.name in present
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in table.schema.fields
    ]

    # delete-before-insert: every surviving key gets an equality delete
    delete_keys = survivors.select(*keys)

    if keep_deletes:
        # every survivor is written — deletes become tombstone rows (key +
        # _op_type='d', data columns already nulled by the mongo key-only
        # delete mapping); requires the metadata columns in the table schema
        if "_op_type" not in table_cols:
            raise ValueError("keep_deletes needs _op_type in the table schema")
        data = survivors.select(*proj)
    else:
        data = survivors.filter(F.col("_op_type") != "d").select(*proj)

    snap = table.row_delta(data, delete_keys, txn=txn)
    if log is not None and job_id is not None and not snap.get("skipped"):
        log.log_done(
            job_id,
            "merge",
            {
                "chunk_id": f"merge-{snap.get('snapshot_id')}",
                "rows": snap["summary"].get("added-records", 0),
                "snapshot_after": snap.get("snapshot_id"),
            },
        )
    return snap


def apply_changes_oracle(base: DataFrame, changes: DataFrame, key_cols: list[str]) -> DataFrame:
    """Reference semantics computed independently of the table format —
    the oracle our tests compare a post-merge scan against:

        expected = (base rows whose key has no surviving change)
                 ∪ (surviving non-delete change rows)
    """
    survivors = dedup_changes(changes, key_cols)
    kept = base.join(survivors.select(*key_cols), on=key_cols, how="left_anti")
    applied = survivors.filter(F.col("_op_type") != "d").select(*base.columns)
    return kept.unionByName(applied)
