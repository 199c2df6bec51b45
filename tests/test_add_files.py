"""add_files (Iceberg AddFilesProcedure parity) — metadata-only import.

The roundtrip gate (`add_files_scan`) proves zero-copy + hive inference +
pos-deletes over external paths + migrating compaction against the DuckDB
oracle; these tests pin the guard rails: duplicate refusal, schema gate,
explicit-list form, txn idempotence, incremental-scan accounting, and
orphan reaping never reaching outside the table root.
"""

import os

import pytest

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table


N = 200


def _lake(spark, tmp_table_dir, n=N, subdir="lake"):
    d = os.path.join(tmp_table_dir, subdir)
    datagen.gen_images_df(spark, n).repartition(3).write.parquet(d)
    return d


def _table(spark, tmp_table_dir, spec=None):
    return Table.create(
        spark,
        os.path.join(tmp_table_dir, "images"),
        datagen.IMAGES_SCHEMA,
        spec or PartitionSpec(()),
        identifier_fields=("image_id",),
    )


def _files(d):
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


class TestAddFiles:
    def test_zero_copy_and_scan(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        snap = t.add_files(lake)
        assert snap["summary"]["added-files-by-reference"] == len(_files(lake))
        # no bytes moved: every entry points at the lake, data/ stays empty
        assert all(e.file_path.startswith(lake) for e in t.entries())
        assert _files(os.path.join(t.root, "data")) == [] or not os.path.isdir(
            os.path.join(t.root, "data")
        )
        assert t.scan().count() == N
        assert t.total_records() == N

    def test_explicit_file_list(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        t.add_files(_files(lake)[:2])
        assert len([e for e in t.entries()]) == 2

    def test_duplicate_refused_then_forced(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        t.add_files(lake)
        with pytest.raises(ValueError, match="already referenced"):
            t.add_files(lake)
        # appended rows are unaffected by the refusal
        assert t.scan().count() == N

    def test_schema_gate(self, spark, tmp_table_dir):
        d = os.path.join(tmp_table_dir, "badlake")
        datagen.gen_images_df(spark, 10).drop("phash").write.parquet(d)
        t = _table(spark, tmp_table_dir)
        with pytest.raises(ValueError, match="missing table columns"):
            t.add_files(d)

    def test_txn_idempotent(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        t.add_files(lake, txn=("app", 1))
        skipped = t.add_files(lake, check_duplicate_files=False, txn=("app", 1))
        assert skipped.get("skipped")
        assert t.scan().count() == N

    def test_txn_replay_race_never_deletes_external_files(
        self, spark, tmp_table_dir
    ):
        """A replayed import that loses the in-CAS txn check (pre-staging
        _txn_applied raced past a concurrent commit) must NOT physically
        delete the user's external source files — the engine never deletes
        files it didn't write (round-3 ADVICE defect: the skip-path cleanup
        removed every `added` path, including by-reference absolute ones)."""
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        t.add_files(lake, txn=("app", 1))
        files_before = _files(lake)
        # force the race window: pre-staging check passes, CAS check fires
        t._txn_applied = lambda txn: None
        try:
            skipped = t.add_files(
                lake, check_duplicate_files=False, txn=("app", 1)
            )
        finally:
            del t._txn_applied
        assert skipped.get("skipped")
        assert _files(lake) == files_before  # external bytes untouched
        assert t.scan().count() == N

    def test_incremental_scan_counts_import(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        base = t.append(datagen.gen_images_df(spark, 10))
        t.add_files(lake)
        inc = t.incremental_scan(base["snapshot_id"])
        assert inc.count() == N

    def test_orphan_reap_never_reaches_outside_root(self, spark, tmp_table_dir):
        lake = _lake(spark, tmp_table_dir)
        t = _table(spark, tmp_table_dir)
        t.add_files(lake)
        before = _files(lake)
        # drop the import from metadata entirely, then reap aggressively:
        # the external files are unreferenced but NOT under the root — the
        # engine must not delete what it didn't write
        t.append(datagen.gen_images_df(spark, 10))
        t.rewrite_files({e.file_path for e in t.entries() if e.file_path.startswith(lake)}, [], op="compact")
        t.expire_snapshots(keep_last=1)
        t.remove_orphan_files(grace_seconds=0.0)
        assert _files(lake) == before
