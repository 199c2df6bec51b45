"""Idempotent-writer transactions (the Iceberg/Delta txnAppId/txnVersion
pattern): a commit carrying (app_id, version) records the version ATOMICALLY
with the snapshot; a commit with version ≤ recorded skips. This is what makes
a foreachBatch streaming sink exactly-once — a micro-batch replayed after a
crash between commit and checkpoint (or after checkpoint loss with a
replayable feed) must not apply twice. MERGE is naturally idempotent per key;
APPEND is not, so the guard is load-bearing for `sync.append_stream`.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import Table
from olake_spark.sync import append_stream


@pytest.fixture()
def table(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "txn"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 60))
    return t


def _data_files(t):
    return {e.file_path for e in t.entries() if e.content == 0}


class TestTxnCommit:
    def test_append_replay_skips_and_leaves_no_orphans(self, spark, table):
        extra = datagen.gen_images_df(spark, 80).filter(
            "image_id >= 'img-000000000060'")
        r1 = table.append(extra, txn=("job-a", 1))
        assert not r1.get("skipped")
        files_after = _data_files(table)
        r2 = table.append(extra, txn=("job-a", 1))  # replay
        assert r2["skipped"] is True
        assert table.scan().count() == 80
        assert _data_files(table) == files_after  # nothing staged survives
        # and nothing orphaned on disk either: fast path skipped staging
        orphans = table.remove_orphan_files(grace_seconds=0)
        assert orphans == []

    def test_version_semantics(self, table, spark):
        mk = lambda lo, hi: datagen.gen_images_df(spark, hi).filter(
            f"image_id >= 'img-{lo:012d}'")
        table.append(mk(60, 70), txn=("job-b", 5))
        # lower AND equal versions skip; higher applies
        assert table.append(mk(70, 80), txn=("job-b", 4))["skipped"]
        assert table.append(mk(70, 80), txn=("job-b", 5))["skipped"]
        assert not table.append(mk(70, 80), txn=("job-b", 6)).get("skipped")
        assert table.scan().count() == 80
        # independent app ids don't interfere
        assert not table.append(mk(80, 90), txn=("job-c", 1)).get("skipped")

    def test_authoritative_check_is_in_commit_cas(self, spark, table):
        """Bypass the fast path: stage through _commit_snapshot directly with
        a stale pre-check, proving the in-CAS check cleans up staged files."""
        extra = datagen.gen_images_df(spark, 70).filter(
            "image_id >= 'img-000000000060'")
        table.append(extra, txn=("job-d", 1))
        seq = table.meta["last_sequence_number"] + 1
        entries = table._stage_write(extra, seq)
        staged = [table._abs(e.file_path) for e in entries]
        assert all(os.path.exists(p) for p in staged)
        r = table._commit_snapshot(
            "append", entries, seq_used=seq, txn=("job-d", 1))
        assert r["skipped"] is True
        assert not any(os.path.exists(p) for p in staged)
        assert table.scan().count() == 70

    def test_merge_replay_noop(self, spark, table):
        from olake_spark.operators.merge import merge_into

        changes = datagen.gen_changes_df(spark, base_n=60, n_changes=30)
        merge_into(table, changes, txn=("cdc-x", 0))
        expect = sorted(
            r["image_id"] for r in table.scan().select("image_id").collect())
        snaps_before = len(table.snapshots())
        r = merge_into(table, changes, txn=("cdc-x", 0))
        assert r["skipped"] is True
        assert len(table.snapshots()) == snaps_before
        got = sorted(
            r["image_id"] for r in table.scan().select("image_id").collect())
        assert got == expect


class TestAppendStream:
    def test_append_stream_and_replay_after_checkpoint_loss(
        self, spark, table, tmp_path
    ):
        feed = str(tmp_path / "feed")
        extra = datagen.gen_images_df(spark, 120).filter(
            "image_id >= 'img-000000000060'")
        extra.coalesce(2).write.parquet(feed)
        ckpt = str(tmp_path / "ckpt")
        stream = (
            spark.readStream.schema(datagen.IMAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        append_stream(table, stream, ckpt)
        assert table.scan().count() == 120
        # checkpoint loss + replayable feed = the classic duplication bug:
        # the txn guard turns every replayed batch into a skip
        shutil.rmtree(ckpt)
        stream2 = (
            spark.readStream.schema(datagen.IMAGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        append_stream(table, stream2, ckpt)
        assert table.scan().count() == 120
        assert table.scan().select(
            F.countDistinct("image_id")).collect()[0][0] == 120
