"""Table→table replication: per-key collapse edge cases and exactly-once
batch application (the streaming end-to-end path is the oracled gate row
`mirror_table_scan`; these pin the apply kernel)."""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionSpec, Table
from olake_spark.streaming.mirror import apply_changelog_batch


@pytest.fixture()
def dst(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "dst"), datagen.IMAGES_SCHEMA,
        PartitionSpec(()), identifier_fields=("image_id",),
    )
    t.append(
        datagen.gen_images_df(spark, 6).withColumn(
            "caption", F.lit("old")
        )
    )
    return t


def _batch(spark, rows):
    """rows: (image_id, caption|None, change_type, snapshot_id)."""
    base = datagen.gen_images_df(spark, 6).collect()
    by_id = {r["image_id"]: r.asDict() for r in base}
    out = []
    for iid, cap, kind, sid in rows:
        d = dict(by_id[iid])
        if kind == "delete" and cap is None:
            d = {k: (v if k == "image_id" else None) for k, v in d.items()}
        else:
            d["caption"] = cap
        d["_change_type"] = kind
        d["_commit_snapshot_id"] = sid
        out.append(d)
    from pyspark.sql.types import (IntegerType, LongType, StringType,
                                   StructField, StructType)

    schema = StructType(
        list(datagen.IMAGES_SCHEMA.fields)
        + [StructField("_change_type", StringType()),
           StructField("_commit_snapshot_id", LongType())]
    )
    return spark.createDataFrame(out, schema)


def _caps(t):
    return {
        r["image_id"]: r["caption"]
        for r in t.scan(columns=["image_id", "caption"]).collect()
    }


def test_per_key_collapse_rules(spark, dst):
    k = [f"img-{i:012d}" for i in range(6)]
    batch = _batch(spark, [
        # upsert pair at one commit: insert outranks its own delete
        (k[0], None, "delete", 5), (k[0], "v5", "insert", 5),
        # chain across commits: newest commit wins
        (k[1], "v5", "insert", 5), (k[1], None, "delete", 6),
        (k[1], "v6", "insert", 6),
        # bare delete at the newest commit removes the row
        (k[2], "v5", "insert", 5), (k[2], None, "delete", 7),
        # stale insert then later bare delete: gone
        (k[3], "v4", "insert", 4), (k[3], None, "delete", 9),
        # untouched key k[4]/k[5]: keeps the pre-existing 'old' caption
    ])
    apply_changelog_batch(dst, batch)
    dst.refresh()
    caps = _caps(dst)
    assert caps[k[0]] == "v5"
    assert caps[k[1]] == "v6"
    assert k[2] not in caps and k[3] not in caps
    assert caps[k[4]] == "old" and caps[k[5]] == "old"
    assert len(caps) == 4


def test_replayed_batch_is_noop(spark, dst):
    k = "img-000000000000"
    batch = _batch(spark, [(k, "v1", "insert", 5)])
    apply_changelog_batch(dst, batch, txn=("mir", 0))
    dst.refresh()
    n = len(dst.snapshots())
    res = apply_changelog_batch(dst, batch, txn=("mir", 0))  # crash replay
    assert res.get("skipped")
    dst.refresh()
    assert len(dst.snapshots()) == n
    assert _caps(dst)[k] == "v1"


def test_delete_only_batch(spark, dst):
    k = "img-000000000001"
    batch = _batch(spark, [(k, None, "delete", 5)])
    apply_changelog_batch(dst, batch)
    dst.refresh()
    assert k not in _caps(dst)
    assert len(_caps(dst)) == 5


def test_bootstrap_into_empty_dst_writes_no_delete_files(spark,
                                                         tmp_table_dir):
    """The first batch of a fresh mirror (full base state as inserts) has
    nothing to retract: no equality-delete files may be written, or a
    10^9-row bootstrap would tax every scan with a table-sized
    reconciliation join that deletes nothing."""
    from olake_spark.icelite.table import EQ_DELETES

    fresh = Table.create(
        spark, os.path.join(tmp_table_dir, "fresh"), datagen.IMAGES_SCHEMA,
        PartitionSpec(()), identifier_fields=("image_id",),
    )
    batch = _batch(spark, [
        (f"img-{i:012d}", "boot", "insert", 3) for i in range(6)
    ])
    apply_changelog_batch(fresh, batch)
    fresh.refresh()
    assert len(_caps(fresh)) == 6
    assert not [e for e in fresh.entries() if e.content == EQ_DELETES]
    # a non-empty destination keeps retracting as before
    apply_changelog_batch(
        fresh, _batch(spark, [("img-000000000000", "v2", "insert", 4)])
    )
    fresh.refresh()
    assert _caps(fresh)["img-000000000000"] == "v2"
    assert [e for e in fresh.entries() if e.content == EQ_DELETES]


def test_catchup_rate_bounded_converges(spark, tmp_table_dir):
    """Catch-up bound (module docstring's replication-lag model): a mirror
    started against a large committed backlog with max_files_per_batch must
    (a) split the backlog into multiple rate-bounded micro-batches instead
    of swallowing it whole, (b) keep every post-bootstrap batch O(delta) —
    bounded by the file cap, never by destination size — and (c) converge
    to the source's exact state."""
    from pyspark.sql import functions as F

    from olake_spark.streaming.mirror import mirror_table_stream

    src = Table.create(
        spark, os.path.join(tmp_table_dir, "csrc"), datagen.IMAGES_SCHEMA,
        PartitionSpec(()), identifier_fields=("image_id",),
    )
    # backlog: one 120-row bootstrap commit + six small upsert commits
    src.append(datagen.gen_images_df(spark, 120), max_records_per_file=30)
    for i in range(6):
        upd = (
            datagen.gen_images_df(spark, 120)
            .filter(F.substring("image_id", -1, 1).isin(str(i), str(i + 1)))
            .withColumn("caption", F.lit(f"v{i}"))
            .coalesce(1)
        )
        src.row_delta(upd, upd.select("image_id"))

    dst = Table.create(
        spark, os.path.join(tmp_table_dir, "cdst"), datagen.IMAGES_SCHEMA,
        PartitionSpec(()), identifier_fields=("image_id",),
    )
    q = mirror_table_stream(
        spark, src.root, dst.root,
        os.path.join(tmp_table_dir, "cckpt"),
        trigger={"processingTime": "0 seconds"},
        max_files_per_batch=3,
    )
    q.processAllAvailable()
    q.stop()

    dst.refresh()
    src.refresh()
    cols = ["image_id", "caption"]
    assert {tuple(r) for r in dst.scan(columns=cols).collect()} == \
        {tuple(r) for r in src.scan(columns=cols).collect()}
    snaps = dst.meta["snapshots"]
    # 6 upsert commits at ~2 changelog files each under a 3-file budget
    # cannot fit one batch; the bootstrap commit plans whole (atomic unit)
    assert len(snaps) >= 4, f"backlog not split: {len(snaps)} batches"
    boot = int(snaps[0]["summary"]["added-records"])
    assert boot == 120  # bootstrap carries the base state once
    for s in snaps[1:]:
        # inserts + retraction keys for <= cap files' worth of commits —
        # far below the 120-row table (O(delta), not O(table))
        assert int(s["summary"]["added-records"]) <= 48, s["summary"]


def test_checkpoint_freshness_is_conservative_for_remote_schemes(tmp_path):
    """initial_batch_bounded is only safe on a checkpoint KNOWN fresh; a
    URI-form checkpoint (hdfs:, s3a:) cannot be probed locally, so the
    mirror must treat it as possibly-restarting and keep the unbounded
    first batch. os.path.exists on such a URI is always False — the bug
    this pins made every RESTART of a remote-checkpoint mirror bounded."""
    from olake_spark.streaming.mirror import _checkpoint_known_fresh

    missing = tmp_path / "not-there"
    present = tmp_path / "there"
    present.mkdir()
    assert _checkpoint_known_fresh(str(missing)) is True
    assert _checkpoint_known_fresh(f"file://{missing}") is True
    assert _checkpoint_known_fresh(str(present)) is False
    assert _checkpoint_known_fresh(f"file://{present}") is False
    for remote in ("hdfs://nn/ck", "s3a://bucket/ck", "abfss://c@a/ck"):
        assert _checkpoint_known_fresh(remote) is False
