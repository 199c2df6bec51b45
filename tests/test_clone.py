"""Zero-copy clone (Iceberg `snapshot` procedure parity) tests.

The clone references the source's files by absolute path with zero data
bytes copied; it is independently writable/maintainable and can never harm
the source (the engine only physically deletes files under its own root).
"""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table, snapshot_table
from olake_spark.icelite.table import DATA, EQ_DELETES, POS_DELETES
from olake_spark.operators.compact import run_compaction

N = 240
NUM = "cast(substring(image_id, 5, 12) as bigint)"  # image_id = 'img-%012d'


def _ids(t, **kw):
    return {int(r[0][4:]) for r in t.scan(columns=["image_id"], **kw).collect()}


def _disk_listing(root):
    out = {}
    for d, _, files in os.walk(root):
        for f in files:
            p = os.path.join(d, f)
            out[p] = os.path.getmtime(p), os.path.getsize(p)
    return out


@pytest.fixture()
def src(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "src"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, N), max_records_per_file=40)
    # leave BOTH delete kinds live in the cloned snapshot
    t.row_delta(None, t.spark.createDataFrame(
        [(f"img-{i:012d}",) for i in range(0, N, 7)], ["image_id"]
    ))                                   # equality deletes (i % 7 == 0)
    t.delete_where(f"{NUM} % 11 = 3")    # positional deletes
    return t


def test_clone_scan_equals_source(spark, src, tmp_table_dir):
    dest = snapshot_table(src, os.path.join(tmp_table_dir, "dest"))
    assert _ids(dest) == _ids(src)
    # full-row equality, not just ids
    a = {tuple(r) for r in src.scan(columns=["image_id", "caption", "w", "h"]).collect()}
    b = {tuple(r) for r in dest.scan(columns=["image_id", "caption", "w", "h"]).collect()}
    assert a == b


def test_clone_copies_zero_data_bytes(spark, src, tmp_table_dir):
    dest = snapshot_table(src, os.path.join(tmp_table_dir, "dest"))
    data_dir = os.path.join(dest.root, "data")
    assert not any(files for _, _, files in os.walk(data_dir))
    ents = dest.entries()
    assert all(
        os.path.isabs(e.file_path) for e in ents if e.content in (DATA, EQ_DELETES)
    )
    # pos-delete files were remapped + rewritten into the clone's root
    assert all(
        not os.path.isabs(e.file_path) for e in ents if e.content == POS_DELETES
    )


def test_clone_mutations_do_not_touch_source(spark, src, tmp_table_dir):
    dest = snapshot_table(src, os.path.join(tmp_table_dir, "dest"))
    before_disk = _disk_listing(src.root)
    before_ids = _ids(src)

    # delete inside a cloned (source-owned) file — pos-delete remap at work
    dest.delete_where(f"{NUM} % 5 = 1")
    # equality delete via row_delta ordering: must kill cloned rows too
    dest.row_delta(None, spark.createDataFrame([("img-%012d" % 2,)], ["image_id"]))
    # compaction migrates survivors into clone-owned layout
    run_compaction(dest, "clone-compact", fill_ratio=1.0)
    dest.expire_snapshots(keep_last=1)
    dest.remove_orphan_files(grace_seconds=0)

    expect = {
        i for i in before_ids if i % 5 != 1 and i != 2
    }
    assert _ids(dest) == expect
    # after compaction every live file is clone-owned
    assert all(not os.path.isabs(e.file_path) for e in dest.entries())
    # the source is byte-identical on disk and scans the same
    assert _disk_listing(src.root) == before_disk
    assert _ids(src) == before_ids


def test_clone_seq_ordering_preserved(spark, src, tmp_table_dir):
    """Cloned eq-deletes keep masking only data files they preceded: a new
    append to the clone gets a HIGHER seq than every cloned delete."""
    dest = snapshot_table(src, os.path.join(tmp_table_dir, "dest"))
    # re-insert an id killed by a cloned equality delete (i % 7 == 0)
    dest.append(datagen.gen_images_df(spark, 1))  # img-...000 (i=0)
    assert 0 in _ids(dest)
    assert 0 not in _ids(src)


def test_clone_of_empty_table(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "e"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    dest = snapshot_table(t, os.path.join(tmp_table_dir, "e2"))
    assert dest.current_snapshot_id is None
    assert dest.scan().count() == 0
