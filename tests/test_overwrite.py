"""Dynamic partition overwrite (Iceberg ReplacePartitions / INSERT
OVERWRITE): metadata-only delete side, untouched partitions intact,
changelog before-images, streaming refusal, txn replay no-op.
"""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table

NUM = "cast(substring(image_id, 5, 12) as bigint)"


def _ids(df):
    return {r[0] for r in df.select(F.expr(NUM)).collect()}


@pytest.fixture()
def tbl(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "imgs"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("fmt", "identity"),)),
        identifier_fields=("image_id",),
    )
    # ids 0..39: fmt='jpeg' when id%4==0, else 'png'
    t.append(datagen.gen_images_df(spark, 40), max_records_per_file=10)
    return t


def test_replaces_exactly_the_touched_partition(spark, tbl):
    jpeg_before = {
        e.file_path for e in tbl.entries()
        if e.partition.get("_p_fmt") == "jpeg"
    }
    repl = datagen.gen_images_df(spark, 40).filter(
        f"fmt = 'png' AND {NUM} < 6"
    ).withColumn("caption", F.lit("new"))
    res = tbl.overwrite_partitions(repl)
    assert res["partitions_replaced"] == 1
    assert res["removed_files"] > 0
    got = tbl.scan(columns=["image_id", "fmt", "caption"])
    # png partition = exactly the replacement rows (1,2,3,5 < 6, non-%4)
    png = got.filter("fmt = 'png'").collect()
    assert {r["image_id"][-2:] for r in png} == {"01", "02", "03", "05"}
    assert all(r["caption"] == "new" for r in png)
    # jpeg partition byte-identical (same files, same rows)
    assert {
        e.file_path for e in tbl.entries()
        if e.partition.get("_p_fmt") == "jpeg"
    } == jpeg_before
    assert got.filter("fmt = 'jpeg'").count() == 10


def test_unpartitioned_table_full_replace(spark, tmp_table_dir):
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "flat"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 30), max_records_per_file=10)
    t.overwrite_partitions(datagen.gen_images_df(spark, 5))
    assert _ids(t.scan()) == set(range(5))


def test_empty_replacement_is_a_noop(spark, tbl):
    res = tbl.overwrite_partitions(
        datagen.gen_images_df(spark, 40).filter("1 = 0")
    )
    assert res["removed_files"] == 0 and res["data_files"] == 0
    assert tbl.scan().count() == 40


def test_txn_replay_is_a_noop(spark, tbl):
    repl = datagen.gen_images_df(spark, 3)
    tbl.overwrite_partitions(repl, txn=("ovw-app", 7))
    before = tbl.current_snapshot_id
    res = tbl.overwrite_partitions(repl, txn=("ovw-app", 7))  # replay
    assert res.get("skipped")
    assert tbl.current_snapshot_id == before


def test_changelog_emits_exact_before_images(spark, tbl):
    # a row deleted BEFORE the overwrite must not reappear in the
    # retraction set: before-images are the parent-snapshot live rows
    tbl.delete_where(f"{NUM} = 1")  # a png row
    from_snap = tbl.current_snapshot_id
    repl = datagen.gen_images_df(spark, 40).filter(
        f"fmt = 'png' AND {NUM} < 4"
    )
    tbl.overwrite_partitions(repl)
    feed = tbl.changelog_scan(from_snap)
    dels = feed.filter("_change_type = 'delete'")
    ins = feed.filter("_change_type = 'insert'")
    # all 30 png rows were live except id 1 (deleted earlier): 29 retracted
    assert _ids(dels) == {
        i for i in range(40) if i % 4 != 0 and i != 1
    }
    assert _ids(ins) == {1, 2, 3}  # replacement rows (non-%4 under 4)
    # jpeg rows appear in neither direction
    assert dels.filter("fmt = 'jpeg'").count() == 0
    assert ins.filter("fmt = 'jpeg'").count() == 0


def test_streams_refuse_replace_partitions(spark, tbl, tmp_table_dir):
    from olake_spark.streaming import read_table_stream

    start = tbl.current_snapshot_id
    tbl.overwrite_partitions(
        datagen.gen_images_df(spark, 40).filter(f"fmt = 'png' AND {NUM} < 4")
    )

    def drain(tag, **kw):
        q = (
            read_table_stream(spark, tbl.root, starting=str(start), **kw)
            .writeStream.format("parquet")
            .option("path", os.path.join(tmp_table_dir, f"sink-{tag}"))
            .option(
                "checkpointLocation", os.path.join(tmp_table_dir, f"c-{tag}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(os.path.join(tmp_table_dir, f"sink-{tag}"))

    # append mode: a delete-class snapshot → refused by default
    with pytest.raises(Exception, match="delete|retraction"):
        drain("a")
    # changelog mode: retractions are parent-state rows this stream cannot
    # materialize — refused with a pointer at the batch feed
    with pytest.raises(Exception, match="changelog_scan|replaced whole"):
        drain("c", mode="changelog")
    # append mode with skip: the overwrite commit is skipped WHOLE (its
    # inserts too — Iceberg's streaming-skip-overwrite-snapshots rule) and
    # the stream continues past it to later appends
    tbl.append(
        datagen.gen_images_df(spark, 200).filter(f"{NUM} >= 100"),
        max_records_per_file=100,
    )
    got = drain("s", skip_delete_snapshots=True)
    assert _ids(got) == set(range(100, 200))


def test_truncate_is_metadata_only_and_time_travelable(spark, tbl):
    pre = tbl.current_snapshot_id
    res = tbl.truncate()
    assert res["removed_files"] > 0
    assert tbl.scan().count() == 0
    # time travel still sees the old rows; changelog retracts all 40
    assert tbl.scan(snapshot_id=pre).count() == 40
    feed = tbl.changelog_scan(pre)
    assert feed.filter("_change_type = 'delete'").count() == 40
    assert feed.filter("_change_type = 'insert'").count() == 0
    # idempotent on an empty table
    assert tbl.truncate()["removed_files"] == 0


def test_count_rows_manifest_fast_path_and_delete_fallback(spark, tbl):
    assert tbl.count_rows() == 40  # pure manifest arithmetic
    tbl.delete_where(f"{NUM} % 4 = 1")  # live pos-deletes → fallback
    assert tbl.count_rows() == tbl.scan().count() == 30


def test_mixed_layout_refused_until_compacted(spark, tbl):
    # spec evolution leaves old-layout files whose partition dicts the
    # new-layout matching cannot see — overwrite must refuse, and work
    # again once compaction migrated every file to the current spec
    from olake_spark.operators.compact import run_compaction

    tbl.update_spec(
        PartitionSpec((PartitionField("image_id", "bucket", 4),))
    )
    tbl.append(
        datagen.gen_images_df(spark, 50).filter(f"{NUM} >= 40"),
        max_records_per_file=10,
    )
    repl = datagen.gen_images_df(spark, 2)
    with pytest.raises(ValueError, match="single-layout|migrate"):
        tbl.overwrite_partitions(repl)
    run_compaction(tbl, "mig", fill_ratio=1.0)
    res = tbl.overwrite_partitions(repl)  # now every file is bucket-layout
    assert res["partitions_replaced"] >= 1


@pytest.mark.parametrize("validate", [False, True])
def test_concurrent_append_into_replaced_partition(spark, tmp_table_dir,
                                                   validate):
    """validate=False keeps a concurrently appended file (Iceberg's
    ReplacePartitions default window); validate=True is Iceberg's
    validateNoConflictingData — the CAS fails, the overwrite re-plans, and
    the replaced partition holds EXACTLY the replacement rows."""
    t = Table.create(
        spark, os.path.join(tmp_table_dir, f"race{validate}"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("fmt", "identity"),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 8))
    png_files_before = len(
        [e for e in t.entries() if e.partition.get("_p_fmt") == "png"]
    )
    t2 = Table.load(spark, t.root)

    real_create = t.io.atomic_create_json
    fired = {"done": False}

    def racing_create(target, meta):
        if not fired["done"] and "metadata.json" in target:
            fired["done"] = True
            # a png row (id 50 % 4 != 0) lands inside t's CAS window
            t2.append(
                datagen.gen_images_df(spark, 51).filter(f"{NUM} = 50")
            )
        return real_create(target, meta)

    t.io.atomic_create_json = racing_create
    try:
        res = t.overwrite_partitions(
            datagen.gen_images_df(spark, 3).filter("fmt = 'png'"),
            validate=validate,
        )
    finally:
        t.io.atomic_create_json = real_create
    t.refresh()
    png = _ids(t.scan().filter("fmt = 'png'"))
    if validate:
        assert png == {1, 2}  # conflict re-planned; intruder replaced too
        # the retry's removal plan covered the concurrent file as well
        assert res["removed_files"] == png_files_before + 1
    else:
        assert png == {1, 2, 50}  # default window: concurrent file kept
        assert res["removed_files"] == png_files_before


def test_validate_catches_concurrent_spec_evolution(spark, tmp_table_dir):
    """A concurrent spec evolution + append inside the CAS window writes a
    file whose partition keys cannot be matched by value at all —
    validate=True must conflict on it, and the re-plan then refuses the
    now-mixed-layout table loudly instead of replacing partially."""
    t = Table.create(
        spark, os.path.join(tmp_table_dir, "evorace"), datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("fmt", "identity"),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 8))
    t2 = Table.load(spark, t.root)

    real_create = t.io.atomic_create_json
    fired = {"done": False}

    def racing_create(target, meta):
        if not fired["done"] and "metadata.json" in target:
            fired["done"] = True
            t2.update_spec(
                PartitionSpec((PartitionField("image_id", "bucket", 4),))
            )
            t2.append(datagen.gen_images_df(spark, 51).filter(f"{NUM} = 50"))
        return real_create(target, meta)

    t.io.atomic_create_json = racing_create
    try:
        with pytest.raises(ValueError, match="single-layout|migrate"):
            t.overwrite_partitions(
                datagen.gen_images_df(spark, 3).filter("fmt = 'png'"),
                validate=True,
            )
    finally:
        t.io.atomic_create_json = real_create
    # nothing was replaced: the original rows AND the intruder all live
    t.refresh()
    assert _ids(t.scan()) == set(range(8)) | {50}
