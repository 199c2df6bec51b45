"""icelite Structured Streaming source (Python Data Source API) tests —
Iceberg SparkMicroBatchStream parity: snapshot-id offsets, append-class
delta per micro-batch, rewrite invisibility, delete-snapshot refusal,
checkpoint resume.
"""

import os

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction
from olake_spark.streaming import read_table_stream

NUM = "cast(substring(image_id, 5, 12) as bigint)"


@pytest.fixture()
def tbl(spark, tmp_table_dir):
    t = Table.create(
        spark,
        os.path.join(tmp_table_dir, "imgs"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 60), max_records_per_file=20)
    return t


def _drain(spark, root, ckpt, out_dir, **opts):
    """Run the feed to exhaustion into a parquet sink (the memory sink
    cannot recover from a checkpoint). Returns the CUMULATIVE sink
    DataFrame; callers assert count deltas across drains."""
    q = (
        read_table_stream(spark, root, **opts)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    try:
        return spark.read.parquet(out_dir)
    except Exception:  # sink dir never created: zero rows drained
        return spark.createDataFrame([], "image_id string")


def test_earliest_drains_full_history_and_resumes(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out).count() == 60
    # new append while the stream is down; resume from the SAME checkpoint
    tbl.append(datagen.gen_images_df(spark, 90), max_records_per_file=30)
    got = _drain(spark, tbl.root, ckpt, out)
    assert got.count() == 150  # +90: only the delta was re-read
    assert {r[0] for r in got.select(F.expr(NUM)).collect()} == set(range(90))


def test_rewrites_never_resurface_rows(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out).count() == 60
    run_compaction(tbl, "src-compact", fill_ratio=1.0)
    assert _drain(spark, tbl.root, ckpt, out).count() == 60  # no new rows


def test_starting_latest_sees_only_new_appends(spark, tbl, tmp_table_dir):
    ckpt = os.path.join(tmp_table_dir, "ckpt")
    out = os.path.join(tmp_table_dir, "sink")
    assert _drain(spark, tbl.root, ckpt, out, starting="latest").count() == 0
    tbl.append(datagen.gen_images_df(spark, 70), max_records_per_file=70)
    got = _drain(spark, tbl.root, ckpt, out, starting="latest")
    assert got.count() == 70


def test_delete_snapshot_fails_stream_by_default(spark, tbl, tmp_table_dir):
    tbl.delete_where(f"{NUM} % 3 = 0")
    with pytest.raises(Exception, match="delete|retraction|STREAM"):
        _drain(
            spark, tbl.root,
            os.path.join(tmp_table_dir, "c1"),
            os.path.join(tmp_table_dir, "s1"),
        )
    # Iceberg's streaming-skip-delete-snapshots escape hatch
    got = _drain(
        spark, tbl.root,
        os.path.join(tmp_table_dir, "c2"),
        os.path.join(tmp_table_dir, "s2"),
        skip_delete_snapshots=True,
    )
    assert got.count() == 60  # inserts only; retractions not representable


def test_schema_matches_table(spark, tbl, tmp_table_dir):
    feed = read_table_stream(spark, tbl.root)
    assert feed.schema == tbl.schema


def test_batch_read_refused(spark, tbl):
    from olake_spark.streaming import table_source

    table_source.register(spark)
    with pytest.raises(Exception, match="Table.scan|batch|NotImplemented"):
        spark.read.format("icelite").option("path", tbl.root).load().collect()


def test_max_files_per_batch_rate_limit(spark, tmp_table_dir):
    """Iceberg's streaming-max-files-per-micro-batch analogue: latestOffset
    is held back so no planned range exceeds the file budget; successive
    calls walk the history in bounded steps and converge on current."""
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "rl"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    for _ in range(4):
        t.append(datagen.gen_images_df(spark, 20), max_records_per_file=10)
    per_commit = len(t._added_entries(t.snapshot()))  # same every commit
    total = len([e for e in t.entries() if e.content == 0])

    # budget = one commit's files: each micro-batch plans exactly one commit
    r = IceliteStreamReader(
        t.schema, {"path": t.root, "max_files_per_batch": str(per_commit)}
    )
    seen_files = 0
    start = r.initialOffset()
    steps = 0
    while True:
        end = r.latestOffset()
        if end == start:
            break
        parts = r.partitions(start, end)
        assert len(parts) == per_commit
        seen_files += len(parts)
        start = end
        steps += 1
        assert steps < 10
    assert seen_files == total  # every file seen exactly once
    assert steps == 4  # genuinely chunked, one commit per batch
    assert end["snapshot_id"] == t.current_snapshot_id


def test_one_oversized_snapshot_still_fits_a_batch(spark, tmp_table_dir):
    # a single commit above the budget cannot be split: it must be planned
    # whole rather than stalling the stream
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "big"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 50), max_records_per_file=10)
    n_files = len([e for e in t.entries() if e.content == 0])
    assert n_files > 1
    r = IceliteStreamReader(t.schema, {"path": t.root, "max_files_per_batch": "1"})
    end = r.latestOffset()
    assert len(r.partitions(r.initialOffset(), end)) == n_files
    assert end["snapshot_id"] == t.current_snapshot_id


def test_restart_with_rate_limit_never_plans_backwards(spark, tmp_table_dir):
    """Checkpoint-restart regression: a fresh reader (no initialOffset
    call — Spark recovers the offset engine-side) must not hold
    latestOffset behind the checkpoint; the first batch runs unbounded,
    bounding resumes after."""
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "rs"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    snaps = []
    for _ in range(3):
        snaps.append(
            t.append(datagen.gen_images_df(spark, 10), max_records_per_file=10)
        )
    ckpt_offset = {"snapshot_id": snaps[1]["snapshot_id"]}  # mid-history

    r = IceliteStreamReader(
        t.schema, {"path": t.root, "max_files_per_batch": "1"}
    )
    # restart path: latestOffset BEFORE any initialOffset call
    end = r.latestOffset()
    assert end["snapshot_id"] == t.current_snapshot_id  # never behind ckpt
    parts = r.partitions(ckpt_offset, end)  # what Spark would plan
    assert len(parts) == len(t._added_entries(t.snapshot()))
    # bounding resumes for later batches
    t.append(datagen.gen_images_df(spark, 10), max_records_per_file=10)
    t.append(datagen.gen_images_df(spark, 10), max_records_per_file=10)
    nxt = r.latestOffset()
    assert nxt["snapshot_id"] != t.current_snapshot_id  # held back again


def test_initial_batch_bounded_opt_in(spark, tmp_table_dir):
    """The engine calls latestOffset() BEFORE initialOffset() even on a
    FRESH query (constructNextBatch precedes runBatch), so by default the
    first batch runs unbounded — the only restart-safe answer. A caller
    that KNOWS the checkpoint is fresh opts into bounding batch 0 with
    initial_batch_bounded=true: the walk anchors at the declared start and
    a committed backlog drains in budget-sized batches from the first."""
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "ib"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    for _ in range(4):
        t.append(datagen.gen_images_df(spark, 20), max_records_per_file=10)
    per_commit = len(t._added_entries(t.snapshot()))  # same every commit

    # default: first (unseeded) latestOffset jumps to current
    r = IceliteStreamReader(
        t.schema, {"path": t.root, "max_files_per_batch": str(per_commit)}
    )
    assert r.latestOffset()["snapshot_id"] == t.current_snapshot_id

    # opted in: bounded from the very first call, engine order respected
    r2 = IceliteStreamReader(
        t.schema, {"path": t.root, "max_files_per_batch": str(per_commit),
                   "initial_batch_bounded": "true"},
    )
    start = {"snapshot_id": 0}
    steps = []
    while True:
        end = r2.latestOffset()  # called before any initialOffset
        if end == start:
            break
        steps.append(len(r2.partitions(start, end)))
        start = end
        assert len(steps) < 10
    assert end["snapshot_id"] == t.current_snapshot_id
    # one commit per batch INCLUDING batch 0
    assert steps == [per_commit] * 4


def test_earliest_over_expired_history_streams_full_state(spark, tmp_table_dir):
    """An expired-history table whose oldest retained snapshot is a rewrite
    commit must stream its FULL state from earliest, not silently nothing."""
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "ex"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 60), max_records_per_file=15)
    run_compaction(t, "ex-compact", fill_ratio=1.0)
    t.expire_snapshots(keep_last=1)
    assert t.snapshot()["operation"] == "compact"  # root is a rewrite

    r = IceliteStreamReader(t.schema, {"path": t.root})
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    assert sum(1 for _ in parts) >= 1
    import pyarrow.parquet as pq

    total = sum(pq.ParquetFile(p.path).metadata.num_rows for p in parts)
    assert total == 60  # the full table state, exactly once

    # with live delete files in the root state, raw files would resurrect
    # deleted rows: must refuse loudly
    assert t.delete_where("w = 32")["rows_deleted"] > 0
    t2 = Table.load(spark, t.root)
    r2 = IceliteStreamReader(t2.schema, {"path": t2.root})
    t2.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="delete"):
        r2.partitions(r2.initialOffset(), r2.latestOffset())


class TestChangelogStream:
    def test_matches_batch_changelog_and_resumes(self, spark, tbl,
                                                 tmp_table_dir):
        """mode=changelog must reproduce the batch changelog for
        pos-delete-based commits (full before-images, resolved
        executor-side) and emit keyed retractions for eq-delete commits;
        rewrites stay invisible; checkpoint resume reads only the delta."""
        start = tbl.current_snapshot_id
        tbl.delete_where(f"{NUM} % 6 = 0")  # pos-deletes (10 rows)
        upd = datagen.gen_images_df(spark, 8).withColumn(
            "caption", F.concat(F.lit("v2 "), F.col("caption"))
        ).filter(f"NOT ({NUM} % 6 = 0)")
        tbl.row_delta(upd, upd.select("image_id"))  # eq-del + insert
        run_compaction(tbl, "clog", fill_ratio=1.0)  # must be invisible

        ckpt = os.path.join(tmp_table_dir, "clog-ck")
        out_dir = os.path.join(tmp_table_dir, "clog-out")
        got = _drain(spark, tbl.root, ckpt, out_dir,
                     starting=str(start), mode="changelog")
        # pos-delete retractions: full before-images = batch changelog's
        batch = tbl.changelog_scan(start).filter("_change_type = 'delete'")
        batch_pos = {
            tuple(r) for r in batch.filter("_change_ordinal = 1")
            .select("image_id", "caption").collect()
        }
        got_pos = {
            tuple(r) for r in got
            .filter("_change_type = 'delete' AND caption IS NOT NULL")
            .select("image_id", "caption").collect()
        }
        assert got_pos == batch_pos and len(got_pos) == 10
        # eq-delete retractions: key-only rows (documented divergence)
        eq = got.filter("_change_type = 'delete' AND caption IS NULL")
        assert eq.count() == upd.count()
        assert {r[0] for r in eq.select("image_id").collect()} == {
            r[0] for r in upd.select("image_id").collect()
        }
        # inserts = the rowdelta's new versions; compaction contributed 0
        ins = got.filter("_change_type = 'insert'")
        assert {r[0] for r in ins.select("caption").collect()} == {
            r[0] for r in upd.select("caption").collect()
        }
        assert got.select("_commit_snapshot_id").distinct().count() == 2

        # resume: one more upsert while the stream is down → only the delta
        upd2 = datagen.gen_images_df(spark, 3).withColumn(
            "caption", F.concat(F.lit("v3 "), F.col("caption"))
        )
        tbl.row_delta(upd2, upd2.select("image_id"))
        got2 = _drain(spark, tbl.root, ckpt, out_dir,
                      starting=str(start), mode="changelog")
        assert got2.count() == got.count() + 6  # 3 keyed deletes + 3 inserts

    def test_changelog_requires_identifier_fields(self, spark,
                                                  tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "noid"),
            datagen.IMAGES_SCHEMA, PartitionSpec(()),
        )
        t.append(datagen.gen_images_df(spark, 5))
        with pytest.raises(Exception, match="identifier_fields"):
            _drain(spark, t.root, os.path.join(tmp_table_dir, "c2"),
                   os.path.join(tmp_table_dir, "o2"), mode="changelog")

    def test_changelog_schema_has_change_columns(self, spark, tbl):
        df = read_table_stream(spark, tbl.root, mode="changelog")
        names = [f.name for f in df.schema.fields]
        assert names[-2:] == ["_change_type", "_commit_snapshot_id"]
        assert names[:-2] == [f.name for f in datagen.IMAGES_SCHEMA.fields]


def test_expired_append_root_bootstraps_full_state(spark, tmp_table_dir):
    """When expiry leaves an APPEND-class snapshot as the oldest retained
    one, its parent diff is unrecoverable (_added_entries returns the FULL
    live state) — both modes must treat it as a bootstrap: full state when
    clean, a loud refusal when the state carries live delete files (raw
    data files would resurrect the deleted rows; changelog mode would even
    mis-attribute the deletes to the root commit, where a mirror's
    insert-over-delete collapse brings the rows back)."""
    import pyarrow.parquet as pq

    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "exap"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 40), max_records_per_file=20)
    t.append(datagen.gen_images_df(spark, 20))
    t.expire_snapshots(keep_last=1)
    assert t.snapshot()["operation"] == "append"  # append-class root

    r = IceliteStreamReader(t.schema, {"path": t.root, "mode": "changelog"})
    parts = list(r.partitions(r.initialOffset(), r.latestOffset()))
    assert {p.kind for p in parts} == {"insert"}
    assert {p.snap_id for p in parts} == {t.current_snapshot_id}
    assert sum(pq.ParquetFile(p.path).metadata.num_rows for p in parts) == 60

    # now the root state carries live pos-deletes: refuse in BOTH modes
    assert t.delete_where(f"{NUM} < 5")["rows_deleted"] > 0
    t.append(datagen.gen_images_df(spark, 10))
    t.expire_snapshots(keep_last=1)
    t.refresh()
    assert t.snapshot()["operation"] == "append"
    for mode in ("append", "changelog"):
        r2 = IceliteStreamReader(t.schema, {"path": t.root, "mode": mode})
        with pytest.raises(ValueError, match="delete"):
            r2.partitions(r2.initialOffset(), r2.latestOffset())


def test_changelog_rate_limit_counts_delete_files(spark, tmp_table_dir):
    """max_files_per_batch must budget the files changelog mode actually
    plans: delete/overwrite commits contribute their delete files (append
    mode scores them zero because it never plans them)."""
    from olake_spark.streaming.table_source import IceliteStreamReader

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "rl-clog"), datagen.IMAGES_SCHEMA,
        identifier_fields=("image_id",),
    )
    t.append(datagen.gen_images_df(spark, 10))
    s1 = t.current_snapshot_id
    assert t.delete_where(f"{NUM} % 2 = 0")["rows_deleted"] > 0
    s2 = t.current_snapshot_id
    t.append(datagen.gen_images_df(spark, 30).filter(f"{NUM} >= 10"))
    s3 = t.current_snapshot_id

    r = IceliteStreamReader(
        t.schema,
        {"path": t.root, "mode": "changelog", "max_files_per_batch": "1"},
    )
    assert r.initialOffset() == {"snapshot_id": 0}
    assert r.latestOffset()["snapshot_id"] == s1  # bootstrap data file
    # the delete commit's pos-delete file consumes a budget slot of its own
    # (pre-fix it scored 0 and the walk jumped straight to s3)
    assert r.latestOffset()["snapshot_id"] == s2
    assert r.latestOffset()["snapshot_id"] == s3


def test_stream_null_backfills_pre_evolution_files(spark, tbl,
                                                   tmp_table_dir):
    """Files written before an add_columns evolution lack the new column:
    the append feed and the changelog before-images must null-backfill it
    (matching Table.scan's spark.read.schema behavior) instead of wedging
    the query on a pyarrow column-not-found error."""
    from pyspark.sql.types import StringType, StructField

    start = tbl.current_snapshot_id
    tbl.add_columns([StructField("lang", StringType(), True)])
    tbl.refresh()
    assert tbl.delete_where(f"{NUM} % 10 = 0")["rows_deleted"] == 6

    got = _drain(
        spark, tbl.root, os.path.join(tmp_table_dir, "ev-ck"),
        os.path.join(tmp_table_dir, "ev-out"),
        starting=str(start), mode="changelog",
    )
    assert got.count() == 6
    assert got.filter("_change_type = 'delete'").count() == 6
    assert got.filter("lang IS NOT NULL").count() == 0

    # append feed over the pre-evolution data files: full state, lang null
    got2 = _drain(
        spark, tbl.root, os.path.join(tmp_table_dir, "ev-ck2"),
        os.path.join(tmp_table_dir, "ev-out2"),
        skip_delete_snapshots=True,
    )
    assert got2.count() == 60
    assert got2.filter("lang IS NOT NULL").count() == 0


def test_explicit_foreign_schema_rejected_with_clear_error(spark, tbl):
    """A stream schema column the table doesn't have fails reader
    construction with a descriptive error, not a bare KeyError."""
    from pyspark.sql.types import StringType, StructField, StructType

    from olake_spark.streaming.table_source import IceliteStreamReader

    bogus = StructType([StructField("no_such_col", StringType())])
    with pytest.raises(ValueError, match="no_such_col"):
        IceliteStreamReader(bogus, {"path": tbl.root})


def test_stream_from_timestamp(spark, tmp_table_dir):
    # Iceberg stream-from-timestamp parity: anchor the feed at wall-clock
    # time. Three commits with distinct timestamps; T between #1 and #2
    # must stream exactly commits 2+3; T before all = everything; T after
    # all = nothing.
    import time

    t = Table.create(
        spark, os.path.join(tmp_table_dir, "imgs"), datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("image_id", "bucket", 4),)),
        identifier_fields=("image_id",),
    )
    for lo in (0, 20, 50):  # 20 + 30 + 40 rows
        df = datagen.gen_images_df(spark, [20, 50, 90][(0, 20, 50).index(lo)])
        t.append(df.filter(F.expr(NUM) >= lo), max_records_per_file=50)
        time.sleep(0.01)  # distinct commit timestamps
    snaps = sorted(t.snapshots(), key=lambda s: s["snapshot_id"])
    assert len(snaps) == 3
    ts2 = snaps[1]["timestamp_ms"]
    assert snaps[0]["timestamp_ms"] < ts2 <= snaps[2]["timestamp_ms"]

    def drain(tag, **kw):
        return _drain(
            spark, t.root,
            os.path.join(tmp_table_dir, f"ckpt-{tag}"),
            os.path.join(tmp_table_dir, f"sink-{tag}"), **kw,
        ).count()

    assert drain("mid", from_timestamp_ms=ts2) == 70  # commits 2+3
    assert drain(
        "old", from_timestamp_ms=snaps[0]["timestamp_ms"] - 10_000
    ) == 90  # full history
    assert drain(
        "new", from_timestamp_ms=snaps[2]["timestamp_ms"] + 10_000
    ) == 0  # nothing yet

    # mutually exclusive with `starting`
    from olake_spark.streaming.table_source import register
    register(spark)
    bad = (
        spark.readStream.format("icelite")
        .option("path", t.root)
        .option("starting", "earliest")
        .option("stream_from_timestamp_ms", ts2)
        .load()
        .writeStream.format("parquet")
        .option("path", os.path.join(tmp_table_dir, "sink-bad"))
        .option("checkpointLocation", os.path.join(tmp_table_dir, "ckpt-bad"))
        .trigger(availableNow=True)
    )
    with pytest.raises(Exception, match="mutually exclusive"):
        q = bad.start()
        q.awaitTermination(60)


def test_helper_refuses_both_anchors(spark, tbl):
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_table_stream(spark, tbl.root, starting="latest",
                          from_timestamp_ms=1)


def test_stream_nested_array_column(spark, tmp_table_dir):
    """An embeddings-shaped table (array<float> column) streams in BOTH
    append and changelog modes: columns the parquet file supplies keep
    their native arrow types (no _pa_type primitive-only wall), and only
    genuinely missing columns are synthesized as nulls."""
    from olake_spark.icelite import PartitionSpec

    root = os.path.join(tmp_table_dir, "emb")
    df = spark.range(0, 40).selectExpr(
        "cast(id as string) as doc_id",
        "transform(sequence(0, 3), i -> cast(id * 10 + i as float)) as vec",
        "cast(id % 7 as decimal(10,2)) as score",
    )
    t = Table.create(
        spark, root, df.schema, PartitionSpec(()),
        identifier_fields=("doc_id",),
    )
    t.append(df, max_records_per_file=10)
    t.refresh()
    assert t.delete_where("doc_id = '3'")["rows_deleted"] == 1

    # append feed: full array values survive the arrow round trip
    got = _drain(
        spark, root, os.path.join(tmp_table_dir, "eck"),
        os.path.join(tmp_table_dir, "eout"), skip_delete_snapshots=True,
    )
    assert got.count() == 40
    row = got.filter("doc_id = '2'").select("vec", "score").first()
    assert row["vec"] == [20.0, 21.0, 22.0, 23.0]
    assert float(row["score"]) == 2.0

    # changelog feed: inserts carry the arrays; the pos-delete retraction
    # resolves the full before-image including the nested column
    got2 = _drain(
        spark, root, os.path.join(tmp_table_dir, "cck"),
        os.path.join(tmp_table_dir, "cout"),
        starting="earliest", mode="changelog",
    )
    assert got2.count() == 41
    d = got2.filter("_change_type = 'delete'").select("vec").collect()
    assert len(d) == 1 and d[0]["vec"] == [30.0, 31.0, 32.0, 33.0]


def test_target_schema_normalizes_foreign_primitive_types():
    """By-reference files from other writers carry non-canonical arrow
    types (timestamp[ns], large_string); the stream must surface the
    CANONICAL type for every primitive the declared schema can express,
    keeping the file's own type only for nested/struct columns _pa_type
    cannot synthesize."""
    import pyarrow as pa

    from olake_spark.streaming.table_source import _target_schema

    file_schema = pa.schema([
        ("ts", pa.timestamp("ns")),               # foreign: ns, no tz
        ("name", pa.large_string()),              # foreign: large_string
        ("meta", pa.struct([("a", pa.int32())])),  # not expressible
    ])
    target = _target_schema(
        file_schema,
        ["ts", "name", "meta"],
        ["timestamp", "string", "struct<a:int>"],
    )
    assert target.field("ts").type == pa.timestamp("us", tz="UTC")
    assert target.field("name").type == pa.string()
    assert target.field("meta").type == file_schema.field("meta").type
    # a column neither mappable nor file-supplied cannot be synthesized
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _target_schema(file_schema, ["gone"], ["struct<b:int>"])
