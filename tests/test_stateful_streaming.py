"""applyInPandasWithState cross-batch dedup: the A1 last-writer-wins rule
lifted into streaming state — stale events arriving in LATER batches must be
suppressed (plain per-batch merge would let write-order win)."""

import datetime as dt
import json

from olake_spark import datagen
from olake_spark.streaming.stateful import dedup_stream


def _ts(s):
    return dt.datetime.fromisoformat(s)


class TestStatefulDedup:
    def test_cross_batch_last_writer_wins(self, spark, tmp_path):
        feed = tmp_path / "feed"
        feed.mkdir()
        ckpt = str(tmp_path / "ckpt")

        def event(i, key, op, ts, caption):
            return (key, None, None, None, None, caption, i,
                    op, ts, ts)

        rows_batch1 = [
            event(1, "k1", "u", "2026-01-01 10:00:00", "newest"),
            event(2, "k2", "c", "2026-01-01 09:00:00", "first"),
        ]
        rows_batch2 = [
            # STALE update for k1 (older ts) — must be suppressed by state
            event(3, "k1", "u", "2026-01-01 08:00:00", "stale"),
            # genuine newer update for k2
            event(4, "k2", "u", "2026-01-01 11:00:00", "second"),
        ]
        cols = datagen.CHANGES_SCHEMA
        for i, rows in enumerate((rows_batch1, rows_batch2)):
            df = spark.createDataFrame(
                [
                    {
                        "image_id": r[0], "bytes": None, "w": None, "h": None,
                        "fmt": None, "caption": r[5], "phash": r[6],
                        "_op_type": r[7], "_cdc_timestamp": _ts(r[8]),
                        "_olake_timestamp": _ts(r[9]),
                    }
                    for r in rows
                ],
                cols,
            )
            df.coalesce(1).write.parquet(str(feed / f"b{i}"))

        stream = (
            spark.readStream.schema(cols)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed / "b*"))
        )
        out = dedup_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("dedup_out").collect()
        emitted = {}
        for r in got:
            emitted.setdefault(r["image_id"], []).append(json.loads(r["payload"]))
        # k1: 'newest' emitted once; the stale batch-2 event emitted NOTHING
        assert [p["caption"] for p in emitted["k1"]] == ["newest"]
        # k2: first then second (state advanced)
        assert [p["caption"] for p in emitted["k2"]][-1] == "second"
        assert len(emitted["k2"]) <= 2
