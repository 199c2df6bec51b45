"""Deterministic synthetic fixtures (FIXTURES.md F1/F2) — no external data.

Generation is distributed: `mapInPandas` over `spark.range(n)`, each row
seeded as SEED+i so the output is byte-identical regardless of partitioning
or parallelism level (required for the two-cluster-size scaling runs to
process identical input). Per-image encode cost lives in the executors, not
the driver, so fixture creation itself scales with the cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

from olake_spark.functions.imagecodec import encode_image, phash64

SEED = 42

IMAGES_SCHEMA = StructType(
    [
        StructField("image_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("fmt", StringType(), True),
        StructField("caption", StringType(), True),
        StructField("phash", LongType(), True),
    ]
)

CHANGES_SCHEMA = StructType(
    IMAGES_SCHEMA.fields
    + [
        StructField("_op_type", StringType(), False),
        StructField("_cdc_timestamp", TimestampType(), False),
        StructField("_olake_timestamp", TimestampType(), False),
    ]
)

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper krill "
    "lumen maple nadir onyx prism quartz raven sable tundra umber vortex "
    "willow xenon yarrow zephyr"
).split()

# FIXTURES.md F1: 20% of rows share the top-16-bit prefix 0xBEEF → hot phash
# ranges that force the salted-repartition path during clustering.
_HOT_PREFIX = 0xBEEF
_SIZES_W = (32, 64, 128)
_SIZES_H = (32, 48, 96)
_BENCH_W = (16, 24, 32)
_BENCH_H = (16, 24, 32)


def _caption(i: int) -> str:
    rng = np.random.default_rng(SEED * 1_000_003 + i)
    toks = rng.choice(len(_WORDS), size=8)
    return f"caption {i}: " + " ".join(_WORDS[t] for t in toks)


def _make_row(i: int, bench: bool, img_px: int | None = None) -> dict:
    if img_px:
        w = h = img_px
    else:
        ws, hs = (_BENCH_W, _BENCH_H) if bench else (_SIZES_W, _SIZES_H)
        w, h = ws[i % 3], hs[i % 3]
    fmt = "jpeg" if i % 4 == 0 else "png"
    rng = np.random.default_rng(SEED + i)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ph = phash64(arr)
    if i % 5 == 0:  # hot prefix → skew
        ph_u = (ph & (2**64 - 1)) & 0x0000FFFFFFFFFFFF | (_HOT_PREFIX << 48)
        ph = ph_u - (1 << 64) if ph_u >= (1 << 63) else ph_u
    return {
        "image_id": f"img-{i:012d}",
        "bytes": encode_image(arr, fmt),
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": _caption(i),
        "phash": ph,
    }


def expected_pixels(i: int, bench: bool = False) -> np.ndarray:
    """Oracle: the exact pixel array row i was generated from."""
    ws, hs = (_BENCH_W, _BENCH_H) if bench else (_SIZES_W, _SIZES_H)
    w, h = ws[i % 3], hs[i % 3]
    rng = np.random.default_rng(SEED + i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def gen_images_df(spark: SparkSession, n: int, bench: bool = False,
                  parallelism: int | None = None,
                  img_px: int | None = None) -> DataFrame:
    """The F1 `images` table as a distributed DataFrame (deterministic).
    `img_px` pins all images to one tiny size (row-dominated scaling runs)."""
    rng_free = spark.range(0, n, 1, parallelism or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = [_make_row(int(i), bench, img_px) for i in b["id"]]
            yield pd.DataFrame(rows)

    return rng_free.mapInPandas(gen, IMAGES_SCHEMA)


def gen_changes_df(
    spark: SparkSession, base_n: int, n_changes: int = 1000, bench: bool = False
) -> DataFrame:
    """F2 change-event fixture mirroring OLake's RawRecord envelope
    (types/data_types.go:60-66) and the MongoDB change-event-to-row mapping
    (drivers/mongodb/internal/cdc.go:75-95): per 1000 events —
    500 inserts of new ids, 300 updates of existing, 100 deletes (key only),
    100 duplicate-key multi-event sequences (c→u→d, same-ts ties)."""
    rng_free = spark.range(0, n_changes, 1, spark.sparkContext.defaultParallelism)
    t0 = pd.Timestamp("2026-01-01T00:00:00Z").tz_localize(None)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for j in (int(x) for x in b["id"]):
                bucket = j % 10
                ts = t0 + pd.Timedelta(seconds=j)
                if bucket < 5:  # insert of a brand-new id
                    r = _make_row(base_n + j, bench)
                    r["caption"] = "inserted " + r["caption"]
                    rows.append({**r, "_op_type": "c", "_cdc_timestamp": ts,
                                 "_olake_timestamp": ts})
                elif bucket < 8:  # update of an existing id (caption mutated)
                    tgt = j % base_n
                    r = _make_row(tgt, bench)
                    r["caption"] = f"updated {j}: " + r["caption"]
                    rows.append({**r, "_op_type": "u", "_cdc_timestamp": ts,
                                 "_olake_timestamp": ts})
                elif bucket < 9:  # delete: key only (mongo cdc.go:81-84)
                    tgt = (j * 7) % base_n
                    rows.append({
                        "image_id": f"img-{tgt:012d}", "bytes": None, "w": None,
                        "h": None, "fmt": None, "caption": None, "phash": None,
                        "_op_type": "d", "_cdc_timestamp": ts, "_olake_timestamp": ts,
                    })
                else:  # duplicate-key c→u→d burst, same-ts ties → op-priority rule
                    nid = base_n + n_changes + j
                    r = _make_row(nid, bench)
                    for op in ("c", "u", "d"):
                        rr = dict(r)
                        if op == "d":
                            rr = {k: (rr[k] if k == "image_id" else None)
                                  for k in rr}
                        elif op == "u":
                            rr["caption"] = "burst-update " + r["caption"]
                        rows.append({**rr, "_op_type": op, "_cdc_timestamp": ts,
                                     "_olake_timestamp": ts})
            yield pd.DataFrame(rows)

    return rng_free.mapInPandas(gen, CHANGES_SCHEMA)


def fragmented_append(table, df: DataFrame, n_rows: int, n_files: int = 200) -> None:
    """Write with small-file debt for compaction tests (FIXTURES.md F1:
    'fragmented writer mode', maxRecordsPerFile ≈ rows/n_files)."""
    table.append(df, max_records_per_file=max(1, n_rows // n_files))


# ------------------------------------------------------------ audio fixture

AUDIO_SR = 16000

AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("n_samples", LongType(), True),
    ]
)


def audio_waveform(cid: int) -> "np.ndarray":
    """Deterministic int16 mono waveform for clip `cid` — a modular-arithmetic
    sawtooth, chosen over sinusoids so every sample is INTEGER-EXACT in both
    numpy and ANSI SQL (no libm, no rounding divergence — the same
    cross-engine-exactness principle as BM25's rational idf):

        s[i] = ((i * k + cid) % 65536) - 32768,   k = 3 + cid % 11

    Length varies per clip: n = 1600 + (cid % 7) * 320 samples at 16 kHz."""
    n = 1600 + (cid % 7) * 320
    k = 3 + cid % 11
    i = np.arange(n, dtype=np.int64)
    return (((i * k + cid) % 65536) - 32768).astype(np.int16)


def gen_audio_df(spark: SparkSession, n: int,
                 parallelism: int | None = None) -> DataFrame:
    """The audio clips table as a distributed DataFrame: PCM WAV payloads
    encoded executor-side with the stdlib codec (functions/audiocodec.py)."""
    from olake_spark.functions.audiocodec import encode_wav

    rng_free = spark.range(
        0, n, 1, parallelism or spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            rows = []
            for cid in b["id"]:
                s = audio_waveform(int(cid))
                rows.append({
                    "clip_id": f"clip-{int(cid):08d}",
                    "bytes": encode_wav(s, AUDIO_SR),
                    "sample_rate": AUDIO_SR,
                    "n_samples": len(s),
                })
            yield pd.DataFrame(rows)

    return rng_free.mapInPandas(gen, AUDIO_SCHEMA)


# ------------------------------------------------------------ video fixture

VIDEO_W, VIDEO_H = 16, 12  # tiny frames keep the SQL oracle tractable
VIDEO_FPS = 10

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType(), False),
        StructField("bytes", BinaryType(), True),
        StructField("w", IntegerType(), True),
        StructField("h", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("fps", IntegerType(), True),
    ]
)


def video_frames(vid: int) -> "np.ndarray":
    """Deterministic uint8 mono frame stack for video `vid` — the same
    modular-arithmetic principle as audio_waveform so every PIXEL is
    integer-exact in both numpy and ANSI SQL (no float, no libm):

        pixel[f, y, x] = ((f*P + y*W + x) * k + vid) % 256
        P = W*H, k = 3 + vid % 7, n_frames = 8 + vid % 5
    """
    n = 8 + vid % 5
    k = 3 + vid % 7
    p = VIDEO_W * VIDEO_H
    i = np.arange(n * p, dtype=np.int64)
    return ((i * k + vid) % 256).astype(np.uint8).reshape(n, VIDEO_H, VIDEO_W)


def gen_video_df(spark: SparkSession, n: int,
                 parallelism: int | None = None) -> DataFrame:
    """The video clips table as a distributed DataFrame: Y4M (Cmono)
    payloads encoded executor-side with the pure-numpy container codec
    (functions/videocodec.py)."""
    from olake_spark.functions.videocodec import encode_y4m

    rng_free = spark.range(
        0, n, 1, parallelism or spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        for b in batches:
            rows = []
            for vid in b["id"]:
                f = video_frames(int(vid))
                rows.append({
                    "video_id": f"vid-{int(vid):08d}",
                    "bytes": encode_y4m(f, VIDEO_FPS),
                    "w": VIDEO_W,
                    "h": VIDEO_H,
                    "n_frames": f.shape[0],
                    "fps": VIDEO_FPS,
                })
            yield pd.DataFrame(rows)

    return rng_free.mapInPandas(gen, VIDEO_SCHEMA)
