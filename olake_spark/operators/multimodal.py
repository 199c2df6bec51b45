"""Multimodal column plumbing: opaque `binary` payloads + typed metadata.

Images use the in-repo pure-numpy codec (functions.imagecodec) — real decode,
real PSNR. Audio uses the stdlib PCM WAV codec (functions.audiocodec) — real
decode, real features (RMS, ZCR, spectral centroid). Video uses the Y4M
container parser (functions.videocodec) — real uncompressed-frame decode and
frame sampling; compressed containers (mp4/webm) plug into that decode seam
when the deployment image ships a demuxer.

All kernels run inside `mapInPandas` so one Arrow batch of encoded payloads
is decoded per Python roundtrip; `spark.sql.files.maxPartitionBytes` (set in
session.py) bounds how many encoded bytes a single task ever holds.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, DoubleType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

from olake_spark.functions.imagecodec import decode_image, encode_image
from olake_spark.functions.text import token_count_col

DECODE_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("n_pixels", LongType()),
    ]
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every image and emit channel means — the canonical
    feature-extraction shape (swap the body for a real featurizer)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                try:
                    arr = decode_image(bytes(raw)).astype(np.float64)
                    m = arr.mean(axis=(0, 1))
                    rows.append(
                        {
                            "image_id": iid,
                            "decode_ok": True,
                            "mean_r": float(m[0]),
                            "mean_g": float(m[1]),
                            "mean_b": float(m[2]),
                            "n_pixels": int(arr.shape[0] * arr.shape[1]),
                        }
                    )
                except Exception:
                    rows.append(
                        {
                            "image_id": iid,
                            "decode_ok": False,
                            "mean_r": None,
                            "mean_g": None,
                            "mean_b": None,
                            "n_pixels": None,
                        }
                    )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, DECODE_STATS_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize + re-encode (PNG). Vectorized index math per
    image; the per-batch loop is over images, not pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, raw in zip(b["image_id"], b["bytes"]):
                arr = decode_image(bytes(raw))
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                rows.append(
                    {
                        "image_id": iid,
                        "bytes": encode_image(arr[yi][:, xi], "png"),
                        "w": out_w,
                        "h": out_h,
                        "fmt": "png",
                    }
                )
            yield pd.DataFrame(rows)

    return images.select("image_id", "bytes").mapInPandas(run, RESIZE_SCHEMA)


RESIZE_BUCKET_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("src_w", IntegerType()),
        StructField("src_h", IntegerType()),
        StructField("crop_x", IntegerType()),
        StructField("crop_y", IntegerType()),
    ]
)


def resize_to_bucket(
    images: DataFrame,
    bucket_cols: tuple[str, str] = ("bucket_w", "bucket_h"),
) -> DataFrame:
    """Per-row variable-target resize to each image's aspect bucket — the
    pixel half of the SDXL multi-aspect recipe (Podell et al. 2023 §2.3),
    consuming :func:`olake_spark.operators.bucketing.assign_aspect_buckets`
    output: aspect-preserving scale-to-COVER the bucket (the minimal
    nearest-neighbor scale with both scaled sides >= the bucket's, ceil
    integer math), then a deterministic center crop to exactly
    (bucket_w, bucket_h). ``crop_x``/``crop_y`` are the crop offsets in
    the SCALED frame — SDXL conditions the model on them, so they ride
    the output; ``src_w``/``src_h`` are the DECODED dimensions (never
    trusted from metadata columns, same convention as the quality
    kernels). Corrupt payloads come back decode_ok=false with NULL
    pixels (the per-row ValueError seam — a bomb never poisons the
    batch); rows with a NULL bucket (unassignable dims) are excluded,
    matching ``pack_batches``. Same mapInPandas shape as every other
    media kernel: one Arrow batch of encoded payloads per roundtrip."""
    bw_col, bh_col = bucket_cols

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for iid, raw, bw, bh in zip(
                b["image_id"], b["bytes"], b[bw_col], b[bh_col]
            ):
                bw, bh = int(bw), int(bh)
                try:
                    arr = decode_image(bytes(raw))
                except ValueError:
                    rows.append({
                        "image_id": iid, "decode_ok": False, "bytes": None,
                        "w": bw, "h": bh, "fmt": None, "src_w": None,
                        "src_h": None, "crop_x": None, "crop_y": None,
                    })
                    continue
                h, w = arr.shape[:2]
                # minimal scale covering the bucket: ceil keeps both
                # scaled sides >= the bucket side (never a short edge)
                if w * bh >= h * bw:  # wider than the bucket: height binds
                    ph, pw = bh, max(bw, -(-w * bh // h))
                else:
                    pw, ph = bw, max(bh, -(-h * bw // w))
                x0, y0 = (pw - bw) // 2, (ph - bh) // 2
                yi = ((y0 + np.arange(bh)) * h // ph).clip(0, h - 1)
                xi = ((x0 + np.arange(bw)) * w // pw).clip(0, w - 1)
                rows.append({
                    "image_id": iid, "decode_ok": True,
                    "bytes": encode_image(arr[yi][:, xi], "png"),
                    "w": bw, "h": bh, "fmt": "png",
                    "src_w": int(w), "src_h": int(h),
                    "crop_x": int(x0), "crop_y": int(y0),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_BUCKET_SCHEMA.fields]
            )

    return (
        images.filter(F.col(bw_col).isNotNull())
        .select("image_id", "bytes", bw_col, bh_col)
        .mapInPandas(run, RESIZE_BUCKET_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
        StructField("peak", LongType()),
        StructField("spectral_centroid_hz", DoubleType()),
    ]
)


def audio_features(clips: DataFrame) -> DataFrame:
    """REAL audio featurizer over PCM WAV payloads (stdlib `wave` + numpy,
    functions/audiocodec.py — no external codec needed for PCM): duration,
    RMS, zero-crossing count (strict sign flips: s[i]*s[i-1] < 0), peak
    |amplitude|, and spectral centroid via one rfft per clip. Same
    mapInPandas shape as the image kernels: one Arrow batch of encoded
    payloads decoded per Python roundtrip, undecodable payloads flagged
    (decode_ok=false), never poisoning the batch. Compressed codecs plug
    into the decode seam when the image ships one."""
    from olake_spark.functions.audiocodec import decode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for cid, raw in zip(b["clip_id"], b["bytes"]):
                try:
                    s, sr = decode_wav(bytes(raw))
                    x = s.astype(np.float64)
                    n = len(s)
                    # energy sum fits double exactly: |s| ≤ 32768 → s² ≤ 2³⁰,
                    # exact up to n ≈ 2²³ samples (≈ 9 min at 16 kHz)
                    rms = float(np.sqrt((x * x).sum() / n)) if n else 0.0
                    zc = int(((x[1:] * x[:-1]) < 0).sum()) if n > 1 else 0
                    if n:
                        mag = np.abs(np.fft.rfft(x))
                        freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                        tot = mag.sum()
                        cent = float((freqs * mag).sum() / tot) if tot else 0.0
                    else:
                        cent = 0.0
                    rows.append({
                        "clip_id": cid, "decode_ok": True,
                        "sample_rate": int(sr), "n_samples": n,
                        "duration_s": n / sr if sr else 0.0,
                        "rms": rms, "zero_crossings": zc,
                        "peak": int(np.abs(x).max()) if n else 0,
                        "spectral_centroid_hz": cent,
                    })
                except Exception:
                    rows.append({
                        "clip_id": cid, "decode_ok": False,
                        "sample_rate": 0, "n_samples": 0, "duration_s": 0.0,
                        "rms": 0.0, "zero_crossings": 0, "peak": 0,
                        "spectral_centroid_hz": 0.0,
                    })
            yield pd.DataFrame(rows)

    return clips.select("clip_id", "bytes").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("frame_idx", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("mean_luma_milli", LongType()),
        StructField("frame_png", BinaryType()),
    ]
)


def sample_frames(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """REAL video frame sampler over Y4M and MJPEG-AVI payloads (pure-numpy
    container parsers — functions/videocodec.py for uncompressed Y4M,
    functions/avicodec.py + the baseline JPEG codec for compressed MJPEG;
    routed by magic through videocodec.decode_video): every `every_n`-th
    frame's luma plane is emitted with integer-exact stats
    (mean_luma_milli = sum(luma)*1000 div n_pixels, pure int arithmetic so
    a SQL twin reproduces it bit-identically) and re-encoded as a real PNG
    (luma replicated to RGB) for downstream image kernels. Same mapInPandas
    shape as the image/audio kernels: one Arrow batch of encoded payloads
    decoded per Python roundtrip; undecodable payloads yield one
    decode_ok=false row and never poison the batch. Other containers
    (mp4/webm) plug into the decode_video seam when the deployment image
    ships a demuxer."""
    from olake_spark.functions.videocodec import decode_video

    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for vid, raw in zip(b["video_id"], b["bytes"]):
                try:
                    frames, _, _ = decode_video(bytes(raw))
                except Exception:
                    rows.append({
                        "video_id": vid, "decode_ok": False, "frame_idx": -1,
                        "w": 0, "h": 0, "n_pixels": 0,
                        "mean_luma_milli": 0, "frame_png": b"",
                    })
                    continue
                n, h, w = frames.shape
                for idx in range(0, n, every_n):
                    luma = frames[idx]
                    # exact: uint8 sum * 1000 floored — no float in the stat
                    mean_milli = int(luma.sum(dtype=np.int64)) * 1000 // (h * w)
                    rgb = np.repeat(luma[:, :, None], 3, axis=2)
                    rows.append({
                        "video_id": vid, "decode_ok": True, "frame_idx": idx,
                        "w": w, "h": h, "n_pixels": h * w,
                        "mean_luma_milli": mean_milli,
                        "frame_png": encode_image(rgb, "png"),
                    })
            yield pd.DataFrame(rows)

    return videos.select("video_id", "bytes").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


IMAGE_QUALITY_STATS_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("decode_ok", BooleanType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("luma_stddev_ppm", LongType()),
    ]
)


def image_quality_stats(
    images: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Per-image quality measurements off a real decode: dimensions from
    the decoded raster (never trusted from metadata columns) and the
    population standard deviation of BT.601 luma as ppm of the 0-255
    range — the flat/solid-color signal. Corrupt payloads come back as
    decode_ok=false rows (the per-row ValueError seam), never a poisoned
    batch. One Arrow batch of encoded payloads per Python roundtrip.

    ``passthrough`` columns ride the same Arrow batch into the output
    unchanged (the pair-curation path carries the caption this way —
    cheap next to the payload bytes already crossing, and it saves the
    join back on image_id that a detached stats frame would need)."""
    schema = StructType(
        IMAGE_QUALITY_STATS_SCHEMA.fields
        + [images.schema[c] for c in passthrough]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, (iid, raw) in enumerate(zip(b["image_id"], b["bytes"])):
                extra = {c: b[c].iloc[i] for c in passthrough}
                try:
                    arr = decode_image(bytes(raw)).astype(np.float64)
                    h, w = arr.shape[0], arr.shape[1]
                    luma = (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
                            + 0.114 * arr[:, :, 2])
                    std = float(luma.std())  # population std
                    rows.append({
                        "image_id": iid, "decode_ok": True,
                        "w": int(w), "h": int(h), "n_pixels": int(w * h),
                        "luma_stddev_ppm": int(std / 255.0 * 1_000_000),
                        **extra,
                    })
                except ValueError:
                    rows.append({
                        "image_id": iid, "decode_ok": False,
                        "w": None, "h": None, "n_pixels": None,
                        "luma_stddev_ppm": None, **extra,
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", *passthrough).mapInPandas(
        run, schema
    )


def image_quality_rules(
    stats: DataFrame,
    min_side: int = 64,
    max_aspect_ppm: int = 3_000_000,
    min_luma_stddev_ppm: int = 0,
) -> DataFrame:
    """LAION/DataComp-shape image curation rules as pure Catalyst
    expressions over :func:`image_quality_stats` output (the image-side
    sibling of the Gopher text rules): drop images smaller than
    ``min_side`` on their short edge, with long/short aspect above
    ``max_aspect_ppm`` (LAION-5B filtered at ratio > 3), or — when
    ``min_luma_stddev_ppm`` > 0 — flatter than the solid-color line.
    Corrupt images (decode_ok=false) are always dropped; their per-rule
    flags stay NULL (dimensions unknown ≠ dimensions bad). All integer
    arithmetic (`div`), so an oracle re-derives every flag exactly."""
    aspect = F.expr(
        "CAST(greatest(w, h) AS BIGINT) * 1000000 div least(w, h)"
    )
    too_small = F.least("w", "h") < F.lit(min_side)
    bad_aspect = aspect > F.lit(max_aspect_ppm)
    rules = ~too_small & ~bad_aspect
    if min_luma_stddev_ppm > 0:
        rules = rules & (F.col("luma_stddev_ppm") >= F.lit(min_luma_stddev_ppm))
    return stats.select(
        "*",
        F.least("w", "h").alias("min_side_px"),
        aspect.alias("aspect_ppm"),
        too_small.alias("too_small"),
        bad_aspect.alias("bad_aspect"),
        (F.col("decode_ok") & F.coalesce(rules, F.lit(False))).alias("keep"),
    )


def image_quality(
    images: DataFrame,
    min_side: int = 64,
    max_aspect_ppm: int = 3_000_000,
    min_luma_stddev_ppm: int = 0,
) -> DataFrame:
    """decode-measure (kernel) → rule flags (Catalyst): one row per image
    with dimensions, flatness, per-rule flags and the final ``keep``."""
    return image_quality_rules(
        image_quality_stats(images),
        min_side=min_side,
        max_aspect_ppm=max_aspect_ppm,
        min_luma_stddev_ppm=min_luma_stddev_ppm,
    )


def pair_quality(
    images: DataFrame,
    caption_col: str = "caption",
    min_side: int = 64,
    max_aspect_ppm: int = 3_000_000,
    min_luma_stddev_ppm: int = 0,
    min_caption_tokens: int = 1,
    max_caption_tokens: int = 128,
) -> DataFrame:
    """Joint image+caption curation for (image, caption) training pairs —
    the DataComp/LAION pipeline shape over this engine's own data model:
    the image side is :func:`image_quality` (real decode, measured dims,
    flatness), the caption side bounds the whitespace token count (empty
    and runaway captions are the two classic web-scrape failure modes),
    and a pair survives only if BOTH sides do. The caption rides the
    decode kernel's Arrow batch as a passthrough column, so the whole
    operator is one map-side pass — no join, no shuffle. Output renames
    the image-side verdict to ``image_ok`` and emits the pair-level
    ``keep``."""
    flagged = image_quality_rules(
        image_quality_stats(images, passthrough=(caption_col,)),
        min_side=min_side,
        max_aspect_ppm=max_aspect_ppm,
        min_luma_stddev_ppm=min_luma_stddev_ppm,
    ).withColumnRenamed("keep", "image_ok")
    ntok = token_count_col(caption_col)
    caption_ok = (
        F.col(caption_col).isNotNull()
        & (ntok >= F.lit(min_caption_tokens))
        & (ntok <= F.lit(max_caption_tokens))
    )
    return flagged.select(
        "*",
        F.when(F.col(caption_col).isNotNull(), ntok)
        .alias("caption_tokens"),
        caption_ok.alias("caption_ok"),
        (F.col("image_ok") & caption_ok).alias("keep"),
    )
