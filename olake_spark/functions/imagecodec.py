"""Pure-numpy image codec + PSNR + perceptual hash.

This container ships no PIL/libjpeg, so:

- ``fmt == "png"``  → a real, spec-compliant PNG encoder/decoder (zlib +
  filter-0 scanlines, 8-bit RGB). Lossless, byte-deterministic.
- ``fmt == "jpeg"`` → a deterministic lossy FIXTURE container: pixels
  quantized to a step of 4 (MSE ≈ q²/12 ≈ 1.33 → PSNR ≈ 46.9 dB,
  satisfying the ≥40 dB lossy gate), PNG-framed behind a distinct magic.
  Kept as the synthetic fixture's lossy format because it is vectorized
  across a whole batch and entropy-coder-free, so the 1.2M-image scaling
  benchmarks measure the ENGINE, not a sequential bit-packing loop.
- **real JPEG** → a full ITU-T T.81 codec (baseline sequential AND
  progressive/SOF2) lives in ``jpegcodec.py`` (pure numpy: Huffman, DCT,
  4:2:0/4:2:2/4:4:4, restart markers, Annex-G successive approximation;
  validated against libjpeg-written files).
  ``decode_image`` auto-routes real JPEG magic (FF D8) there, so every
  decode-bearing operator ingests real-world JPEG bytes unchanged;
  ``jpegcodec.jpeg_encode`` emits spec-compliant baseline JPEG any
  external consumer can read.

Everything is vectorized numpy per image; batch helpers operate over pandas
Series for use inside ``pandas_udf`` (no per-row Python in Spark hot paths —
BASELINE.json input_hint).
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard (Pillow's MAX_IMAGE_PIXELS analog). A 1 MB
# payload can legally declare dimensions that expand to many GB of raster
# (measured here: a 1.17 MB PNG of compressed zeros → 1.2 GB array, 116 s
# of CPU) — at 100 TB ingest a handful of such files OOMs executors or
# stalls tasks. Every pure decoder calls check_dims() the moment its
# container header yields (w, h), BEFORE any canvas/inflate allocation, so
# oversized files fail fast through the normal per-row ValueError seam
# (multimodal UDFs record decode_ok=false; the batch is never poisoned).
# Default 2^27 px ≈ 402 MB of RGB — far above any training image, far
# below executor memory. Override with OLAKE_MAX_IMAGE_PIXELS (0 disables)
# for pipelines that legitimately carry gigapixel imagery.
MAX_IMAGE_PIXELS = int(os.environ.get("OLAKE_MAX_IMAGE_PIXELS", str(1 << 27)))


def check_dims(w: int, h: int, container: str = "image") -> None:
    """Raise ValueError when a declared raster exceeds MAX_IMAGE_PIXELS.
    Reads the module global at call time so tests (and callers) can lower
    or disable the limit without re-importing the codecs."""
    if MAX_IMAGE_PIXELS and w * h > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"{container} dimensions {w}x{h} exceed the decompression-bomb "
            f"guard ({w * h} > OLAKE_MAX_IMAGE_PIXELS={MAX_IMAGE_PIXELS})"
        )
_LOSSY_MAGIC = b"\x89LSY1"  # our deterministic lossy stand-in container
_LOSSY_Q = 4  # quantization step → PSNR ≈ 46.9 dB


def _crc(chunk_type: bytes, data: bytes) -> bytes:
    return struct.pack(">I", zlib.crc32(chunk_type + data) & 0xFFFFFFFF)


def _chunk(chunk_type: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + chunk_type + data + _crc(chunk_type, data)


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode an (h, w, 3) uint8 array as an RGB8 PNG (filter 0 scanlines)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    # filter byte 0 prepended to each scanline, then one zlib stream
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int = 3) -> np.ndarray:
    """Reverse PNG scanline filters (types 0-4) for bpp-byte pixels."""
    stride = w * bpp
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    data = rows[:, 1:]
    if not ftypes.any():  # fast path: all filter 0 (what png_encode emits)
        return data.reshape(h, w, bpp).copy()
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        f = ftypes[y]
        line = data[y].astype(np.int32)
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + prev) & 0xFF
        else:  # Sub/Average/Paeth need a left-to-right scan
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 1:
                    v = line[x] + a
                elif f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    v = line[x] + pr
                cur[x] = v & 0xFF
    return out.astype(np.uint8).reshape(h, w, bpp)


def _stride_bytes(w: int, ch: int, depth: int) -> int:
    """Bytes per scanline excluding the filter byte (PNG spec §7.2:
    sub-byte sample depths pack MSB-first and pad to a byte boundary)."""
    return (w * ch * depth + 7) // 8


def _pass_pixels(raw: np.ndarray, h: int, w: int, ch: int, depth: int) -> np.ndarray:
    """Unfilter one (sub)image's scanlines at any legal sample depth and
    return (h, w, ch) uint8 SAMPLES: 8-bit values for depths 8/16 (16-bit
    samples are chopped to the high byte — libpng's default strip-16
    convention; max error 1/257 of full scale, irrelevant for ingest
    stats/phash), and raw 1/2/4-bit sample values for sub-byte depths
    (gray bit-replication scaling / palette lookup happen in png_decode).

    The filter's "pixel width" (the `a`/`c` lookback, spec §9.2) is
    ``max(1, ch * depth // 8)`` bytes — whole bytes for sub-byte depths."""
    if depth == 8:
        return _unfilter(raw, h, w, ch)
    if depth == 16:
        b = _unfilter(raw, h, w, ch * 2)  # stride = w*ch*2, lookback ch*2
        return b.reshape(h, w, ch, 2)[..., 0].copy()  # big-endian high byte
    # depths 1/2/4: one channel (gray or palette index), bit-packed MSB-first
    stride = _stride_bytes(w, 1, depth)
    b = _unfilter(raw, h, stride, 1).reshape(h, stride)
    bits = np.unpackbits(b, axis=1)  # (h, stride*8), MSB first
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (bits.reshape(h, -1, depth) * weights).sum(axis=2, dtype=np.uint8)
    return vals[:, :w].reshape(h, w, 1)


# Adam7 pass layout (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _deinterlace_adam7(
    raw: np.ndarray, h: int, w: int, ch: int, depth: int
) -> np.ndarray:
    """Reassemble an Adam7-interlaced image (PNG spec §8.2): the pixel
    stream is seven consecutive reduced images, each filtered independently
    as if it were its own image; unfilter each pass and scatter it into
    place on the (y_start::y_step, x_start::x_step) grid. Empty passes
    (reduced image has zero width or height) contribute no bytes. Each
    pass packs its scanlines at the image's sample depth, so sub-byte
    passes pad to a byte boundary PER REDUCED SCANLINE."""
    dims = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            dims.append((x0, y0, dx, dy, pw, ph))
    need = sum(ph * (1 + _stride_bytes(pw, ch, depth)) for *_, pw, ph in dims)
    if need != len(raw):
        raise ValueError(
            f"Adam7 pixel-stream length mismatch: expected {need}, got {len(raw)}"
        )
    out = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy, pw, ph in dims:
        n = ph * (1 + _stride_bytes(pw, ch, depth))
        out[y0::dy, x0::dx] = _pass_pixels(raw[pos : pos + n], ph, pw, ch, depth)
        pos += n
    return out


# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# color type → legal sample depths (PNG spec §11.2.2 table)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def png_decode(data: bytes) -> np.ndarray:
    """Decode any spec-legal PNG to (h, w, 3) uint8 RGB — every color type
    at every legal sample depth (spec §11.2.2): gray (0) at 1/2/4/8/16,
    RGB (2) at 8/16, palette (3, via PLTE) at 1/2/4/8, gray+alpha (4) and
    RGBA (6) at 8/16; both progressive-display modes (sequential and
    Adam7-interlaced). Alpha is dropped and 16-bit samples chop to the
    high byte (training-data ingest convention — libpng's strip-16
    default); sub-8-bit gray scales by bit replication (spec §12.5, exact:
    255/(2^d-1) is integral). Filters 0-4 handled; illegal depth/color
    combinations raise a clear ValueError."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    plte = None
    interlace = 0
    exif_o = 1
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body[:13]
            )
            if color not in _PNG_CHANNELS or depth not in _PNG_DEPTHS[color]:
                raise ValueError(
                    f"illegal PNG depth/color combination "
                    f"(depth={depth}, color type={color})"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
            check_dims(w, h, "PNG")
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        elif ctype == b"eXIf":
            # PNG 3rd-edition EXIF chunk: payload is a raw TIFF stream
            from olake_spark.functions.exif import orientation_from_exif

            exif_o = orientation_from_exif(body)
    if w is None:
        raise ValueError("PNG missing IHDR chunk")
    ch = _PNG_CHANNELS[color]
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if interlace:
        px = _deinterlace_adam7(raw, h, w, ch, depth)
    elif depth == 8:  # the overwhelmingly common case — straight to unfilter
        px = _unfilter(raw, h, w, ch)
    else:
        px = _pass_pixels(raw, h, w, ch, depth)
    if color == 2:
        rgb = px
    elif color == 6:
        rgb = px[:, :, :3].copy()
    elif color == 0:
        if depth < 8:  # bit replication to full scale (exact integer)
            px = px * np.uint8(255 // ((1 << depth) - 1))
        rgb = np.repeat(px, 3, axis=2)
    elif color == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    elif plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    else:
        rgb = plte[px[:, :, 0]]
    if exif_o == 1:  # the common path: zero-cost identity
        return rgb
    from olake_spark.functions.exif import apply_orientation

    return apply_orientation(rgb, exif_o)


def _encode_lossy(arr: np.ndarray) -> bytes:
    q = _LOSSY_Q
    quant = ((arr.astype(np.int32) + q // 2) // q * q).clip(0, 255).astype(np.uint8)
    return _LOSSY_MAGIC + png_encode(quant)


def _decode_lossy(data: bytes) -> np.ndarray:
    return png_decode(data[len(_LOSSY_MAGIC) :])


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(arr)
    if fmt == "jpeg":
        return _encode_lossy(arr)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes) -> np.ndarray:
    """Container dispatch by magic. Error contract: a malformed or
    truncated payload raises ValueError regardless of container — zlib,
    struct and bounds failures inside the PNG path are translated here
    (the JPEG decoder translates its own). The try block costs nothing on
    the non-raising path (CPython 3.11 zero-cost exceptions)."""
    try:
        if data[:5] == _LOSSY_MAGIC:
            return _decode_lossy(data)
        if bytes(data[:2]) == b"\xff\xd8":
            # real JPEG bytes (SOI magic): full T.81 decoder (baseline +
            # progressive) — every
            # decode-bearing operator (multimodal stats/resize, PSNR verify)
            # accepts real-world payloads, not just fixture containers.
            # Camera files carry EXIF Orientation in APP1: return display
            # orientation (exif.py), the exif_transpose/autorotate
            # convention — sideways pixels would split phash dedup buckets
            from olake_spark.functions.exif import (
                apply_orientation,
                jpeg_orientation,
            )
            from olake_spark.functions.jpegcodec import jpeg_decode

            return apply_orientation(jpeg_decode(data), jpeg_orientation(data))
        if bytes(data[:4]) == b"GIF8":
            # real GIF87a/89a bytes: first composed frame (gifcodec.py)
            from olake_spark.functions.gifcodec import gif_decode

            return gif_decode(data)
        if bytes(data[:2]) == b"BM":
            # Windows DIB (bmpcodec.py): uncompressed 1/4/8/24/32 bpp
            from olake_spark.functions.bmpcodec import bmp_decode

            return bmp_decode(data)
        if bytes(data[:4]) in (b"II*\x00", b"MM\x00*"):
            # baseline TIFF (tiffcodec.py): strips, none/LZW/PackBits
            from olake_spark.functions.tiffcodec import tiff_decode

            return tiff_decode(data)
        if bytes(data[:4]) == b"RIFF" and bytes(data[8:12]) == b"WEBP":
            # WebP (webpcodec.py): full VP8L lossless pure-python; lossy
            # VP8 via the gated system-libwebp fallback (syscodec.py),
            # raising the documented seam ValueError when absent
            from olake_spark.functions.webpcodec import webp_decode

            return webp_decode(bytes(data))
        if len(data) >= 2 and data[0] == 0x50 and data[1] in b"123456":
            # Netpbm P1-P6 (netpbmcodec.py)
            from olake_spark.functions.netpbmcodec import netpbm_decode

            return netpbm_decode(data)
        if bytes(data[:2]) == b"\x00\x00":
            # possible ICO/CUR (weak magic — is_ico validates the
            # directory before committing): favicons in web crawls
            from olake_spark.functions.icocodec import ico_decode, is_ico

            if is_ico(bytes(data)):
                return ico_decode(bytes(data))
        return png_decode(bytes(data))
    except (struct.error, zlib.error, IndexError) as exc:
        raise ValueError(
            f"truncated or corrupt image payload ({exc})"
        ) from None


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 arrays (inf if equal)."""
    if a.shape != b.shape:
        return float("-inf")
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(arr: np.ndarray) -> int:
    """64-bit perceptual-hash-like fingerprint: 8x8 block-mean vs global mean.

    Deterministic, pure numpy; mirrors the role of the reference's `_olake_id`
    content identity (utils/utils.go:249-270) for image payloads.
    """
    g = arr.astype(np.float64).mean(axis=2)
    h, w = g.shape
    # block-mean downsample to 8x8 (pad to divisible dims)
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        g = np.pad(g, ((0, ph), (0, pw)), mode="edge")
    bh, bw = g.shape[0] // 8, g.shape[1] // 8
    small = g.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (small > small.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v  # to signed int64
