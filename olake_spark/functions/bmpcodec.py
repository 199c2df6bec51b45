"""Pure-numpy BMP (Windows DIB) decoder for uncompressed files.

BMPs show up in Windows-origin training dumps; this closes the last common
still-image container after PNG/JPEG/GIF. ``decode_image`` routes ``BM``
magic here. Supported: BITMAPINFOHEADER (and the larger V4/V5 headers,
which only append fields) with BI_RGB compression at 1/4/8 bpp (palette,
BGRA quads), 24 bpp (BGR) and 32 bpp (BGRX); bottom-up (positive height)
and top-down (negative height) row order; 4-byte row padding. BI_RLE4/8
and BI_BITFIELDS raise a clear ValueError — real encoders write those
rarely, and a loud error beats silent garbage in an ingest pipeline.

Fully vectorized (row-block slicing + np.unpackbits for sub-byte palettes);
no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP to (h, w, 3) uint8 RGB."""
    data = bytes(data)
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP (or truncated header)")
    pix_off = struct.unpack("<I", data[10:14])[0]
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size} (want >= 40)")
    w, h_signed = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    clr_used = struct.unpack("<I", data[46:50])[0]
    if w <= 0 or h_signed == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    if planes != 1:
        raise ValueError(f"bad BMP plane count {planes}")
    if compression != 0:  # BI_RGB only
        raise ValueError(
            f"unsupported BMP compression {compression} (only BI_RGB)"
        )
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed

    palette = None
    if bpp <= 8:
        n = clr_used or (1 << bpp)
        pal_off = 14 + hdr_size
        quads = data[pal_off : pal_off + 4 * n]
        if len(quads) < 4 * n:
            raise ValueError("truncated BMP palette")
        bgra = np.frombuffer(quads, dtype=np.uint8).reshape(n, 4)
        palette = bgra[:, [2, 1, 0]].copy()  # BGRA quads → RGB

    stride = ((w * bpp + 31) // 32) * 4  # rows pad to 4-byte boundaries
    need = stride * h
    if pix_off + need > len(data):
        raise ValueError(
            f"truncated BMP pixel data: need {need} bytes at {pix_off}, "
            f"have {len(data) - pix_off}"
        )
    rows = np.frombuffer(
        data[pix_off : pix_off + need], dtype=np.uint8
    ).reshape(h, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        px = rows[:, : w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 32:
        px = rows[:, : w * 4].reshape(h, w, 4)
        return px[:, :, [2, 1, 0]].copy()  # BGRX → RGB
    if bpp == 8:
        idx = rows[:, :w]
    else:  # 1 or 4 bpp: MSB-first packed indices
        bits = np.unpackbits(rows, axis=1)
        weights = (1 << np.arange(bpp - 1, -1, -1)).astype(np.uint8)
        idx = (bits.reshape(h, -1, bpp) * weights).sum(
            axis=2, dtype=np.uint8
        )[:, :w]
    if idx.max(initial=0) >= len(palette):
        raise ValueError("BMP pixel index beyond palette")
    return palette[idx]
