"""Pure-numpy BMP (Windows DIB) decoder for uncompressed files.

BMPs show up in Windows-origin training dumps; this closes the last common
still-image container after PNG/JPEG/GIF. ``decode_image`` routes ``BM``
magic here. Supported: BITMAPINFOHEADER (and the larger V4/V5 headers,
which only append fields) with BI_RGB compression at 1/4/8 bpp (palette,
BGRA quads), 24 bpp (BGR) and 32 bpp (BGRX); bottom-up (positive height)
and top-down (negative height) row order; 4-byte row padding. RLE
compression too: BI_RLE8 and BI_RLE4 with the full escape-code set
(runs, absolute mode with word padding, end-of-line, end-of-bitmap,
cursor deltas — skipped pixels fill with palette index 0). BI_BITFIELDS
raises a clear ValueError — a loud error beats silent garbage in an
ingest pipeline.

Fully vectorized (row-block slicing + np.unpackbits for sub-byte palettes);
no per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np


def _rle_decode(data: bytes, pos: int, w: int, h: int, rle4: bool) -> np.ndarray:
    """BI_RLE8/BI_RLE4 escape-coded palette indices → (h, w) uint8 in
    display (top-down) order. The stream is 2-byte packets: (n>0, v) is a
    run of n pixels (RLE4: v's two nibbles alternate), (0,0) ends the
    line, (0,1) ends the bitmap, (0,2) is a (dx, dy) cursor delta, and
    (0, n>=3) is absolute mode — n literal pixels, payload padded to a
    16-bit boundary. Pixels skipped by EOL/EOB/delta stay palette index 0
    (Windows leaves them undefined; 0 is the conventional fill). RLE rows
    are bottom-up; the cursor runs in bottom-up coordinates and the array
    is flipped once at the end. Scalar per-packet loop — same class of
    per-image kernel as PackBits/LZW, off the bench path."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0  # y in bottom-up rows
    n = len(data)
    while True:
        if pos + 2 > n:
            raise ValueError("truncated BMP RLE stream (no end-of-bitmap)")
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP RLE run past row end")
            if rle4:
                pair = np.array([val >> 4, val & 0xF], dtype=np.uint8)
                out[y, x : x + cnt] = np.tile(pair, (cnt + 1) // 2)[:cnt]
            else:
                out[y, x : x + cnt] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                raise ValueError("truncated BMP RLE delta")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > w or y > h:
                raise ValueError("BMP RLE delta out of bounds")
        else:  # absolute mode: val literal pixels, word-aligned payload
            if y >= h or x + val > w:
                raise ValueError("BMP RLE absolute run past row end")
            nbytes = ((val + 1) // 2) if rle4 else val
            nbytes += nbytes & 1  # pad to 16-bit boundary
            if pos + nbytes > n:
                raise ValueError("truncated BMP RLE absolute run")
            chunk = np.frombuffer(data[pos : pos + nbytes], dtype=np.uint8)
            if rle4:
                nib = np.empty(2 * len(chunk), dtype=np.uint8)
                nib[0::2] = chunk >> 4
                nib[1::2] = chunk & 0xF
                out[y, x : x + val] = nib[:val]
            else:
                out[y, x : x + val] = chunk[:val]
            x += val
            pos += nbytes
    return out[::-1]  # bottom-up rows → display order


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode a BMP to (h, w, 3) uint8 RGB — uncompressed BI_RGB at
    1/4/8/24/32 bpp, or RLE-compressed palette files (BI_RLE8/BI_RLE4)."""
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
    from olake_spark.functions.imagecodec import check_dims

    check_dims(w, abs(h_signed), "BMP")
    if planes != 1:
        raise ValueError(f"bad BMP plane count {planes}")
    if compression not in (0, 1, 2):  # BI_RGB / BI_RLE8 / BI_RLE4
        raise ValueError(
            f"unsupported BMP compression {compression} "
            "(BI_RGB/BI_RLE8/BI_RLE4)"
        )
    if compression == 1 and bpp != 8:
        raise ValueError(f"BI_RLE8 requires 8 bpp, got {bpp}")
    if compression == 2 and bpp != 4:
        raise ValueError(f"BI_RLE4 requires 4 bpp, got {bpp}")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = h_signed < 0
    if compression and top_down:
        raise ValueError("RLE BMP must be bottom-up (positive height)")
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

    if compression:  # RLE8/RLE4: decode escape-coded indices directly
        idx = _rle_decode(data, pix_off, w, h, rle4=compression == 2)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("BMP pixel index beyond palette")
        return palette[idx]

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
