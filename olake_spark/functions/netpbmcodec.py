"""Netpbm (PBM/PGM/PPM) decoder — P1-P6, ASCII and binary.

The interchange format of academic vision datasets and imagemagick
pipelines; trivially structured, so full coverage is cheap. ``decode_image``
routes ``P1``-``P6`` magic here.

- P1/P4: bilevel (1 = black per spec, inverted to 0/255 gray); P4 packs
  rows MSB-first with per-row byte padding.
- P2/P5: grayscale with maxval scaling; P3/P6: RGB with maxval scaling.
- maxval up to 65535 (two-byte big-endian samples in P5/P6, scaled to
  8 bits by integer rounding v*255//maxval — exact for 255 and 65535).
- Comments (#) anywhere in ASCII headers/values per spec.

Vectorized: binary rasters are a single frombuffer + reshape; ASCII
rasters one np.fromstring-equivalent split. No per-pixel Python.
"""

from __future__ import annotations

import re

import numpy as np


def _tokens(data: bytes, need: int, start: int) -> tuple[list[int], int]:
    """Read `need` whitespace-separated ASCII integer tokens starting at
    `start`, skipping '#' comments to end-of-line. Returns (values, pos)."""
    vals: list[int] = []
    pos = start
    n = len(data)
    while len(vals) < need:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if pos < n and data[pos] == 0x23:  # '#' comment
            while pos < n and data[pos] not in (0x0A, 0x0D):
                pos += 1
            continue
        m = re.match(rb"\d+", data[pos:])
        if not m:
            raise ValueError("malformed Netpbm header/raster token")
        vals.append(int(m.group()))
        pos += m.end()
    return vals, pos


def netpbm_decode(data: bytes) -> np.ndarray:
    """Decode any P1-P6 Netpbm image to (h, w, 3) uint8 RGB."""
    data = bytes(data)
    if len(data) < 2 or data[0] != 0x50 or data[1] not in b"123456":
        raise ValueError("not a Netpbm image (want P1-P6 magic)")
    kind = data[1] - 0x30
    bilevel = kind in (1, 4)
    channels = 3 if kind in (3, 6) else 1
    nhead = 2 if bilevel else 3  # bilevel has no maxval field
    head, pos = _tokens(data, nhead, 2)
    w, h = head[0], head[1]
    maxval = 1 if bilevel else head[2]
    if w <= 0 or h <= 0:
        raise ValueError(f"bad Netpbm dimensions {w}x{h}")
    from olake_spark.functions.imagecodec import check_dims

    check_dims(w, h, "Netpbm")
    if not 1 <= maxval <= 65535:
        raise ValueError(f"bad Netpbm maxval {maxval}")

    if kind == 1:  # ASCII bilevel: digits may be unseparated per spec
        body = re.sub(rb"#[^\n\r]*", b"", data[pos:])
        chars = np.frombuffer(body, dtype=np.uint8)
        keep = (chars == 0x30) | (chars == 0x31)
        junk = ~(keep | (chars == 0x20) | (chars == 0x09)
                 | (chars == 0x0A) | (chars == 0x0D) | (chars == 0x0B)
                 | (chars == 0x0C))
        if junk.any():
            raise ValueError("P1 raster contains non-bit characters")
        samples = chars[keep] - 0x30
        if len(samples) < w * h:
            raise ValueError("truncated P1 raster")
        arr = samples[: w * h].astype(np.uint32).reshape(h, w, 1)
    elif kind <= 3:  # ASCII rasters with whitespace-separated values
        vals, _ = _tokens(data, w * h * channels, pos)
        arr = np.array(vals, dtype=np.uint32).reshape(h, w, channels)
    elif kind == 4:  # packed bilevel: exactly ONE whitespace after header
        pos += 1
        stride = (w + 7) // 8
        need = stride * h
        if pos + need > len(data):
            raise ValueError("truncated P4 raster")
        rows = np.frombuffer(data[pos : pos + need], dtype=np.uint8)
        bits = np.unpackbits(rows.reshape(h, stride), axis=1)[:, :w]
        arr = bits.astype(np.uint32).reshape(h, w, 1)
    else:  # P5/P6 binary: one whitespace byte, then samples
        pos += 1
        two = maxval > 255
        need = w * h * channels * (2 if two else 1)
        if pos + need > len(data):
            raise ValueError(f"truncated P{kind} raster")
        raw = np.frombuffer(data[pos : pos + need], dtype=np.uint8)
        if two:  # big-endian two-byte samples per spec
            raw = raw.reshape(-1, 2)
            arr = ((raw[:, 0].astype(np.uint32) << 8) | raw[:, 1]).reshape(
                h, w, channels
            )
        else:
            arr = raw.astype(np.uint32).reshape(h, w, channels)

    if arr.max(initial=0) > maxval:
        raise ValueError("Netpbm sample exceeds declared maxval")
    if bilevel:  # 1 = black per spec
        out = ((1 - arr) * 255).astype(np.uint8)
    elif maxval == 255:
        out = arr.astype(np.uint8)
    else:
        out = ((arr * 255 + maxval // 2) // maxval).astype(np.uint8)
    return np.repeat(out, 3, axis=2) if channels == 1 else out
