"""EXIF orientation for training-data image ingest.

Real-world camera files store the raster unrotated and record the display
transform in EXIF Orientation (tag 0x0112 in IFD0): JPEG carries it in an
APP1 ``Exif\\0\\0`` segment whose payload is a little/big-endian TIFF
stream, PNG in an eXIf chunk (PNG spec 3rd edition §11.3.4.3, payload =
the same TIFF stream), WebP in a VP8X-declared EXIF chunk, and TIFF
natively as tag 274 on the raster IFD itself. An ingest engine that
ignores it feeds sideways pixels to perceptual hashing / dedup / resize,
silently splitting visually identical photos into distinct phash buckets.
``decode_image`` therefore returns DISPLAY-oriented pixels for every
container — the libvips-autorotate / Pillow ``exif_transpose``
convention; libtiff's RGBA interface does the same for TIFF via
``req_orientation = ORIENTATION_TOPLEFT``, which is exactly the oracle
``tests/test_exif.py`` holds the TIFF side to.

Parsing is tolerant by design: EXIF is auxiliary metadata, and a
malformed or truncated EXIF blob must not fail the decode of a perfectly
good raster (the raster error contract stays loud — see
``imagecodec.decode_image``). Any parse trouble, absent tag, or
out-of-range value yields orientation 1 (identity).

Reference parity: the reference engine's image utilities delegate
orientation to the system codecs/readers it links (SURVEY.md §2, K2
image kernels); this module is the pure-python equivalent at the same
seam.
"""

from __future__ import annotations

import struct

import numpy as np

from olake_spark.functions.tiffcodec import _read_ifd

_ORIENTATION_TAG = 274  # 0x0112, SHORT, IFD0
_EXIF_PREFIX = b"Exif\x00\x00"


def apply_orientation(arr: np.ndarray, o: int) -> np.ndarray:
    """Transform a stored raster (first two axes spatial) into display
    orientation per EXIF Orientation value ``o``. Identity (o<=1 or o>8)
    returns the input array unchanged and copy-free; the seven real
    transforms return contiguous copies so downstream ``tobytes()`` /
    Arrow handoff never sees a strided view."""
    if o <= 1 or o > 8:
        return arr
    if o == 2:
        out = arr[:, ::-1]
    elif o == 3:
        out = arr[::-1, ::-1]
    elif o == 4:
        out = arr[::-1]
    elif o == 5:
        out = arr.swapaxes(0, 1)
    elif o == 6:
        out = np.rot90(arr, -1)
    elif o == 7:
        out = arr.swapaxes(0, 1)[::-1, ::-1]
    else:  # 8
        out = np.rot90(arr, 1)
    return np.ascontiguousarray(out)


def orientation_from_exif(payload: bytes) -> int:
    """Orientation from an EXIF payload — a TIFF stream, with or without
    the ``Exif\\0\\0`` APP1 prefix (PNG eXIf and WebP EXIF chunks omit
    it; some writers include it anyway). Tolerant: 1 on anything
    unparseable or out of range."""
    try:
        p = bytes(payload)
        if p[: len(_EXIF_PREFIX)] == _EXIF_PREFIX:
            p = p[len(_EXIF_PREFIX) :]
        if p[:4] == b"II*\x00":
            bo = "<"
        elif p[:4] == b"MM\x00*":
            bo = ">"
        else:
            return 1
        tags = _read_ifd(p, bo)
        vals = tags.get(_ORIENTATION_TAG)
        if not vals:
            return 1
        o = int(vals[0])
        return o if 1 <= o <= 8 else 1
    except (ValueError, struct.error, IndexError):
        return 1


def jpeg_orientation(data: bytes) -> int:
    """Orientation from a JPEG stream's APP1 Exif segment. Walks the
    marker sequence up to SOS (entropy data never scanned); tolerant —
    1 on any malformation, missing APP1, or non-Exif APP1 (e.g. XMP)."""
    try:
        d = bytes(data)
        if d[:2] != b"\xff\xd8":
            return 1
        pos = 2
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                return 1
            marker = d[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2  # standalone markers, no length
                continue
            if marker == 0xDA or marker == 0xD9:  # SOS / EOI: no EXIF past here
                return 1
            (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
            body = d[pos + 4 : pos + 2 + seglen]
            if marker == 0xE1 and body[: len(_EXIF_PREFIX)] == _EXIF_PREFIX:
                return orientation_from_exif(body)
            pos += 2 + seglen
        return 1
    except (ValueError, struct.error, IndexError):
        return 1
