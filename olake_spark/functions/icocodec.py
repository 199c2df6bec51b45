"""Pure-python ICO (Windows icon/cursor) decoder.

ICO files show up in web-crawl training dumps (favicons) and Windows
asset trees. The container is a directory of independently-encoded
images: ICONDIR (reserved=0, type 1=icon / 2=cursor, count) followed by
16-byte ICONDIRENTRYs, each pointing at either a PNG stream (Vista+
256px entries) or a headerless DIB — a BITMAPINFOHEADER whose biHeight
covers BOTH the XOR color raster and the trailing 1-bpp AND transparency
mask (so the stored height is doubled).

Decoding reuses the existing codecs at both seams: PNG entries go to
``imagecodec.png_decode``; DIB entries get a synthesized
BITMAPFILEHEADER (computed pixel offset, halved height) and go to
``bmpcodec.bmp_decode`` — the AND mask trails the XOR raster and is
ignored, matching the repo-wide ingest convention of dropping alpha
(PNG RGBA, TIFF ExtraSamples, 32-bpp BMP X bytes all do the same).

``ico_decode`` picks the best entry by (area, bit depth) — the favicon
convention — or a caller-chosen index; ``ico_entries`` exposes the
directory for callers that want to pick. Malformed directories and
truncated payloads raise ValueError (the loud raster error contract);
16-bpp DIB entries inherit bmp_decode's clear unsupported-depth error.

Reference parity: the reference engine's image utilities delegate icon
containers to the system readers it links (SURVEY.md §2, K2 image
kernels); this is the pure-python equivalent at the same dispatch seam.
"""

from __future__ import annotations

import struct

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def is_ico(data: bytes) -> bool:
    """Cheap magic test for dispatch: ICONDIR shape plus a sane, in-bounds
    first directory entry (the 6-byte header alone is too weak a magic)."""
    if len(data) < 22:
        return False
    res, typ, cnt = struct.unpack("<HHH", data[:6])
    if res != 0 or typ not in (1, 2) or not 1 <= cnt <= 1024:
        return False
    size, off = struct.unpack("<II", data[14:22])
    return size > 0 and off >= 6 + 16 * cnt and off + size <= len(data)


def ico_entries(data: bytes) -> list[dict]:
    """The ICONDIR as a list of dicts: w, h, bpp, size, offset, png."""
    data = bytes(data)
    if len(data) < 6:
        raise ValueError("truncated ICO header")
    res, typ, cnt = struct.unpack("<HHH", data[:6])
    if res != 0 or typ not in (1, 2):
        raise ValueError(f"not an ICO/CUR file (reserved={res}, type={typ})")
    if cnt == 0:
        raise ValueError("ICO with zero directory entries")
    out = []
    for i in range(cnt):
        pos = 6 + 16 * i
        if pos + 16 > len(data):
            raise ValueError(f"truncated ICO directory entry {i}")
        w, h, _colors, _res, _planes, bpp, size, off = struct.unpack(
            "<BBBBHHII", data[pos : pos + 16]
        )
        if off + size > len(data) or size == 0:
            raise ValueError(f"ICO entry {i} payload out of bounds")
        png = data[off : off + 8] == _PNG_SIG
        out.append(
            {
                "w": w or 256,
                "h": h or 256,
                "bpp": bpp,
                "size": size,
                "offset": off,
                "png": png,
            }
        )
    return out


def _decode_dib(payload: bytes) -> np.ndarray:
    """Headerless ICO DIB → synthesize a BITMAPFILEHEADER and reuse
    bmp_decode. biHeight is doubled (XOR raster + AND mask); the mask
    trails the raster and is dropped (alpha-drop ingest convention)."""
    from olake_spark.functions.bmpcodec import bmp_decode

    if len(payload) < 40:
        raise ValueError("truncated ICO DIB header")
    hdr_size = struct.unpack("<I", payload[:4])[0]
    if hdr_size < 40 or hdr_size > len(payload):
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    h2 = struct.unpack("<i", payload[8:12])[0]
    if h2 % 2:
        raise ValueError(f"ICO DIB height {h2} not doubled (XOR+AND)")
    bpp = struct.unpack("<H", payload[14:16])[0]
    clr_used = struct.unpack("<I", payload[32:36])[0]
    ncolors = (clr_used or (1 << bpp)) if bpp <= 8 else 0
    pix_off = 14 + hdr_size + 4 * ncolors
    patched = (
        payload[:8] + struct.pack("<i", h2 // 2 if h2 > 0 else -((-h2) // 2))
        + payload[12:]
    )
    filehdr = b"BM" + struct.pack("<IHHI", 14 + len(patched), 0, 0, pix_off)
    return bmp_decode(filehdr + patched)


def ico_decode(data: bytes, entry: int | None = None) -> np.ndarray:
    """Decode an ICO/CUR file to (h, w, 3) uint8 RGB. Default entry is
    the best one by (area, bit depth); pass ``entry`` to pick by index."""
    data = bytes(data)
    entries = ico_entries(data)
    if entry is None:
        entry = max(
            range(len(entries)),
            key=lambda i: (entries[i]["w"] * entries[i]["h"], entries[i]["bpp"]),
        )
    if not 0 <= entry < len(entries):
        raise ValueError(f"ICO entry {entry} out of range (have {len(entries)})")
    e = entries[entry]
    payload = data[e["offset"] : e["offset"] + e["size"]]
    if e["png"]:
        from olake_spark.functions.imagecodec import png_decode

        return png_decode(payload)
    return _decode_dib(payload)
