"""Pure-Python GIF87a/GIF89a decoder (first frame + full animation).

Completes the web-image ingest trio (PNG, JPEG, GIF): ``decode_image``
routes ``GIF8`` magic here for the first composed frame, and
``decode_video`` stacks every composed frame of an animation, so the same
multimodal operators (decode-stats, resize, frame sampling, PSNR verify)
accept real-world GIF payloads unchanged. Mirrors the reference's
opaque-blob ingest of image payloads (types.go image column family) the
same way the PNG/JPEG codecs do.

Spec coverage (GIF89a specification, CompuServe 1990):

- LZW decompression with variable code width (min-code-size+1 … 12 bits,
  LSB-first packing), CLEAR / END-OF-INFORMATION codes, deferred-clear
  streams (dictionary pinned at 4096 until the encoder sends CLEAR), and
  encoders that omit the final EOI.
- Global and local color tables (local overrides global per frame).
- The 4-pass row interlace (rows 0::8, 4::8, 2::4, 1::2).
- Graphic Control Extension: per-frame transparency index and disposal
  methods 0/1 (composite over), 2 (restore rect to background) and
  3 (restore to previous canvas); frame delays exposed as an fps estimate.

NOT on any bench path: the synthetic fixtures are PNG-framed containers,
and LZW's dictionary is stateful per stream, so this decode is a scalar
per-image kernel — exactly like the T.81 Huffman decode in jpegcodec.py.
Scale-out comes from Spark partitioning across images (every caller is an
Arrow-batched pandas UDF), never from per-pixel Python in a hot loop on
the maintenance path.
"""

from __future__ import annotations

import struct

import numpy as np

# 4-pass row interlace (spec appendix E): (row_start, row_step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(mcs: int, data: bytes, npix: int) -> bytearray:
    """GIF-variant LZW: variable-width codes packed LSB-first. Decodes at
    most ``npix`` pixels (defensive: a corrupt stream can't balloon) and
    tolerates a missing END-OF-INFORMATION code at stream end."""
    if not 2 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    table = list(base)
    width = mcs + 1
    out = bytearray()
    prev: bytes | None = None

    acc = 0  # LSB-first bit accumulator
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < npix:
        while nbits < width:
            if pos >= n:  # stream ended without EOI: accept what we have
                return out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:  # first code after (implicit) clear is a literal
            if code >= clear:
                raise ValueError("LZW stream starts with a non-literal code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table size {len(table)}")
        out += entry
        prev = entry
        # width grows when the NEXT code could address the new entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE:
        rows = range(start, h, step)
        out[start::step] = idx[src : src + len(rows)]
        src += len(rows)
    return out


def _color_table(data: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field  # 2^(field+1) entries
    end = pos + 3 * n
    if end > len(data):
        raise ValueError("truncated GIF color table")
    return np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3), end


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a data sub-block sequence; returns (payload, next_pos)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF data sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        if pos + ln > len(data):
            raise ValueError("truncated GIF data sub-blocks")
        chunks.append(data[pos : pos + ln])
        pos += ln


def gif_decode_frames(data: bytes) -> tuple[np.ndarray, list[int]]:
    """Decode every frame of a GIF to a composed (n, h, w, 3) uint8 RGB
    stack plus per-frame delays in centiseconds (0 where unspecified).
    Frames are COMPOSED: each is the full logical-screen canvas after
    drawing that image with its transparency and applying the previous
    frame's disposal, i.e. what a viewer shows — not the raw sub-rects."""
    data = bytes(data)
    if data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_idx, _ar = struct.unpack("<HHBBB", data[6:13])
    from olake_spark.functions.imagecodec import check_dims

    check_dims(w, h, "GIF")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _color_table(data, pos, packed & 0x07)

    if gct is not None and bg_idx < len(gct):
        bg_rgb = gct[bg_idx]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_rgb

    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent = -1
    disposal = 0
    delay = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # Graphic Control
                flags, delay = body[0], struct.unpack("<H", body[1:3])[0]
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else -1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        ix, iy, iw, ih, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if ix + iw > w or iy + ih > h or iw == 0 or ih == 0:
            raise ValueError("GIF frame rect outside logical screen")
        pal = gct
        if ipacked & 0x80:
            pal, pos = _color_table(data, pos, ipacked & 0x07)
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        mcs = data[pos]
        pos += 1
        payload, pos = _sub_blocks(data, pos)
        idx_flat = _lzw_decode(mcs, payload, iw * ih)
        if len(idx_flat) < iw * ih:
            raise ValueError(
                f"GIF frame under-decoded: {len(idx_flat)} of {iw * ih} pixels"
            )
        idx = np.frombuffer(bytes(idx_flat), dtype=np.uint8).reshape(ih, iw)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("GIF pixel index beyond color table")
        if ipacked & 0x40:
            idx = _deinterlace(idx)

        saved = canvas.copy() if disposal == 3 else None
        rect = canvas[iy : iy + ih, ix : ix + iw]
        if transparent >= 0:
            opaque = idx != transparent
            rect[opaque] = pal[idx[opaque]]
        else:
            rect[:] = pal[idx]
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore the RECT to background
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        transparent, disposal, delay = -1, 0, 0

    if not frames:
        raise ValueError("GIF contains no image data")
    return np.stack(frames), delays


def gif_decode(data: bytes) -> np.ndarray:
    """First composed frame as (h, w, 3) uint8 RGB (training-data ingest
    convention for animated payloads, matching libpng's strip conventions
    used in png_decode)."""
    frames, _ = gif_decode_frames(data)
    return frames[0]


def gif_decode_video(data: bytes) -> tuple[np.ndarray, int, int]:
    """decode_video-shaped adapter: (luma frames (n, h, w) uint8, fps_num,
    fps_den). Luma is ITU-R BT.601 integer-rounded from the composed RGB
    frames; fps derives from the median frame delay (centiseconds), with
    the GIF-viewer convention of 10 fps when no delay is specified."""
    frames, delays = gif_decode_frames(data)
    rgb = frames.astype(np.uint32)
    luma = (
        (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2] + 500) // 1000
    ).astype(np.uint8)
    pos_delays = sorted(d for d in delays if d > 0)
    if pos_delays:
        med = pos_delays[len(pos_delays) // 2]
        return luma, 100, med  # delay is in 1/100 s → fps = 100/med
    return luma, 10, 1
