"""Pure-numpy baseline TIFF 6.0 decoder.

TIFFs dominate scanned-document and scientific corpora; this extends the
ingest set (PNG/JPEG/GIF/BMP) with the last classic still container.
``decode_image`` routes ``II*\\0`` / ``MM\\0*`` magic here.

Coverage (TIFF 6.0 spec, baseline + the ubiquitous extensions):

- Both byte orders (II little / MM big), first IFD, inline and offset
  tag values.
- BOTH raster organizations: strips (273/279, multi-strip with a
  partial final strip) and tiles (322-325 — the aerial/scientific-TIFF
  shape: fixed tw x th grid, edge tiles padded to full size, assembled
  then cropped; predictor differencing restarts per tile row, so pixel
  conversion happens per tile before assembly).
- BOTH planar configurations: 1 (chunky) and 2 (separate planes —
  chunks grouped per component, spec order: all of plane 0, then 1, …),
  for strips and tiles alike (8/16-bit samples).
- Compression 1 (none), 32773 (PackBits RLE), 5 (LZW — the TIFF
  variant: MSB-first packing, 9→12-bit codes with libtiff's early-change
  width bump, CLEAR=256/EOI=257), and 8/32946 (Adobe/old Deflate, zlib).
- Predictor 2 (horizontal differencing) at 8 and 16 bits.
- Photometric 0/1 (bilevel+gray, WhiteIsZero inverted), 2 (RGB),
  3 (palette via the 16-bit ColorMap, high byte taken).
- 1/2/4/8/16 bits per sample for gray/palette, 8/16 for RGB; 16-bit
  samples strip to the high byte in the file's byte order (same ingest
  convention as png_decode).
- Gray+alpha and RGBA (ExtraSamples): alpha dropped.
- Orientation tag 274: display-oriented output (exif.py), matching
  libtiff's RGBA interface for 1-4 and the EXIF spec transforms for
  5-8 (where libtiff drops the transpose — pinned test divergence).

Like the JPEG/GIF entropy coders this is a scalar per-image kernel off
the bench path; Spark parallelism is across images in Arrow-batched UDFs.
"""

from __future__ import annotations

import struct

import numpy as np


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n and len(out) < expect:
        b = data[pos]
        pos += 1
        if b < 128:  # literal run of b+1 bytes
            out += data[pos : pos + b + 1]
            pos += b + 1
        elif b > 128:  # repeat next byte 257-b times
            if pos >= n:
                break
            out += bytes([data[pos]]) * (257 - b)
            pos += 1
        # b == 128: noop
    if len(out) < expect:
        raise ValueError(
            f"PackBits strip under-decoded: {len(out)} of {expect} bytes"
        )
    return bytes(out[:expect])


def _lzw_decode_tiff(data: bytes, expect: int) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9-bit initial width,
    CLEAR=256 / EOI=257, and libtiff's early-change convention (the code
    width grows when the next free slot is 2^width - 1, one code earlier
    than the GIF variant)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expect:
        while nbits < width:
            if pos >= n:
                if len(out) < expect:
                    raise ValueError(
                        f"LZW strip under-decoded: {len(out)} of {expect} bytes"
                    )
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW stream starts with a non-literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"TIFF LZW code {code} beyond table size {len(table)}"
            )
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    if len(out) < expect:
        raise ValueError(
            f"LZW strip under-decoded: {len(out)} of {expect} bytes"
        )
    return bytes(out[:expect])


# tag value type → (struct code, size)
_TYPES = {1: ("B", 1), 2: ("B", 1), 3: ("H", 2), 4: ("I", 4),
          6: ("b", 1), 8: ("h", 2), 9: ("i", 4)}


def _read_ifd(data: bytes, bo: str) -> dict[int, list[int]]:
    (off,) = struct.unpack(bo + "I", data[4:8])
    if off + 2 > len(data):
        raise ValueError("truncated TIFF IFD")
    (count,) = struct.unpack(bo + "H", data[off : off + 2])
    tags: dict[int, list[int]] = {}
    for i in range(count):
        epos = off + 2 + 12 * i
        if epos + 12 > len(data):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, cnt = struct.unpack(bo + "HHI", data[epos : epos + 8])
        if typ not in _TYPES:  # RATIONALs etc. — not needed for decode
            continue
        code, size = _TYPES[typ]
        total = size * cnt
        if total <= 4:
            vpos = epos + 8
        else:
            (vpos,) = struct.unpack(bo + "I", data[epos + 8 : epos + 12])
        if vpos + total > len(data):
            raise ValueError(f"truncated TIFF tag {tag} values")
        tags[tag] = list(
            struct.unpack(bo + code * cnt, data[vpos : vpos + total])
        )
    return tags


def _decompress(raw: bytes, expect: int, compression: int, i: int) -> bytes:
    """One strip/tile → exactly `expect` raster bytes."""
    if compression == 1:
        if len(raw) < expect:
            raise ValueError(f"TIFF chunk {i}: {len(raw)} bytes, need {expect}")
        return raw[:expect]
    if compression == 32773:
        return _packbits_decode(raw, expect)
    if compression == 5:
        return _lzw_decode_tiff(raw, expect)
    if compression in (8, 32946):  # Adobe deflate / old deflate — both zlib
        import zlib

        try:
            out = zlib.decompress(raw)
        except zlib.error as exc:
            raise ValueError(f"TIFF deflate chunk {i}: {exc}") from None
        if len(out) < expect:
            raise ValueError(
                f"TIFF deflate chunk {i} under-decoded: "
                f"{len(out)} of {expect} bytes"
            )
        return out[:expect]
    raise ValueError(
        f"unsupported TIFF compression {compression} "
        "(want none/LZW/PackBits/Deflate)"
    )


def _bytes_to_px(buf: bytes, h: int, w: int, samples: int, bits: int,
                 bo: str, predictor: int) -> np.ndarray:
    """Raster bytes of one strip-assembly / tile / plane → (h, w, samples)
    uint8 samples: byte-order-aware 16→8 high-byte strip, sub-byte
    unpacking (MSB-first, rows padded to byte boundaries), predictor-2
    horizontal differencing undone per row."""
    stride = (w * samples * bits + 7) // 8
    rows = np.frombuffer(buf, dtype=np.uint8).reshape(h, stride)
    if bits == 8:
        px = rows[:, : w * samples].reshape(h, w, samples)
        if predictor == 2:
            px = np.cumsum(px, axis=1, dtype=np.uint32).astype(np.uint8)
        return px
    if bits == 16:
        wide = rows[:, : w * samples * 2].reshape(h, w * samples, 2)
        hi, lo = (0, 1) if bo == ">" else (1, 0)
        vals = (wide[:, :, hi].astype(np.uint16) << 8) | wide[:, :, lo]
        vals = vals.reshape(h, w, samples)
        if predictor == 2:
            vals = np.cumsum(vals, axis=1, dtype=np.uint32).astype(np.uint16)
        return (vals >> 8).astype(np.uint8)
    if predictor == 2:
        raise ValueError("TIFF predictor 2 needs 8- or 16-bit samples")
    bits_arr = np.unpackbits(rows, axis=1)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
    return (bits_arr.reshape(h, -1, bits) * weights).sum(
        axis=2, dtype=np.uint8
    )[:, :w].reshape(h, w, 1)


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode a baseline TIFF 6.0 file to (h, w, 3) uint8 RGB — strip or
    tile organized, chunky or planar, compressions
    none/LZW/PackBits/Deflate; see the module docstring for the full
    coverage matrix."""
    data = bytes(data)
    if data[:4] == b"II*\x00":
        bo = "<"
    elif data[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd(data, bo)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w = one(256)
    h = one(257)
    photometric = one(262)
    samples = one(277, 1)
    bits_list = tags.get(258, [1])
    if len(set(bits_list)) != 1:
        raise ValueError(f"mixed TIFF bits-per-sample {bits_list}")
    bits = bits_list[0]
    compression = one(259, 1)
    predictor = one(317, 1)
    planar = one(284, 1)
    if planar not in (1, 2):
        raise ValueError(f"bad TIFF PlanarConfiguration {planar}")
    if planar == 2 and bits < 8:
        raise ValueError("planar TIFF with sub-byte samples not supported")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad TIFF dimensions {w}x{h}")
    from olake_spark.functions.imagecodec import check_dims

    check_dims(w, h, "TIFF")
    if bits not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if bits < 8 and samples != 1:
        raise ValueError("sub-byte TIFF with multiple samples not supported")
    if photometric not in (0, 1, 2, 3):
        raise ValueError(f"unsupported TIFF photometric {photometric}")
    if photometric == 2 and samples < 3:
        raise ValueError("RGB TIFF with fewer than 3 samples")
    if photometric == 3 and (samples != 1 or 320 not in tags):
        raise ValueError("palette TIFF needs 1 sample and a ColorMap")

    tiled = 322 in tags or 323 in tags
    nplanes = samples if planar == 2 else 1
    ns = 1 if planar == 2 else samples  # samples interleaved per chunk row

    if tiled:
        tw, th = one(322), one(323)
        if tw <= 0 or th <= 0 or tw % 16 or th % 16:
            raise ValueError(f"bad TIFF tile dimensions {tw}x{th}")
        offsets, counts = tags.get(324), tags.get(325)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing tile offsets/byte counts")
        tiles_x = -(-w // tw)
        tiles_y = -(-h // th)
        # the assembly canvas is the edge-padded tile grid, which a
        # crafted file can make arbitrarily larger than the (already
        # guarded) w x h — e.g. a 1000x1000 image declaring 32768x32768
        # tiles pads to a 1-GB canvas. Guard the padded extent too.
        check_dims(tiles_x * tw, tiles_y * th, "TIFF tile grid")
        per_plane = tiles_x * tiles_y
        if len(offsets) != per_plane * nplanes:
            raise ValueError(
                f"TIFF tile count {len(offsets)} != grid "
                f"{tiles_x}x{tiles_y}x{nplanes}"
            )
        tile_stride = (tw * ns * bits + 7) // 8
        planes = []
        for p in range(nplanes):
            canvas = np.zeros((tiles_y * th, tiles_x * tw, ns), np.uint8)
            for t in range(per_plane):
                i = p * per_plane + t
                raw = data[offsets[i] : offsets[i] + counts[i]]
                if len(raw) < counts[i]:
                    raise ValueError("truncated TIFF tile data")
                buf = _decompress(raw, th * tile_stride, compression, i)
                # predictor differencing restarts per TILE row, so pixel
                # conversion must happen per tile, before assembly
                px_t = _bytes_to_px(buf, th, tw, ns, bits, bo, predictor)
                y, x = (t // tiles_x) * th, (t % tiles_x) * tw
                canvas[y : y + th, x : x + tw] = px_t
            planes.append(canvas[:h, :w])
        px = planes[0] if nplanes == 1 else np.concatenate(planes, axis=2)
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF missing strip offsets/byte counts")
        rows_per_strip = one(278, h)
        strips_per_plane = -(-h // rows_per_strip) if rows_per_strip else 0
        if nplanes > 1 and len(offsets) != strips_per_plane * nplanes:
            raise ValueError(
                f"planar TIFF strip count {len(offsets)} != "
                f"{strips_per_plane}x{nplanes}"
            )
        stride = (w * ns * bits + 7) // 8  # rows pad to byte boundaries
        planes = []
        for p in range(nplanes):
            chunks = []
            for s in range(len(offsets) // nplanes):
                i = p * (len(offsets) // nplanes) + s
                rows = min(rows_per_strip, h - s * rows_per_strip)
                if rows <= 0:
                    raise ValueError("more TIFF strips than image rows")
                raw = data[offsets[i] : offsets[i] + counts[i]]
                if len(raw) < counts[i]:
                    raise ValueError("truncated TIFF strip data")
                chunks.append(_decompress(raw, rows * stride, compression, i))
            planes.append(
                _bytes_to_px(b"".join(chunks), h, w, ns, bits, bo, predictor)
            )
        px = planes[0] if nplanes == 1 else np.concatenate(planes, axis=2)

    if photometric == 3:
        cmap = tags[320]
        n = 1 << bits
        if len(cmap) < 3 * n:
            raise ValueError("TIFF ColorMap shorter than 3*2^bits")
        pal = (np.array(cmap[: 3 * n], dtype=np.uint16).reshape(3, n).T >> 8
               ).astype(np.uint8)
        idx = px[:, :, 0]
        rgb = pal[idx]
    elif photometric == 2:
        rgb = px[:, :, :3].copy() if samples > 3 else px
    else:
        # gray (0/1): scale sub-byte to full range, drop any alpha sample
        g = px[:, :, :1]
        if bits < 8:
            g = g * np.uint8(255 // ((1 << bits) - 1))
        if photometric == 0:  # WhiteIsZero
            g = np.uint8(255) - g
        rgb = np.repeat(g, 3, axis=2)
    # tag 274: return display orientation, as libtiff's RGBA interface
    # does under req_orientation=TOPLEFT (lazy import: exif.py reuses
    # this module's _read_ifd)
    from olake_spark.functions.exif import apply_orientation

    return apply_orientation(rgb, one(274, 1))
