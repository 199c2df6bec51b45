"""TIFF decoder vs hand-muxed files, independent compressors, and a real
uncompressed file whose pixel bytes serve as a byte-exact oracle."""

import glob
import struct

import numpy as np
import pytest

from olake_spark.functions import imagecodec as ic
from olake_spark.functions.tiffcodec import tiff_decode


def _packbits_encode(raw: bytes) -> bytes:
    """Independent PackBits compressor: alternate literal and run packets."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        # find run length at i
        j = i
        while j < n - 1 and raw[j + 1] == raw[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 2:
            out += bytes([257 - run, raw[i]])
            i = j + 1
        else:
            # literal stretch until a run of >=3 starts (or 128 bytes)
            k = i
            while k < n and k - i < 128:
                if (k + 2 < n and raw[k] == raw[k + 1] == raw[k + 2]):
                    break
                k += 1
            out += bytes([k - i - 1]) + raw[i:k]
            i = k
    return bytes(out)


def _lzw_encode_tiff(raw: bytes, clear_at: int = 4000) -> bytes:
    """Independent TIFF-LZW compressor. Instead of hand-deriving the
    early-change encoder invariant, it SIMULATES the decoder's table
    growth (one append per emitted code except the first after CLEAR) and
    bumps the write width exactly when the decoder contract says the read
    width bumps (next free entry == 2^width - 1)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    dec_free = 258
    first_after_clear = True

    def emit(code, is_data=True):
        nonlocal acc, nbits, width, dec_free, first_after_clear
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        if code == CLEAR:
            width, dec_free, first_after_clear = 9, 258, True
            return
        if not is_data:
            return
        if first_after_clear:
            first_after_clear = False
        else:
            dec_free += 1
        if dec_free == (1 << width) - 1 and width < 12:
            width += 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    s = b""
    for b in raw:
        c = bytes([b])
        if s + c in table:
            s = s + c
            continue
        emit(table[s])
        table[s + c] = next_code
        next_code += 1
        s = c
        if next_code >= clear_at:
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
    if s:
        emit(table[s])
    emit(EOI, is_data=False)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _mux_tiff(bo, w, h, photometric, strips, bits=(8,), samples=1,
              compression=1, rows_per_strip=None, predictor=None,
              colormap=None, extra=None, tiles=None, planar=None):
    """Hand-mux a single-IFD TIFF. `strips`: list of (already compressed)
    strip payloads — or tile payloads when `tiles=(tw, th)` is given, in
    which case the chunk tags are 322-325 instead of 273/278/279."""
    entries = []

    def entry(tag, typ, values):
        entries.append((tag, typ, values))

    entry(256, 3, [w])
    entry(257, 3, [h])
    entry(258, 3, list(bits))
    entry(259, 3, [compression])
    entry(262, 3, [photometric])
    entry(277, 3, [samples])
    if tiles:
        entry(322, 3, [tiles[0]])
        entry(323, 3, [tiles[1]])
    else:
        entry(278, 3, [rows_per_strip if rows_per_strip else h])
    if planar:
        entry(284, 3, [planar])
    if predictor:
        entry(317, 3, [predictor])
    if colormap is not None:
        entry(320, 3, list(colormap))
    if extra:
        for t, typ, v in extra:
            entry(t, typ, v)

    # layout: header(8) | strips | IFD | overflow values
    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    entry(324 if tiles else 273, 4, strip_offs)
    entry(325 if tiles else 279, 4, [len(s) for s in strips])
    entries.sort()
    ifd_off = pos
    n = len(entries)
    overflow_off = ifd_off + 2 + 12 * n + 4
    sizes = {1: 1, 3: 2, 4: 4}
    codes = {1: "B", 3: "H", 4: "I"}
    ifd = struct.pack(bo + "H", n)
    overflow = b""
    for tag, typ, values in entries:
        total = sizes[typ] * len(values)
        packed = struct.pack(bo + codes[typ] * len(values), *values)
        if total <= 4:
            vfield = packed + b"\x00" * (4 - total)
        else:
            vfield = struct.pack(bo + "I", overflow_off + len(overflow))
            overflow += packed
        ifd += struct.pack(bo + "HHI", tag, typ, len(values)) + vfield
    ifd += struct.pack(bo + "I", 0)  # next-IFD pointer
    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    return (magic + struct.pack(bo + "I", ifd_off) + b"".join(strips)
            + ifd + overflow)


class TestTiffUncompressed:
    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_rgb8_both_byte_orders(self, bo):
        arr = (np.arange(4 * 5 * 3, dtype=np.int64) * 29 % 256).astype(
            np.uint8).reshape(4, 5, 3)
        data = _mux_tiff(bo, 5, 4, 2, [arr.tobytes()], samples=3)
        assert (tiff_decode(data) == arr).all()

    def test_multi_strip_partial_last(self):
        arr = (np.arange(5 * 3 * 3, dtype=np.int64) * 7 % 256).astype(
            np.uint8).reshape(5, 3, 3)
        strips = [arr[0:2].tobytes(), arr[2:4].tobytes(), arr[4:5].tobytes()]
        data = _mux_tiff("<", 3, 5, 2, strips, samples=3, rows_per_strip=2)
        assert (tiff_decode(data) == arr).all()

    def test_gray8_and_whitesiszero(self):
        g = np.array([[0, 100], [200, 255]], dtype=np.uint8)
        d1 = _mux_tiff("<", 2, 2, 1, [g.tobytes()])
        assert (tiff_decode(d1) == np.repeat(g[:, :, None], 3, 2)).all()
        d0 = _mux_tiff("<", 2, 2, 0, [g.tobytes()])
        assert (tiff_decode(d0)
                == np.repeat((255 - g)[:, :, None], 3, 2)).all()

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_gray16_high_byte_per_byte_order(self, bo):
        vals = np.array([[0x1234, 0xFF01]], dtype=np.uint16)
        payload = vals.astype(">u2" if bo == ">" else "<u2").tobytes()
        data = _mux_tiff(bo, 2, 1, 1, [payload], bits=(16,))
        want = np.repeat((vals >> 8).astype(np.uint8)[:, :, None], 3, 2)
        assert (tiff_decode(data) == want).all()

    def test_bilevel_1bit_and_gray4(self):
        bits = [1, 0, 1, 1, 0, 0, 1, 0, 1]  # w=9 spans a byte
        b0 = int("".join(map(str, bits[:8])), 2)
        data = _mux_tiff("<", 9, 1, 1, [bytes([b0, 0x80])], bits=(1,))
        want = np.repeat(
            (np.array([bits], dtype=np.uint8) * 255)[:, :, None], 3, 2)
        assert (tiff_decode(data) == want).all()
        g4 = bytes([0x5A, 0xF0])  # w=3: 5, 10, 15
        d4 = _mux_tiff("<", 3, 1, 1, [g4], bits=(4,))
        want4 = np.repeat(
            (np.array([[5, 10, 15]], dtype=np.uint8) * 17)[:, :, None], 3, 2)
        assert (tiff_decode(d4) == want4).all()

    def test_palette_colormap_high_byte(self):
        # ColorMap: 3*2^bits 16-bit values, R plane then G then B
        pal8 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
        n = 256
        cmap = [0] * (3 * n)
        for i, (r, g, b) in enumerate(pal8):
            cmap[i] = r << 8
            cmap[n + i] = g << 8
            cmap[2 * n + i] = b << 8
        idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        data = _mux_tiff("<", 2, 2, 3, [idx.tobytes()], colormap=cmap)
        assert (tiff_decode(data)
                == np.array(pal8, dtype=np.uint8)[idx]).all()

    def test_rgba_and_gray_alpha_drop(self):
        rgba = np.array([[[1, 2, 3, 200], [4, 5, 6, 0]]], dtype=np.uint8)
        d = _mux_tiff("<", 2, 1, 2, [rgba.tobytes()], samples=4,
                      bits=(8, 8, 8, 8), extra=[(338, 3, [2])])
        assert (tiff_decode(d) == rgba[:, :, :3]).all()
        ga = np.array([[[77, 1], [88, 2]]], dtype=np.uint8)
        d2 = _mux_tiff("<", 2, 1, 1, [ga.tobytes()], samples=2,
                       bits=(8, 8), extra=[(338, 3, [2])])
        assert (tiff_decode(d2)
                == np.repeat(ga[:, :, :1], 3, axis=2)).all()


class TestTiffCompression:
    def test_packbits_roundtrip(self):
        arr = np.zeros((6, 40, 3), dtype=np.uint8)
        arr[:, 10:20] = 200  # runs + literals mix
        arr[:, 25] = np.arange(6 * 3).reshape(6, 3) % 256
        strips = [_packbits_encode(arr[i : i + 2].tobytes())
                  for i in range(0, 6, 2)]
        data = _mux_tiff("<", 40, 6, 2, strips, samples=3,
                         compression=32773, rows_per_strip=2)
        assert (tiff_decode(data) == arr).all()

    @pytest.mark.parametrize("seed", [0, 1])
    def test_lzw_roundtrip_small(self, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 8, size=(10, 30, 3), dtype=np.uint8) * 31
        data = _mux_tiff("<", 30, 10, 2,
                         [_lzw_encode_tiff(arr.tobytes())],
                         samples=3, compression=5)
        assert (tiff_decode(data) == arr).all()

    def test_lzw_width_growth_and_clear(self):
        # 120x120 random bytes -> thousands of entries: widths 9..12 and a
        # mid-stream CLEAR at 4000 entries; any early-change desync corrupts
        rng = np.random.default_rng(42)
        arr = rng.integers(0, 256, size=(120, 120, 3), dtype=np.uint8)
        data = _mux_tiff("<", 120, 120, 2,
                         [_lzw_encode_tiff(arr.tobytes())],
                         samples=3, compression=5)
        assert (tiff_decode(data) == arr).all()

    def test_lzw_with_predictor2(self):
        arr = (np.arange(8 * 50 * 3, dtype=np.int64) % 256).astype(
            np.uint8).reshape(8, 50, 3)
        diff = arr.astype(np.int32).copy()
        diff[:, 1:] -= arr[:, :-1].astype(np.int32)
        payload = (diff & 0xFF).astype(np.uint8).tobytes()
        data = _mux_tiff("<", 50, 8, 2, [_lzw_encode_tiff(payload)],
                         samples=3, compression=5, predictor=2)
        assert (tiff_decode(data) == arr).all()

    def test_predictor2_16bit(self):
        vals = np.array([[0x0100, 0x0203, 0x0102]], dtype=np.uint16)
        diff = vals.astype(np.int64).copy()
        diff[:, 1:] -= vals[:, :-1].astype(np.int64)
        payload = (diff & 0xFFFF).astype("<u2").tobytes()
        data = _mux_tiff("<", 3, 1, 1, [payload], bits=(16,), predictor=2)
        want = np.repeat((vals >> 8).astype(np.uint8)[:, :, None], 3, 2)
        assert (tiff_decode(data) == want).all()


class TestTiffErrors:
    def test_not_a_tiff(self):
        with pytest.raises(ValueError, match="not a TIFF"):
            tiff_decode(b"PK\x03\x04" + b"\x00" * 20)

    def test_bad_tile_dims_and_count(self):
        g = np.zeros((16, 16), dtype=np.uint8)
        with pytest.raises(ValueError, match="tile dimensions"):
            tiff_decode(_mux_tiff("<", 16, 16, 1, [g.tobytes()],
                                  tiles=(12, 16)))
        with pytest.raises(ValueError, match="tile count"):
            tiff_decode(_mux_tiff("<", 32, 16, 1, [g.tobytes()],
                                  tiles=(16, 16)))  # grid needs 2 tiles

    def test_planar_sub_byte_raises(self):
        g = np.zeros((2, 1), dtype=np.uint8)
        planar = _mux_tiff("<", 2, 2, 1, [g.tobytes()], bits=(4,), planar=2)
        with pytest.raises(ValueError, match="planar.*sub-byte"):
            tiff_decode(planar)

    def test_planar_strip_count_mismatch(self):
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        bad = _mux_tiff("<", 2, 2, 2, [img.tobytes()], samples=3, planar=2)
        with pytest.raises(ValueError, match="planar TIFF strip count"):
            tiff_decode(bad)

    def test_deflate_garbage_raises(self):
        bad = _mux_tiff("<", 2, 2, 1, [b"\xde\xad\xbe\xef"], compression=8)
        with pytest.raises(ValueError, match="deflate"):
            tiff_decode(bad)

    def test_unsupported_compression(self):
        d = _mux_tiff("<", 2, 2, 1,
                      [np.zeros(4, dtype=np.uint8).tobytes()], compression=7)
        with pytest.raises(ValueError, match="compression 7"):
            tiff_decode(d)

    def test_short_strip_raises(self):
        d = _mux_tiff("<", 10, 10, 1, [b"\x00" * 5])
        with pytest.raises(ValueError):
            ic.decode_image(d)  # error-contract via the dispatch seam


class TestTiffRealFile:
    """CPython's python.tiff is UNCOMPRESSED 16x16 RGBA with the strip at a
    known offset — its pixel bytes, read here directly from the file, are a
    byte-exact oracle that never touches the production parser."""

    def test_python_tiff_byte_oracle(self):
        paths = glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.tiff"
        ) + glob.glob(
            "/root/.pyenv/versions/*/lib/python*/test/test_email/data/python.tiff"
        )
        if not paths:
            pytest.skip("no python.tiff in container")
        data = open(paths[0], "rb").read()
        # oracle: parse ONLY with struct here — strip offset tag 273,
        # 16x16, 4 samples/px
        want = np.frombuffer(data[8 : 8 + 16 * 16 * 4],
                             dtype=np.uint8).reshape(16, 16, 4)[:, :, :3]
        out = ic.decode_image(data)
        assert (out == want).all()


# ---------------------------------------------------------------------------
# tiles, planar configuration 2, Deflate
# ---------------------------------------------------------------------------


def _tile_split(img, tw, th):
    """Pad to the tile grid and return row-major tile payload bytes —
    derived here independently of the decoder's assembly."""
    h, w = img.shape[:2]
    ty, tx = -(-h // th), -(-w // tw)
    pad = np.zeros((ty * th, tx * tw) + img.shape[2:], img.dtype)
    pad[:h, :w] = img
    return [
        pad[y * th : (y + 1) * th, x * tw : (x + 1) * tw].tobytes()
        for y in range(ty)
        for x in range(tx)
    ]


class TestTiffTiled:
    def test_rgb8_tiled_with_edge_padding(self):
        rng = np.random.default_rng(21)
        img = rng.integers(0, 256, (20, 37, 3), dtype=np.uint8)
        tiles = _tile_split(img, 16, 16)  # 2x3 grid, padded edges
        data = _mux_tiff("<", 37, 20, 2, tiles, samples=3, tiles=(16, 16))
        assert (tiff_decode(data) == img).all()

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_gray16_tiled_both_byte_orders(self, bo):
        rng = np.random.default_rng(22)
        img = rng.integers(0, 65536, (16, 16), dtype=np.uint16)
        raw = img.astype(">u2" if bo == ">" else "<u2").tobytes()
        data = _mux_tiff(bo, 16, 16, 1, [raw], bits=(16,), tiles=(16, 16))
        assert (tiff_decode(data) == np.repeat(
            (img >> 8).astype(np.uint8)[:, :, None], 3, axis=2)).all()

    def test_tiled_lzw_predictor2_restarts_per_tile_row(self):
        # the per-tile differencing property: encoding each tile's rows
        # independently must decode exactly
        rng = np.random.default_rng(23)
        img = rng.integers(0, 256, (18, 30, 3), dtype=np.uint8)
        tiles = []
        for t in _tile_split(img, 16, 16):
            a = np.frombuffer(t, np.uint8).reshape(16, 16, 3).astype(np.int16)
            d = a.copy()
            d[:, 1:] -= a[:, :-1]
            tiles.append(_lzw_encode_tiff((d & 0xFF).astype(np.uint8).tobytes()))
        data = _mux_tiff("<", 30, 18, 2, tiles, samples=3,
                         compression=5, predictor=2, tiles=(16, 16))
        assert (tiff_decode(data) == img).all()

    def test_tiled_deflate(self):
        import zlib

        rng = np.random.default_rng(24)
        img = rng.integers(0, 256, (16, 20, 3), dtype=np.uint8)
        tiles = [zlib.compress(t) for t in _tile_split(img, 16, 16)]
        data = _mux_tiff("<", 20, 16, 2, tiles, samples=3,
                         compression=8, tiles=(16, 16))
        assert (tiff_decode(data) == img).all()

    def test_tiled_palette_4bit(self):
        # sub-byte tiled: 4-bit palette indices pack two per byte per tile row
        idx = (np.arange(16 * 16, dtype=np.uint8) % 13).reshape(16, 16)
        packed = ((idx[:, ::2] << 4) | idx[:, 1::2]).tobytes()
        cmap = list(range(0, 16 * 256, 256)) * 3  # 3 planes x 16 entries
        data = _mux_tiff("<", 16, 16, 3, [packed], bits=(4,),
                         colormap=cmap, tiles=(16, 16))
        pal = (np.array(cmap, dtype=np.uint16).reshape(3, 16).T >> 8
               ).astype(np.uint8)
        assert (tiff_decode(data) == pal[idx]).all()


class TestTiffPlanar:
    def test_rgb8_planar_multi_strip(self):
        rng = np.random.default_rng(25)
        img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        strips = []
        for p in range(3):  # spec order: all strips of plane 0, then 1, 2
            plane = img[:, :, p]
            strips += [plane[i : i + 2].tobytes() for i in range(0, 5, 2)]
        data = _mux_tiff("<", 4, 5, 2, strips, samples=3,
                         rows_per_strip=2, planar=2)
        assert (tiff_decode(data) == img).all()

    def test_rgb16_planar_predictor2_big_endian(self):
        rng = np.random.default_rng(26)
        img = rng.integers(0, 65536, (4, 6, 3), dtype=np.uint16)
        strips = []
        for p in range(3):
            a = img[:, :, p].astype(np.int32)
            d = a.copy()
            d[:, 1:] -= a[:, :-1]
            strips.append((d & 0xFFFF).astype(">u2").tobytes())
        data = _mux_tiff(">", 6, 4, 2, strips, bits=(16,), samples=3,
                         predictor=2, planar=2)
        assert (tiff_decode(data) == (img >> 8).astype(np.uint8)).all()

    def test_rgb8_planar_tiled(self):
        rng = np.random.default_rng(27)
        img = rng.integers(0, 256, (16, 18, 3), dtype=np.uint8)
        tiles = []
        for p in range(3):  # all tiles of plane 0, then plane 1, ...
            tiles += _tile_split(img[:, :, p], 16, 16)
        data = _mux_tiff("<", 18, 16, 2, tiles, samples=3,
                         planar=2, tiles=(16, 16))
        assert (tiff_decode(data) == img).all()

    def test_planar_rgba_extrasamples_dropped(self):
        rng = np.random.default_rng(28)
        img = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
        strips = [img[:, :, p].tobytes() for p in range(4)]
        data = _mux_tiff("<", 3, 3, 2, strips, samples=4, planar=2)
        assert (tiff_decode(data) == img[:, :, :3]).all()


class TestTiffDeflate:
    @pytest.mark.parametrize("code", [8, 32946])
    def test_deflate_strips_both_codes(self, code):
        import zlib

        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
        strips = [zlib.compress(img[i : i + 2].tobytes()) for i in range(0, 6, 2)]
        data = _mux_tiff("<", 7, 6, 2, strips, samples=3,
                         compression=code, rows_per_strip=2)
        assert (tiff_decode(data) == img).all()

    def test_deflate_with_predictor2(self):
        import zlib

        rng = np.random.default_rng(30)
        img = rng.integers(0, 256, (5, 8, 3), dtype=np.uint8)
        a = img.astype(np.int16)
        d = a.copy()
        d[:, 1:] -= a[:, :-1]
        payload = zlib.compress((d & 0xFF).astype(np.uint8).tobytes())
        data = _mux_tiff("<", 8, 5, 2, [payload], samples=3,
                         compression=8, predictor=2)
        assert (tiff_decode(data) == img).all()
