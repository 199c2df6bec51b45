"""WebP / VP8L codec tests.

Three independent validation layers:

1. A REAL libwebp-produced bitstream: the lossless ``ALPH`` chunk of
   CPython's 16x16 ``python.webp`` test asset, byte-checked against the
   alpha plane derived (in this file, straight from zlib + the tRNS
   chunk — not via imagecodec) from its sibling ``python.png``.  That
   stream exercises the color-indexing transform, the delta-coded
   palette, complex code-length codes with all three repeat codes
   (16/17/18 — including the storage-order subtlety that symbol 16
   sits at position 8), and LZ77 backward references.
2. Hand-built per-feature micro-streams for everything the real vector
   and the encoder don't reach: color cache, meta prefix codes, the
   predictor / cross-color / subtract-green transforms, sub-byte pixel
   bundling, plane-code and direct LZ77 distances, overlap copies.
3. Encoder round trips (shapes, gray/RGB/RGBA, skewed histograms that
   force Huffman length-limiting) — these also make ``webp_encode`` a
   tested egest path.
"""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from olake_spark.functions.webpcodec import (
    _BitReader,
    _BitWriter,
    _PrefixCode,
    _PLANE_CODES,
    _canonical_codes,
    _huffman_lengths,
    _wrap_vp8l,
    _write_prefix_code,
    vp8l_decode,
    webp_alpha,
    webp_decode,
    webp_decode_rgba,
    webp_encode,
)


# ---------------------------------------------------------------------------
# helpers for hand-building VP8L streams
# ---------------------------------------------------------------------------


def _lz_sym(value: int) -> tuple[int, int, int]:
    """Invert the LZ77 prefix coding: value -> (symbol, n_extra, extra)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    extra = x.bit_length() - 2
    hi = x >> extra
    sym = 2 * extra + hi
    return sym, extra, x - (hi << extra)


def _cache_key(px: int, bits: int) -> int:
    return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)


class _StreamBuilder:
    """Raw VP8L stream writer for per-feature decoder tests."""

    def __init__(self, w: int, h: int):
        self.bw = _BitWriter()
        self.bw.write(14, w - 1)
        self.bw.write(14, h - 1)
        self.bw.write(1, 0)  # alpha hint
        self.bw.write(3, 0)  # version

    def no_transforms(self):
        self.bw.write(1, 0)
        return self

    def cache(self, bits: int):
        if bits:
            self.bw.write(1, 1)
            self.bw.write(4, bits)
        else:
            self.bw.write(1, 0)
        return self

    def no_meta(self):
        self.bw.write(1, 0)
        return self

    def codes(self, green_freqs, red_freqs, blue_freqs, alpha_freqs, dist_freqs,
              green_alphabet=280):
        self.g = _write_prefix_code(self.bw, green_freqs, green_alphabet)
        self.r = _write_prefix_code(self.bw, red_freqs, 256)
        self.b = _write_prefix_code(self.bw, blue_freqs, 256)
        self.a = _write_prefix_code(self.bw, alpha_freqs, 256)
        self.d = _write_prefix_code(self.bw, dist_freqs, 40)
        return self

    def literal(self, a, r, g, b):
        self.bw.write_code(*self.g[g])
        self.bw.write_code(*self.r[r])
        self.bw.write_code(*self.b[b])
        self.bw.write_code(*self.a[a])
        return self

    def copy(self, length: int, dist_code_value: int):
        sym, n, extra = _lz_sym(length)
        self.bw.write_code(*self.g[256 + sym])
        if n:
            self.bw.write(n, extra)
        sym, n, extra = _lz_sym(dist_code_value)
        self.bw.write_code(*self.d[sym])
        if n:
            self.bw.write(n, extra)
        return self

    def cache_ref(self, idx: int):
        self.bw.write_code(*self.g[280 + idx])
        return self

    def payload(self) -> bytes:
        return b"\x2f" + self.bw.getvalue()


def _argb(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


# ---------------------------------------------------------------------------
# bit I/O and prefix-code plumbing
# ---------------------------------------------------------------------------


class TestBitIO:
    def test_round_trip_lsb_first(self):
        bw = _BitWriter()
        fields = [(1, 1), (14, 12345), (3, 5), (8, 0xA7), (2, 2), (7, 99)]
        for n, v in fields:
            bw.write(n, v)
        br = _BitReader(bw.getvalue())
        for n, v in fields:
            assert br.read(n) == v

    def test_truncation_raises(self):
        br = _BitReader(b"\xff")
        br.read(6)
        with pytest.raises(ValueError, match="truncated"):
            br.read(4)

    def test_write_code_msb_first(self):
        bw = _BitWriter()
        bw.write_code(3, 0b101)  # emitted MSB-first: bits 1,0,1
        data = bw.getvalue()
        assert [(data[0] >> i) & 1 for i in range(3)] == [1, 0, 1]


class TestPrefixCode:
    def test_canonical_decode(self):
        # lengths: a:1, b:2, c:2 -> codes a=0, b=10, c=11
        code = _PrefixCode([1, 2, 2])
        bw = _BitWriter()
        for bits in ([0], [1, 0], [1, 1], [0]):
            for b in bits:
                bw.write(1, b)
        br = _BitReader(bw.getvalue())
        assert [code.read(br) for _ in range(4)] == [0, 1, 2, 0]

    def test_single_symbol_reads_zero_bits(self):
        code = _PrefixCode([0, 0, 5, 0])
        br = _BitReader(b"")
        assert code.read(br) == 2 and br.pos == 0

    def test_oversubscribed_rejected(self):
        with pytest.raises(ValueError, match="over-subscribed"):
            _PrefixCode([1, 1, 1])

    def test_incomplete_rejected(self):
        with pytest.raises(ValueError, match="incomplete"):
            _PrefixCode([2, 2, 2])  # kraft 3/4

    def test_two_symbol_read_order_not_symbol_order(self):
        # simple codes assign code 0 to the FIRST symbol read, even when
        # it is numerically larger
        code = _PrefixCode.from_pair(9, 3)
        br = _BitReader(bytes([0b10]))
        assert code.read(br) == 9
        assert code.read(br) == 3


class TestPlaneCodes:
    def test_table_shape_and_spec_rows(self):
        assert len(_PLANE_CODES) == 120
        # first rows of the spec's distance-mapping table
        assert _PLANE_CODES[:12] == [
            (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
            (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
        ]
        assert _PLANE_CODES[34] == (0, 5)
        assert _PLANE_CODES[96] == (8, 0)
        assert _PLANE_CODES[119] == (8, 7)
        assert len(set(_PLANE_CODES)) == 120


class TestHuffmanLengths:
    @pytest.mark.parametrize("seed", range(5))
    def test_complete_code_random(self, seed):
        rng = np.random.default_rng(seed)
        freqs = {int(s): int(f) for s, f in enumerate(rng.integers(1, 10_000, 80))}
        lengths = _huffman_lengths(freqs, 15)
        assert max(lengths.values()) <= 15
        assert sum(2.0 ** -l for l in lengths.values()) == 1.0

    def test_fibonacci_skew_forces_limiting(self):
        # Fibonacci frequencies give depth ~n for plain Huffman
        fib = [1, 1]
        while len(fib) < 24:
            fib.append(fib[-1] + fib[-2])
        lengths = _huffman_lengths(dict(enumerate(fib)), 15)
        assert max(lengths.values()) <= 15
        assert sum(2.0 ** -l for l in lengths.values()) == 1.0


# ---------------------------------------------------------------------------
# encoder round trips
# ---------------------------------------------------------------------------


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shape", [(1, 1, 3), (3, 5, 3), (16, 16, 3), (7, 1, 4), (1, 9, 4), (33, 47, 4)]
    )
    def test_random(self, shape):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        enc = webp_encode(img)
        dec = webp_decode_rgba(enc) if shape[-1] == 4 else webp_decode(enc)
        assert dec.shape == img.shape and (dec == img).all()

    def test_gray_replicates(self):
        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, (9, 13), dtype=np.uint8)
        assert (webp_decode(webp_encode(g)) == np.stack([g, g, g], -1)).all()

    def test_constant_single_symbol_codes(self):
        c = np.full((5, 6, 3), 42, np.uint8)
        assert (webp_decode(webp_encode(c)) == c).all()

    def test_skewed_histogram_length_limit(self):
        # exponential value skew pushes plain Huffman past 15 bits
        rng = np.random.default_rng(11)
        vals = np.minimum(
            rng.geometric(0.35, size=96 * 64 * 3), 50
        ).astype(np.uint8)
        img = vals.reshape(96, 64, 3)
        assert (webp_decode(webp_encode(img)) == img).all()

    def test_alpha_survives(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
        assert (webp_decode_rgba(webp_encode(img)) == img).all()
        assert (webp_alpha(webp_encode(img)) == img[:, :, 3]).all()


# ---------------------------------------------------------------------------
# hand-built per-feature streams
# ---------------------------------------------------------------------------


class TestHandBuiltStreams:
    def test_simple_two_symbol_code(self):
        sb = _StreamBuilder(2, 1).no_transforms().cache(0).no_meta()
        sb.codes({10: 1, 20: 1}, {1: 1}, {2: 1}, {255: 1}, {0: 1})
        sb.literal(255, 1, 10, 2).literal(255, 1, 20, 2)
        img = vp8l_decode(sb.payload())
        assert img.tolist() == [[_argb(255, 1, 10, 2), _argb(255, 1, 20, 2)]]

    def test_lz77_direct_distance(self):
        # distance VALUE 121 -> raw distance 1 (121 - 120)
        sb = _StreamBuilder(4, 1).no_transforms().cache(0).no_meta()
        sb.codes({7: 1, 256 + _lz_sym(3)[0]: 1}, {0: 1}, {0: 1}, {255: 1},
                 {_lz_sym(121)[0]: 1})
        sb.literal(255, 0, 7, 0).copy(3, 121)
        img = vp8l_decode(sb.payload())
        assert (img == _argb(255, 0, 7, 0)).all()

    def test_lz77_plane_code_row_above(self):
        # plane code 1 = (0, 1) -> distance == xsize (the pixel above)
        w = 5
        greens = list(range(1, 6))
        gf = {g: 1 for g in greens}
        gf[256 + _lz_sym(w)[0]] = 1
        sb = _StreamBuilder(w, 2).no_transforms().cache(0).no_meta()
        sb.codes(gf, {0: 1}, {0: 1}, {255: 1}, {_lz_sym(1)[0]: 1})
        for g in greens:
            sb.literal(255, 0, g, 0)
        sb.copy(w, 1)  # copy the whole first row
        img = vp8l_decode(sb.payload())
        assert (img[0] == img[1]).all()
        assert [((p >> 8) & 0xFF) for p in img[0].tolist()] == greens

    def test_lz77_overlap_run(self):
        # dist 1 (plane code 2 = (1,0)), length 6: classic RLE overlap
        sb = _StreamBuilder(7, 1).no_transforms().cache(0).no_meta()
        sb.codes({9: 1, 256 + _lz_sym(6)[0]: 1}, {0: 1}, {0: 1}, {255: 1},
                 {_lz_sym(2)[0]: 1})
        sb.literal(255, 0, 9, 0).copy(6, 2)
        img = vp8l_decode(sb.payload())
        assert (img == _argb(255, 0, 9, 0)).all()

    def test_color_cache(self):
        bits = 4
        px = _argb(255, 1, 2, 3)
        sb = _StreamBuilder(3, 1).no_transforms().cache(bits).no_meta()
        sb.codes({2: 1, 40: 1, 280 + _cache_key(px, bits): 1}, {1: 1, 0: 1},
                 {3: 1, 0: 1}, {255: 1}, {0: 1},
                 green_alphabet=280 + (1 << bits))
        sb.literal(255, 1, 2, 3).literal(255, 0, 40, 0)
        sb.cache_ref(_cache_key(px, bits))
        img = vp8l_decode(sb.payload())
        assert img[0, 2] == px and img[0, 0] == px

    def test_subtract_green(self):
        sb = _StreamBuilder(1, 1)
        sb.bw.write(1, 1)  # a transform
        sb.bw.write(2, 2)  # subtract-green
        sb.bw.write(1, 0)  # no more transforms
        sb.cache(0).no_meta()
        sb.codes({200: 1}, {10: 1}, {30: 1}, {255: 1}, {0: 1})
        sb.literal(255, 10, 200, 30)
        img = vp8l_decode(sb.payload())
        assert img[0, 0] == _argb(255, (10 + 200) & 0xFF, 200, (30 + 200) & 0xFF)

    def _predictor_stream(self, w, h, mode, residuals):
        """Build a stream with one predictor tile of `mode` over the whole
        image and the given ARGB residual pixels (row-major)."""
        sb = _StreamBuilder(w, h)
        sb.bw.write(1, 1)
        sb.bw.write(2, 0)  # predictor
        size_bits = 5  # 32-px tiles -> single tile here
        sb.bw.write(3, size_bits - 2)
        # tile sub-image: 1x1, mode in green channel
        tb = _BitWriter()
        tb.write(1, 0)  # no cache
        tg = _write_prefix_code(tb, {mode: 1}, 280)
        tr = _write_prefix_code(tb, {0: 1}, 256)
        tbl = _write_prefix_code(tb, {0: 1}, 256)
        ta = _write_prefix_code(tb, {255: 1}, 256)
        _write_prefix_code(tb, {0: 1}, 40)
        # all five tile codes are single-symbol (0 bits): no pixel payload
        sb.bw.append(tb)
        sb.bw.write(1, 0)  # no more transforms
        sb.cache(0).no_meta()
        gf, rf, bf, af = ({} for _ in range(4))
        for a, r, g, b in residuals:
            gf[g] = gf.get(g, 0) + 1
            rf[r] = rf.get(r, 0) + 1
            bf[b] = bf.get(b, 0) + 1
            af[a] = af.get(a, 0) + 1
        sb.codes(gf, rf, bf, af, {0: 1})
        for a, r, g, b in residuals:
            sb.literal(a, r, g, b)
        return vp8l_decode(sb.payload())

    def test_predictor_mode0_black(self):
        img = self._predictor_stream(2, 2, 0, [(0, 5, 6, 7)] * 4)
        # pixel 0: pred 0xff000000; row 0 uses LEFT, col 0 uses TOP
        assert img[0, 0] == _argb(255, 5, 6, 7)
        assert img[0, 1] == _argb(255, 10, 12, 14)  # left + residual
        assert img[1, 0] == _argb(255, 10, 12, 14)  # top + residual
        assert img[1, 1] == _argb(255, 5, 6, 7)  # mode 0 -> black + res

    def test_predictor_mode2_top(self):
        res = [(0, 9, 9, 9), (0, 1, 1, 1), (0, 2, 2, 2), (0, 3, 3, 3)]
        img = self._predictor_stream(2, 2, 2, res)
        assert img[1, 0] == _argb(255, 11, 11, 11)  # top(col0 rule) + 2
        assert img[1, 1] == _argb(255, 13, 13, 13)  # mode 2: top + 3

    def test_predictor_mode11_select(self):
        # L == TL -> gradient favors top
        res = [(0, 10, 10, 10), (0, 0, 0, 0), (0, 0, 0, 0), (0, 1, 1, 1)]
        img = self._predictor_stream(2, 2, 11, res)
        # T = (255,10,10,10), L = TL = (255,10,10,10): select -> top
        assert img[1, 1] == _argb(255, 11, 11, 11)

    def test_predictor_mode12_clamp_full(self):
        res = [(0, 100, 100, 100), (0, 200, 200, 200), (0, 0, 0, 0),
               (0, 0, 0, 0)]
        img = self._predictor_stream(2, 2, 12, res)
        # L=(255,44,44,44)? no: row0: px1 = left+res = (255,300%256=44...)
        l = img[1, 0]
        t = img[0, 1]
        tl = img[0, 0]
        for sh in (24, 16, 8, 0):
            v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
            v = 0 if v < 0 else 255 if v > 255 else v
            assert ((int(img[1, 1]) >> sh) & 0xFF) == v  # residual 0

    def test_cross_color(self):
        # one tile, green_to_red=32 (=> +green), others 0
        sb = _StreamBuilder(1, 1)
        sb.bw.write(1, 1)
        sb.bw.write(2, 1)  # cross-color
        sb.bw.write(3, 5 - 2)
        tb = _BitWriter()
        tb.write(1, 0)
        _write_prefix_code(tb, {0: 1}, 280)   # green (g2b) = 0
        _write_prefix_code(tb, {0: 1}, 256)   # red (r2b) = 0
        _write_prefix_code(tb, {32: 1}, 256)  # blue channel carries g2r
        _write_prefix_code(tb, {255: 1}, 256)
        _write_prefix_code(tb, {0: 1}, 40)
        sb.bw.append(tb)
        sb.bw.write(1, 0)
        sb.cache(0).no_meta()
        sb.codes({100: 1}, {10: 1}, {20: 1}, {255: 1}, {0: 1})
        sb.literal(255, 10, 100, 20)
        img = vp8l_decode(sb.payload())
        # green=100 (signed 100), delta=(32*100)>>5 = 100 -> red=110
        assert img[0, 0] == _argb(255, 110, 100, 20)

    def test_cross_color_signed_channel(self):
        # green=200 is signed -56: delta = (32 * -56) >> 5 = -56
        sb = _StreamBuilder(1, 1)
        sb.bw.write(1, 1)
        sb.bw.write(2, 1)
        sb.bw.write(3, 0)
        tb = _BitWriter()
        tb.write(1, 0)
        _write_prefix_code(tb, {0: 1}, 280)
        _write_prefix_code(tb, {0: 1}, 256)
        _write_prefix_code(tb, {32: 1}, 256)
        _write_prefix_code(tb, {255: 1}, 256)
        _write_prefix_code(tb, {0: 1}, 40)
        sb.bw.append(tb)
        sb.bw.write(1, 0)
        sb.cache(0).no_meta()
        sb.codes({200: 1}, {10: 1}, {0: 1}, {255: 1}, {0: 1})
        sb.literal(255, 10, 200, 0)
        img = vp8l_decode(sb.payload())
        assert ((int(img[0, 0]) >> 16) & 0xFF) == (10 - 56) & 0xFF

    def test_palette_bundling_two_colors(self):
        # 2 colors -> 1-bit pixels, 8 per packed byte; width 10 -> packed 2
        w, h = 10, 1
        pattern = [0, 1, 1, 0, 1, 0, 0, 1, 1, 1]
        c0, c1 = _argb(255, 10, 20, 30), _argb(255, 40, 50, 60)
        sb = _StreamBuilder(w, h)
        sb.bw.write(1, 1)
        sb.bw.write(2, 3)  # color indexing
        sb.bw.write(8, 2 - 1)
        # palette sub-image (2x1), delta coded: entry0 = c0, entry1 = c1-c0
        pb = _BitWriter()
        pb.write(1, 0)
        d_a, d_r = 0, (40 - 10) & 0xFF
        d_g, d_b = (50 - 20) & 0xFF, (60 - 30) & 0xFF
        pg = _write_prefix_code(pb, {20: 1, d_g: 1}, 280)
        pr = _write_prefix_code(pb, {10: 1, d_r: 1}, 256)
        pbl = _write_prefix_code(pb, {30: 1, d_b: 1}, 256)
        pa = _write_prefix_code(pb, {255: 1, d_a: 1}, 256)
        _write_prefix_code(pb, {0: 1}, 40)
        for a, r, g, b in ((255, 10, 20, 30), (d_a, d_r, d_g, d_b)):
            pb.write_code(*pg[g])
            pb.write_code(*pr[r])
            pb.write_code(*pbl[b])
            pb.write_code(*pa[a])
        sb.bw.append(pb)
        sb.bw.write(1, 0)  # no more transforms
        # main image: packed width 2, indices bundled LSB-first in green
        packed = [0, 0]
        for x, bit in enumerate(pattern):
            packed[x >> 3] |= bit << (x & 7)
        sb.cache(0).no_meta()
        sb.codes({packed[0]: 1, packed[1]: 1 + (packed[0] == packed[1])},
                 {0: 1}, {0: 1}, {255: 1}, {0: 1})
        for p in packed:
            sb.literal(255, 0, p, 0)
        img = vp8l_decode(sb.payload())
        assert img.shape == (1, 10)
        assert img[0].tolist() == [c1 if b else c0 for b in pattern]

    def test_meta_prefix_two_groups(self):
        # 16x1 image, 8-px tiles -> 2 meta tiles selecting different codes
        w = 16
        sb = _StreamBuilder(w, 1)
        sb.bw.write(1, 0)  # no transforms
        sb.cache(0)
        sb.bw.write(1, 1)  # meta prefix codes present
        meta_bits = 3
        sb.bw.write(3, meta_bits - 2)
        # entropy image 2x1: indices 0 and 1 in (r<<8)|g
        mb = _BitWriter()
        mb.write(1, 0)
        mg = _write_prefix_code(mb, {0: 1, 1: 1}, 280)
        mr = _write_prefix_code(mb, {0: 1}, 256)
        mbl = _write_prefix_code(mb, {0: 1}, 256)
        ma = _write_prefix_code(mb, {255: 1}, 256)
        _write_prefix_code(mb, {0: 1}, 40)
        for g in (0, 1):
            mb.write_code(*mg[g])
        sb.bw.append(mb)
        # two groups: group 0 emits green 11, group 1 emits green 22
        g0 = (
            _write_prefix_code(sb.bw, {11: 1}, 280),
            _write_prefix_code(sb.bw, {1: 1}, 256),
            _write_prefix_code(sb.bw, {2: 1}, 256),
            _write_prefix_code(sb.bw, {255: 1}, 256),
            _write_prefix_code(sb.bw, {0: 1}, 40),
        )
        g1 = (
            _write_prefix_code(sb.bw, {22: 1}, 280),
            _write_prefix_code(sb.bw, {3: 1}, 256),
            _write_prefix_code(sb.bw, {4: 1}, 256),
            _write_prefix_code(sb.bw, {255: 1}, 256),
            _write_prefix_code(sb.bw, {0: 1}, 40),
        )
        assert all(c[next(iter(c))][0] == 0 for grp in (g0, g1) for c in grp)
        img = vp8l_decode(sb.payload())  # all codes 0-bit: no pixel payload
        row = [((p >> 8) & 0xFF, (p >> 16) & 0xFF) for p in img[0].tolist()]
        assert row[:8] == [(11, 1)] * 8
        assert row[8:] == [(22, 3)] * 8


# ---------------------------------------------------------------------------
# container walk + error contract
# ---------------------------------------------------------------------------


class TestContainer:
    def test_decode_image_dispatch(self):
        from olake_spark.functions.imagecodec import decode_image

        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
        assert (decode_image(webp_encode(img)) == img).all()

    def test_lossy_vp8_garbage_raises(self):
        # a 'VP8 ' chunk of zeros: with system libwebp present the gated
        # fallback rejects the malformed stream; without it the documented
        # seam message fires — ValueError either way (decode_image contract)
        from olake_spark.functions.syscodec import have

        payload = b"\x00" * 20
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
        data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        pattern = "libwebp could not decode" if have("webp") else "lossy WebP"
        with pytest.raises(ValueError, match=pattern):
            webp_decode(data)

    def test_not_webp(self):
        with pytest.raises(ValueError, match="not a WebP"):
            webp_decode(b"RIFF\x04\x00\x00\x00WAVE")

    def test_truncated_stream(self):
        enc = webp_encode(np.full((4, 4, 3), 9, np.uint8))
        with pytest.raises(ValueError):
            webp_decode(enc[:-3] + b"")

    def test_bad_signature(self):
        with pytest.raises(ValueError, match="signature"):
            vp8l_decode(b"\x30\x00\x00\x00\x00")

    def test_decode_image_error_contract(self):
        from olake_spark.functions.imagecodec import decode_image

        with pytest.raises(ValueError):
            decode_image(b"RIFF\xff\xff\x00\x00WEBPVP8L")


# ---------------------------------------------------------------------------
# the real libwebp vector
# ---------------------------------------------------------------------------


def _find_asset(name: str) -> str | None:
    hits = glob.glob(
        f"/root/.pyenv/versions/*/lib/python*/test/**/{name}", recursive=True
    )
    return sorted(hits)[-1] if hits else None


def _png_palette_alpha(path: str) -> np.ndarray:
    """Alpha plane of an 8-bit palette PNG, derived directly from zlib +
    tRNS — independent of olake_spark.imagecodec."""
    d = open(path, "rb").read()
    off = 8
    ihdr = trns = None
    idat = b""
    while off < len(d):
        ln = struct.unpack(">I", d[off : off + 4])[0]
        tag = d[off + 4 : off + 8]
        body = d[off + 8 : off + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"tRNS":
            trns = body
        elif tag == b"IDAT":
            idat += body
        off += 12 + ln
    w, h, depth, ctype, *_ = ihdr
    assert depth == 8 and ctype == 3 and trns is not None
    raw = zlib.decompress(idat)
    stride = w + 1
    idx = np.zeros((h, w), np.uint8)
    prev = np.zeros(w, np.uint8)
    for y in range(h):
        f = raw[y * stride]
        row = np.frombuffer(raw[y * stride + 1 : (y + 1) * stride], np.uint8).copy()
        if f == 1:
            for x in range(1, w):
                row[x] = (int(row[x]) + int(row[x - 1])) & 0xFF
        elif f == 2:
            row = ((row.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif f != 0:
            pytest.skip(f"unexpected PNG filter {f} in ground-truth asset")
        idx[y] = row
        prev = row
    at = np.frombuffer(trns, np.uint8)
    return np.where(idx < len(at), at[np.minimum(idx, len(at) - 1)], 255).astype(
        np.uint8
    )


class TestRealLibwebpVector:
    def test_alph_stream_matches_png_ground_truth(self):
        webp_path = _find_asset("python.webp")
        png_path = _find_asset("python.png")
        if not webp_path or not png_path:
            pytest.skip("CPython python.webp/python.png assets not present")
        data = open(webp_path, "rb").read()
        gt = _png_palette_alpha(png_path)
        alpha = webp_alpha(data)
        assert alpha.shape == gt.shape == (16, 16)
        assert (alpha == gt).all()
        # the stream's palette transform should cover every distinct value
        assert len(np.unique(alpha)) == 69

    def test_lossy_color_payload_gated_fallback(self):
        # lossy VP8 color: decodes through the gated syscodec/libwebp
        # fallback when the system library is present, otherwise raises
        # the documented seam ValueError
        from olake_spark.functions.syscodec import have

        webp_path = _find_asset("python.webp")
        if not webp_path:
            pytest.skip("python.webp not present")
        data = open(webp_path, "rb").read()
        if have("webp"):
            rgb = webp_decode(data)
            assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
        else:
            with pytest.raises(ValueError, match="lossy WebP"):
                webp_decode(data)
