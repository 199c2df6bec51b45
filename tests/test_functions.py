"""Unit tests for the vectorized kernels (no SparkSession needed)."""

import numpy as np
import pandas as pd
import pytest

from olake_spark.functions import imagecodec as ic
from olake_spark.functions import zorder as z


def _img(seed: int, w: int = 32, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestImageCodec:
    def test_png_roundtrip_exact(self):
        for seed in range(5):
            a = _img(seed)
            assert np.array_equal(ic.png_decode(ic.png_encode(a)), a)

    def test_png_deterministic(self):
        a = _img(7)
        assert ic.png_encode(a) == ic.png_encode(a.copy())

    def test_lossy_psnr_above_40(self):
        a = _img(3, 64, 64)
        b = ic.decode_image(ic.encode_image(a, "jpeg"))
        p = ic.psnr(a, b)
        assert 40.0 <= p < float("inf")

    def test_psnr_inf_on_equal(self):
        a = _img(1)
        assert ic.psnr(a, a) == float("inf")

    def test_phash_stable_and_locality(self):
        a = _img(11, 64, 64)
        assert ic.phash64(a) == ic.phash64(a.copy())
        # lossy re-encode should not change the perceptual hash much
        b = ic.decode_image(ic.encode_image(a, "jpeg"))
        d = bin((ic.phash64(a) ^ ic.phash64(b)) & (2**64 - 1)).count("1")
        assert d <= 8

    def test_decode_dispatch(self):
        a = _img(2)
        assert np.array_equal(ic.decode_image(ic.encode_image(a, "png")), a)


class TestZOrder:
    def test_interleave3_matches_naive(self):
        rng = np.random.default_rng(0)
        a, b, c = (rng.integers(0, 1 << 21, 200, dtype=np.uint64) for _ in range(3))
        got = z.interleave3(a, b, c)
        naive = z._interleave_generic([a, b, c], 21)
        assert np.array_equal(got, naive)

    def test_interleave2_matches_naive(self):
        rng = np.random.default_rng(1)
        a, b = (rng.integers(0, 1 << 16, 200, dtype=np.uint64) for _ in range(2))
        assert np.array_equal(z.interleave2(a, b), z._interleave_generic([a, b], 16))

    def test_hilbert_bijective_small(self):
        bits, n = 4, 2
        side = 1 << bits
        xs, ys = np.meshgrid(np.arange(side), np.arange(side))
        coords = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        assert len(np.unique(idx)) == side**2
        assert idx.max() == side**2 - 1 and idx.min() == 0

    def test_hilbert_adjacency(self):
        """Consecutive Hilbert indices are unit steps in exactly one dim."""
        bits = 3
        side = 1 << bits
        xs, ys, zs = np.meshgrid(*([np.arange(side)] * 3))
        coords = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        order = np.argsort(idx)
        walk = coords[order].astype(np.int64)
        steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
        assert (steps == 1).all()

    def test_hilbert_3d_bijective(self):
        bits = 3
        side = 1 << bits
        xs, ys, zs = np.meshgrid(*([np.arange(side)] * 3))
        coords = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        assert len(np.unique(idx)) == side**3

    def test_batch_keys_nonnegative_long(self):
        ph = pd.Series(np.array([-(2**63), -1, 0, 2**63 - 1, 12345], dtype=np.int64))
        w = pd.Series([32, 64, 128, 4096, 0])
        h = pd.Series([32, 48, 96, 4096, 0])
        zk = z.zorder_key_batch(ph, w, h).to_numpy()
        hk = z.hilbert_key_batch(ph, w, h).to_numpy()
        assert (zk >= 0).all() and (hk >= 0).all()
        # order preservation on phash when w/h fixed
        ph2 = pd.Series(np.array([-100, 100], dtype=np.int64))
        fixed = pd.Series([32, 32])
        k = z.zorder_key_batch(ph2, fixed, fixed).to_numpy()
        assert k[0] < k[1]

    def test_zorder2_sql_text_generates(self):
        s = z.zorder2_sql("w", "h", 4)
        import duckdb

        v = duckdb.sql(f"SELECT {s} AS k FROM (SELECT 3 AS w, 5 AS h)").fetchone()[0]
        naive = z._interleave_generic(
            [np.array([3], dtype=np.uint64), np.array([5], dtype=np.uint64)], 4
        )[0]
        assert v == int(naive)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def _mux_png(w, h, color, raw_scanlines, plte=None):
    """Hand-mux a PNG from pre-filtered scanline bytes (the shapes real
    encoders write that png_encode never does: gray/palette/alpha color
    types, non-zero filters)."""
    import struct
    import zlib

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body)))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(raw_scanlines))
    out += chunk(b"IEND", b"")
    return out


class TestPngRealWorldShapes:
    """8-bit color types real encoders write beyond png_encode's RGB:
    gray (0), palette (3), gray+alpha (4), RGBA (6) — each hand-muxed with
    KNOWN pixels so the assertion is exact; plus real libpng files from
    the container cross-checked by an independent scalar unfilter."""

    def test_gray(self):
        raw = bytes([0, 10, 20, 0, 30, 40])  # 2x2, filter 0
        out = ic.png_decode(_mux_png(2, 2, 0, raw))
        assert out.shape == (2, 2, 3)
        assert (out == np.array([[[10] * 3, [20] * 3],
                                 [[30] * 3, [40] * 3]])).all()

    def test_gray_alpha_drops_alpha(self):
        raw = bytes([0, 10, 255, 20, 0])  # 2x1, alpha 255/0
        out = ic.png_decode(_mux_png(2, 1, 4, raw))
        assert (out == np.array([[[10] * 3, [20] * 3]])).all()

    def test_rgba_drops_alpha(self):
        raw = bytes([0, 1, 2, 3, 9, 4, 5, 6, 0])  # 2x1 RGBA
        out = ic.png_decode(_mux_png(2, 1, 6, raw))
        assert (out == np.array([[[1, 2, 3], [4, 5, 6]]])).all()

    def test_palette(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
        raw = bytes([0, 0, 1, 0, 2, 0])  # 2 rows: (red,green),(blue,red)
        out = ic.png_decode(_mux_png(2, 2, 3, raw, plte))
        assert (out == np.array([[[255, 0, 0], [0, 255, 0]],
                                 [[0, 0, 255], [255, 0, 0]]])).all()

    def test_filters_on_multibyte_pixels(self):
        # Sub(1) on RGBA: reconstructed a = pixel bpp=4 bytes to the left
        raw = bytes([1, 10, 20, 30, 40, 5, 5, 5, 5])  # 2x1, second = first+5
        out = ic.png_decode(_mux_png(2, 1, 6, raw))
        assert (out == np.array([[[10, 20, 30], [15, 25, 35]]])).all()

    def test_unsupported_shapes_raise(self):
        import struct
        import zlib

        def chunk(ct, body):
            return (struct.pack(">I", len(body)) + ct + body
                    + struct.pack(">I", zlib.crc32(ct + body)))

        def png(depth, color, interlace):
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(
                        ">IIBBBBB", 1, 1, depth, color, 0, 0, interlace))
                    + chunk(b"IDAT", zlib.compress(b"\x00\x00"))
                    + chunk(b"IEND", b""))

        # spec-ILLEGAL depth/color combinations (§11.2.2): 16-bit palette,
        # sub-byte RGB, non-power-of-two depth, unknown color type
        with pytest.raises(ValueError, match="depth=16, color type=3"):
            ic.png_decode(png(16, 3, 0))
        with pytest.raises(ValueError, match="depth=4, color type=2"):
            ic.png_decode(png(4, 2, 0))
        with pytest.raises(ValueError, match="depth=3"):
            ic.png_decode(png(3, 0, 0))
        with pytest.raises(ValueError, match="color type=1"):
            ic.png_decode(png(8, 1, 0))
        with pytest.raises(ValueError, match="interlace method 2"):
            ic.png_decode(png(8, 0, 2))
        # PNG signature but no IHDR chunk: a clear error, not a NameError
        with pytest.raises(ValueError, match="missing IHDR"):
            ic.png_decode(b"\x89PNG\r\n\x1a\n" + chunk(b"IEND", b""))

    def test_decode_image_error_contract_is_valueerror(self):
        # the dispatch seam translates every container's low-level failure
        # (struct/zlib/bounds) so operator kernels can rely on ValueError
        import struct
        import zlib

        img = (np.arange(8 * 8 * 3) % 251).reshape(8, 8, 3).astype(np.uint8)
        png = ic.png_encode(img)
        with pytest.raises(ValueError, match="corrupt image payload"):
            ic.decode_image(png[:20])  # chunk header cut short
        with pytest.raises(ValueError, match="corrupt image payload"):
            ic.decode_image(png[:33] + b"\x00" * 8 + png[41:])  # idat garbage
        # palette index beyond the PLTE table: bounds failure -> ValueError
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        raw = bytes([0, 0, 5, 0, 1, 7])  # indexes 5 and 7, palette has 2
        bad = (
            b"\x89PNG\r\n\x1a\n"
            + ic._chunk(b"IHDR", ihdr)
            + ic._chunk(b"PLTE", bytes([0, 0, 0, 255, 255, 255]))
            + ic._chunk(b"IDAT", zlib.compress(raw))
            + ic._chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="corrupt image payload"):
            ic.decode_image(bad)
        # the lossy fixture container goes through the same boundary
        lossy = ic.encode_image(img, "jpeg")
        with pytest.raises(ValueError):
            ic.decode_image(lossy[: len(lossy) // 2])

    def test_decode_wav_error_contract_is_valueerror(self):
        from olake_spark.functions.audiocodec import decode_wav, encode_wav

        wav = encode_wav(np.zeros(64, np.int16), 16000)
        with pytest.raises(ValueError, match="corrupt WAV"):
            decode_wav(wav[:10])  # truncated RIFF header
        with pytest.raises(ValueError, match="corrupt WAV"):
            decode_wav(b"garbage")  # stdlib raises bare EOFError here
        # intact streams still round-trip through the wrapper
        samples, sr = decode_wav(wav)
        assert sr == 16000 and samples.shape == (64,)

    def test_real_libpng_files_decode(self):
        """Every 8-bit non-interlaced PNG shipped with public packages in
        this environment must decode to (h, w, 3) uint8; the first real
        RGB file is additionally cross-checked pixel-exactly by an
        independent scalar unfilter written here."""
        import glob
        import struct
        import zlib

        cands = glob.glob(
            "/root/.pyenv/versions/*/lib/python*/site-packages/**/*.png",
            recursive=True,
        ) + glob.glob(
            "/root/.rustup/toolchains/stable-*/share/doc/rust/html/**/*.png",
            recursive=True,
        )
        by_type = {}
        for p in cands:
            try:
                d = open(p, "rb").read(33)
            except OSError:
                continue
            if d[:8] != b"\x89PNG\r\n\x1a\n":
                continue
            w, h, depth, ct, _, _, inter = struct.unpack(">IIBBBBB", d[16:29])
            if depth == 8 and inter == 0 and ct in (0, 2, 3, 4, 6):
                by_type.setdefault(ct, p)
        if not by_type:
            pytest.skip("no real PNGs in this environment")
        for ct, p in sorted(by_type.items()):
            arr = ic.png_decode(open(p, "rb").read())
            assert arr.ndim == 3 and arr.shape[2] == 3
            assert arr.dtype == np.uint8

        if 2 not in by_type:
            return
        # independent unfilter: pure-scalar, structured unlike production
        data = open(by_type[2], "rb").read()
        pos, idat = 8, b""
        while pos < len(data):
            (ln,) = struct.unpack(">I", data[pos:pos + 4])
            ct_ = data[pos + 4:pos + 8]
            if ct_ == b"IHDR":
                w, h = struct.unpack(">II", data[pos + 8:pos + 16])
            elif ct_ == b"IDAT":
                idat += data[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = w * 3
        ref = []
        prev = [0] * stride
        for y in range(h):
            row = raw[y * (stride + 1):(y + 1) * (stride + 1)]
            f, line = row[0], list(row[1:])
            cur = [0] * stride
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if f == 0:
                    v = line[x]
                elif f == 1:
                    v = line[x] + a
                elif f == 2:
                    v = line[x] + b
                elif f == 3:
                    v = line[x] + ((a + b) >> 1)
                else:
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pr = a if (pa <= pb and pa <= pc) else \
                        (b if pb <= pc else c)
                    v = line[x] + pr
                cur[x] = v & 0xFF
            ref.append(cur)
            prev = cur
        ref_arr = np.array(ref, dtype=np.uint8).reshape(h, w, 3)
        assert (ic.png_decode(data) == ref_arr).all()


# Adam7 pass origins/steps, transcribed from the PNG spec §8.2 pass grid
# (the 8x8 tile "1 6 4 6 2 6 4 6 / 7... / 5 6 5 6... / ...") — written
# out here independently of the production table so a transcription error
# in either place breaks the round-trip below.
_A7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_mux(arr, pass_filters=None):
    """Independent spec-derived Adam7 ENCODER (RGB8): serialize the seven
    reduced images with filter-0 scanlines (or a per-pass filter override),
    one zlib stream, interlace=1 in IHDR. Never calls production code, and
    asserts the passes tile the image exactly once."""
    import struct
    import zlib

    h, w, _ = arr.shape
    covered = np.zeros((h, w), dtype=np.int32)
    raw = bytearray()
    for i, (x0, y0, dx, dy) in enumerate(_A7_PASSES):
        sub = arr[y0::dy, x0::dx]
        covered[y0::dy, x0::dx] += 1
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        f = (pass_filters or {}).get(i, 0)
        for r, row in enumerate(sub):
            if f == 2 and r > 0:  # Up filter against the PASS's prior row
                raw.append(2)
                raw.extend(
                    ((row.astype(np.int32) - sub[r - 1].astype(np.int32))
                     & 0xFF).astype(np.uint8).tobytes())
            else:
                raw.append(0)
                raw.extend(row.tobytes())
    assert (covered == 1).all(), "Adam7 passes must tile the image exactly once"

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body)))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


class TestPngAdam7:
    """Adam7-interlaced decode vs an independent spec-derived encoder."""

    def _img(self, h, w):
        # deterministic non-repeating pixels so any scatter error shows
        return (np.arange(h * w * 3, dtype=np.int64) * 97 % 251).astype(
            np.uint8).reshape(h, w, 3)

    @pytest.mark.parametrize(
        "h,w",
        [(1, 1), (1, 9), (9, 1), (2, 3), (5, 9), (7, 13), (8, 8),
         (16, 16), (17, 31)],
    )
    def test_roundtrip_all_shapes(self, h, w):
        arr = self._img(h, w)
        assert (ic.png_decode(_adam7_mux(arr)) == arr).all()

    def test_passes_filter_independently(self):
        # Up-filter inside passes 6 and 7: each pass's filter context is its
        # OWN previous reduced scanline, never the neighboring image row
        arr = self._img(8, 8)
        data = _adam7_mux(arr, pass_filters={5: 2, 6: 2})
        assert (ic.png_decode(data) == arr).all()

    def test_truncated_stream_raises(self):
        import struct
        import zlib

        def chunk(ct, body):
            return (struct.pack(">I", len(body)) + ct + body
                    + struct.pack(">I", zlib.crc32(ct + body)))

        # 2x2 RGB interlaced needs 4 pixels across passes; supply only 1
        short = zlib.compress(bytes([0, 1, 2, 3]))
        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
                + chunk(b"IDAT", short) + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="Adam7"):
            ic.png_decode(data)

    def test_interlaced_gray_and_rgba(self):
        # non-RGB color types flow through the same per-pass unfilter
        import struct
        import zlib

        def chunk(ct, body):
            return (struct.pack(">I", len(body)) + ct + body
                    + struct.pack(">I", zlib.crc32(ct + body)))

        # 2x2 gray, values 10..40: pass1=(0,0)->10, pass6? empty at 2x2;
        # serialize per _A7_PASSES: p1 row [10], p4 empty, p5 empty? no —
        # derive programmatically to stay spec-true
        g = np.array([[10, 20], [30, 40]], dtype=np.uint8)
        raw = bytearray()
        for x0, y0, dx, dy in _A7_PASSES:
            sub = g[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw.append(0)
                raw.extend(row.tobytes())
        data = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))
        out = ic.png_decode(data)
        assert (out == np.repeat(g[:, :, None], 3, axis=2)).all()


def _pack_bits(samples_row, depth):
    """Independent MSB-first sub-byte bit packer (PNG spec §7.2), written
    bit-at-a-time so a packing bug in the production unpacker can't be
    mirrored here."""
    bits = []
    for v in samples_row:
        for i in range(depth - 1, -1, -1):
            bits.append((int(v) >> i) & 1)
    while len(bits) % 8:
        bits.append(0)  # scanlines pad to a byte boundary
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for bit in bits[i:i + 8]:
            b = (b << 1) | bit
        out.append(b)
    return bytes(out)


def _mux_png_d(w, h, color, depth, raw_scanlines, plte=None, interlace=0):
    """Hand-mux a PNG at an arbitrary sample depth from pre-filtered
    scanline bytes (filter bytes included)."""
    import struct
    import zlib

    def chunk(ct, body):
        return (struct.pack(">I", len(body)) + ct + body
                + struct.pack(">I", zlib.crc32(ct + body)))

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR",
                 struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace))
    if plte is not None:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", zlib.compress(bytes(raw_scanlines)))
    out += chunk(b"IEND", b"")
    return out


class TestPngDepths:
    """Sample depths beyond 8-bit RGB that real encoders write: sub-byte
    gray/palette (1/2/4) and 16-bit gray/RGB/GA/RGBA — each hand-muxed
    with KNOWN pixels via the independent bit packer above, so the
    assertions are exact and can't share a bug with the production
    unpacker."""

    def test_gray1_spans_byte_padding(self):
        # w=10 → stride 2 bytes with 6 pad bits; padding must be ignored
        row1 = [1, 0, 1, 0, 1, 0, 1, 0, 1, 1]
        row2 = [0, 1, 1, 1, 0, 0, 0, 1, 0, 1]
        raw = b"\x00" + _pack_bits(row1, 1) + b"\x00" + _pack_bits(row2, 1)
        out = ic.png_decode(_mux_png_d(10, 2, 0, 1, raw))
        want = np.array([row1, row2], dtype=np.uint8) * 255
        assert (out == np.repeat(want[:, :, None], 3, axis=2)).all()

    @pytest.mark.parametrize("depth,scale", [(2, 85), (4, 17)])
    def test_gray_sub_byte_scaling_exact(self, depth, scale):
        # spec §12.5 bit replication == integer multiply by 255/(2^d-1)
        vals = list(range(1 << depth)) + [0, (1 << depth) - 1, 1]
        raw = b"\x00" + _pack_bits(vals, depth)
        out = ic.png_decode(_mux_png_d(len(vals), 1, 0, depth, raw))
        want = (np.array(vals, dtype=np.uint8) * scale)[None, :, None]
        assert (out == np.repeat(want, 3, axis=2)).all()

    def test_palette_4bit_indices(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
        idx = [[3, 0, 2], [1, 3, 1]]  # w=3 → 12 bits + 4 pad per row
        raw = (b"\x00" + _pack_bits(idx[0], 4)
               + b"\x00" + _pack_bits(idx[1], 4))
        out = ic.png_decode(_mux_png_d(3, 2, 3, 4, raw, plte))
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        assert (out == pal[np.array(idx)]).all()

    def test_palette_1bit(self):
        plte = bytes([10, 11, 12, 200, 201, 202])
        idx = [1, 0, 1, 1, 0, 0, 1, 0, 1]  # w=9 spans a byte boundary
        raw = b"\x00" + _pack_bits(idx, 1)
        out = ic.png_decode(_mux_png_d(9, 1, 3, 1, raw, plte))
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        assert (out == pal[np.array(idx)][None]).all()

    def test_gray16_high_byte_and_up_filter(self):
        # row 1 filter 0: samples 0x1234, 0xFF01; row 2 is Up-filtered in
        # the BYTE domain (spec: filters see bytes, not 16-bit samples)
        row1 = bytes([0x12, 0x34, 0xFF, 0x01])
        row2 = bytes([0x00, 0x40, 0x80, 0x02])  # raw bytes of row 2
        up = bytes((b - a) & 0xFF for a, b in zip(row1, row2))
        raw = b"\x00" + row1 + b"\x02" + up
        out = ic.png_decode(_mux_png_d(2, 2, 0, 16, raw))
        want = np.array([[0x12, 0xFF], [0x00, 0x80]], dtype=np.uint8)
        assert (out == np.repeat(want[:, :, None], 3, axis=2)).all()

    def test_rgb16_roundtrip_257_expansion(self):
        # v*257 = (v<<8)|v, so the high byte of the expansion is v exactly:
        # an 8-bit image pushed to 16 bits and decoded must come back
        # bit-identical. Exercises every byte value through the 16-bit path.
        arr = (np.arange(5 * 7 * 3, dtype=np.int64) * 131 % 256).astype(
            np.uint8).reshape(5, 7, 3)
        wide = (arr.astype(np.uint16) * 257).astype(">u2")
        raw = bytearray()
        for y in range(5):
            raw.append(0)
            raw.extend(wide[y].tobytes())
        out = ic.png_decode(_mux_png_d(7, 5, 2, 16, raw))
        assert (out == arr).all()

    def test_rgb16_sub_filter_six_byte_lookback(self):
        # Sub filter on 16-bit RGB: the `a` byte sits bpp=6 bytes back
        px = bytes([0x10, 0x01, 0x20, 0x02, 0x30, 0x03])
        second = bytes([0x05, 0x00, 0x06, 0x00, 0x07, 0x00])  # deltas
        raw = b"\x01" + px + second  # one row, 2 px, whole row Sub-filtered
        out = ic.png_decode(_mux_png_d(2, 1, 2, 16, raw))
        assert (out == np.array(
            [[[0x10, 0x20, 0x30], [0x15, 0x26, 0x37]]])).all()

    def test_rgba16_drops_alpha_ga16_expands(self):
        rgba = bytes([0xAA, 1, 0xBB, 2, 0xCC, 3, 0xDD, 4])  # 1 px RGBA16
        out = ic.png_decode(_mux_png_d(1, 1, 6, 16, b"\x00" + rgba))
        assert (out == np.array([[[0xAA, 0xBB, 0xCC]]])).all()
        ga = bytes([0x7F, 9, 0x00, 9])  # 1 px gray16+alpha16
        out = ic.png_decode(_mux_png_d(1, 1, 4, 16, b"\x00" + ga))
        assert (out == np.array([[[0x7F] * 3]])).all()

    def test_interlaced_gray4(self):
        # Adam7 at a sub-byte depth: each reduced scanline packs and pads
        # independently
        g = (np.arange(9 * 9, dtype=np.int64) * 5 % 16).astype(
            np.uint8).reshape(9, 9)
        raw = bytearray()
        for x0, y0, dx, dy in _A7_PASSES:
            sub = g[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw.append(0)
                raw.extend(_pack_bits(row.tolist(), 4))
        out = ic.png_decode(_mux_png_d(9, 9, 0, 4, raw, interlace=1))
        want = np.repeat((g * 17)[:, :, None], 3, axis=2)
        assert (out == want).all()

    def test_interlaced_rgb16(self):
        arr = (np.arange(6 * 10 * 3, dtype=np.int64) * 37 % 256).astype(
            np.uint8).reshape(6, 10, 3)
        wide = (arr.astype(np.uint16) * 257).astype(">u2")
        raw = bytearray()
        for x0, y0, dx, dy in _A7_PASSES:
            sub = wide[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for row in sub:
                raw.append(0)
                raw.extend(row.tobytes())
        out = ic.png_decode(_mux_png_d(10, 6, 2, 16, raw, interlace=1))
        assert (out == arr).all()

    def test_truncated_sub_byte_stream_raises_valueerror(self):
        raw = b"\x00" + _pack_bits([1, 0, 1], 1)
        data = _mux_png_d(30, 4, 0, 1, raw)  # claims 4 rows, supplies 1
        with pytest.raises(ValueError):
            ic.decode_image(data)


class TestPngDepthsRealFiles:
    """Real libpng-written files in the container at the new depths.
    The strongest check is cross-depth: CPython ships the SAME idle icon
    as 16-bit RGBA (py<=3.8) and 8-bit RGBA (py>=3.9); libpng's 16->8
    conversion is the high-byte strip, so our 16-bit decode must be
    BIT-IDENTICAL to our 8-bit decode of the other file — two different
    code paths meeting on independently-authored inputs."""

    _ICON16 = "/root/.pyenv/versions/3.8.18/lib/python3.8/idlelib/Icons/idle_48.png"
    _ICON8 = "/root/.pyenv/versions/3.11.7/lib/python3.11/idlelib/Icons/idle_48.png"

    def _read(self, p):
        import os
        if not os.path.exists(p):
            pytest.skip(f"container file {p} not present")
        return open(p, "rb").read()

    def test_idle_icon_16bit_matches_8bit_sibling(self):
        a16 = ic.png_decode(self._read(self._ICON16))
        a8 = ic.png_decode(self._read(self._ICON8))
        assert a16.shape == a8.shape == (48, 48, 3)
        assert (a16 == a8).all()

    def test_git_favicon_2bit_palette_known_colors(self):
        out = ic.png_decode(
            self._read("/usr/share/gitweb/static/git-favicon.png"))
        assert out.shape == (16, 16, 3)
        got = {tuple(c) for c in np.unique(out.reshape(-1, 3), axis=0)}
        assert got == {(0, 128, 0), (192, 0, 0), (255, 255, 255)}

    def test_gnupg_diagram_4bit_palette(self):
        out = ic.png_decode(
            self._read("/usr/share/info/gnupg-card-architecture.png"))
        assert out.shape == (508, 914, 3)
        # a white-background line diagram: white must dominate
        white = (out == 255).all(axis=2).mean()
        assert white > 0.5
        assert int(out.sum()) == 286911366  # determinism pin

    def test_libpng_pngtest_interlaced_rgba(self):
        # libpng's own canonical test image: Adam7-interlaced RGBA8,
        # written by the reference encoder itself. It also carries an
        # eXIf chunk declaring orientation 5 (the file exercises every
        # chunk type), so the display-oriented decode is the 69x91
        # raster TRANSPOSED — exactly what Pillow's exif_transpose
        # would produce. The sum is orientation-invariant.
        data = self._read("/usr/share/doc/libpng-dev/examples/pngtest.png")
        out = ic.png_decode(data)
        assert out.shape == (91, 69, 3)
        assert int(out.sum()) == 687369  # determinism pin
