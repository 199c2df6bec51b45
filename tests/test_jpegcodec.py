"""Real baseline JPEG codec: roundtrip quality, decode of real
libjpeg-written files from the CPython/IPython/rustup test suites
(grayscale, 4:2:0, 4:4:4-with-restart-markers), cross-validation by an
INDEPENDENT naive scalar decoder written in this file (the same
independence pattern as test_avro_independent.py — the production decoder
is never the only reader of a stream it claims to understand), and the
Spark-side routing through decode_image / multimodal.decode_stats."""

import os
import struct

import numpy as np
import pytest

from olake_spark.functions.jpegcodec import jpeg_decode, jpeg_encode

# real JPEG files written by libjpeg, shipped with public packages
# (IPython / CPython test suites, rust docs) — resolved dynamically from
# whatever environment runs the tests, read in place; skipped if absent


def _real_files() -> dict:
    import glob

    out = {}
    try:
        import IPython.core.tests as _ict

        out["gray_1x1_sampling"] = os.path.join(
            os.path.dirname(_ict.__file__), "2x2.jpg"
        )
    except ImportError:
        pass
    try:
        import test.test_email as _te

        out["color_420"] = os.path.join(
            os.path.dirname(_te.__file__), "data", "python.jpg"
        )
    except ImportError:
        pass
    rust = sorted(glob.glob(os.path.expanduser(
        "~/.rustup/toolchains/*/share/doc/rust/html"
        "/embedded-book/assets/verify.jpeg"
    )))
    if rust:
        out["color_444_restart"] = rust[0]
    return out


REAL_FILES = _real_files()


def _structured(h, w, seed=3, noise=8):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.int32)
    if noise:
        rng = np.random.default_rng(seed)
        img += rng.integers(-noise, noise + 1, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = float(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


# ------------------------------------------------ independent decoder

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def naive_jpeg_decode(data: bytes) -> np.ndarray:
    """From-scratch scalar baseline decoder, deliberately structured
    differently from the production one: bitstring-keyed Huffman maps, an
    up-front unstuffed bit list, and the spec's literal O(64^2) IDCT
    double sum per sample. Slow; for small fixtures only. No restart
    support (the production decoder covers that on the 4:4:4 file)."""
    assert data[:2] == b"\xff\xd8"
    i = 2
    qts, hts, comps = {}, {}, []
    H = W = 0
    while True:
        assert data[i] == 0xFF
        m = data[i + 1]
        i += 2
        if 0xD0 <= m <= 0xD9 or m == 0x01:
            continue
        ln = struct.unpack(">H", data[i:i + 2])[0]
        seg = data[i + 2:i + ln]
        if m == 0xDB:
            j = 0
            while j < len(seg):
                tq = seg[j] & 0xF
                qts[tq] = [seg[j + 1 + k] for k in range(64)]
                j += 65
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tcth = seg[j]
                bits = seg[j + 1:j + 17]
                vals = seg[j + 17:j + 17 + sum(bits)]
                code, k, tbl = 0, 0, {}
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        tbl[format(code, f"0{length}b")] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                hts[tcth] = tbl
                j += 17 + sum(bits)
        elif m == 0xC0:
            H, W = struct.unpack(">HH", seg[1:5])
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append([cid, hv >> 4, hv & 0xF, tq, None, None, 0])
        elif m == 0xDA:
            for c in range(seg[0]):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x[0] == cs)
                comp[4], comp[5] = tt >> 4, tt & 0xF
            i += ln
            break
        i += ln

    # unstuff the entropy segment into a flat bit list
    bits = []
    while i < len(data) - 1:
        b = data[i]
        if b == 0xFF:
            if data[i + 1] == 0x00:
                bits.extend((b >> s) & 1 for s in range(7, -1, -1))
                i += 2
                continue
            break  # a real marker ends the scan
        bits.extend((b >> s) & 1 for s in range(7, -1, -1))
        i += 1

    pos = [0]

    def readbits(n):
        v = 0
        for _ in range(n):
            v = (v << 1) | bits[pos[0]]
            pos[0] += 1
        return v

    def huffsym(tbl):
        s = ""
        while True:
            s += str(bits[pos[0]])
            pos[0] += 1
            if s in tbl:
                return tbl[s]

    def extend(v, t):
        return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mx = -(-W // (8 * hmax))
    my = -(-H // (8 * vmax))
    planes = {
        c[0]: np.zeros((my * c[2] * 8, mx * c[1] * 8)) for c in comps
    }
    for mcu in range(mx * my):
        row, col = divmod(mcu, mx)
        for c in comps:
            cid, ch, cv, tq, td, ta, _ = c
            for by in range(cv):
                for bx in range(cl := ch):
                    coef = [0] * 64
                    t = huffsym(hts[td])  # DC table (tc=0 → key 0x0t)
                    diff = extend(readbits(t), t)
                    c[6] += diff
                    coef[0] = c[6]
                    k = 1
                    while k < 64:
                        rs = huffsym(hts[0x10 | ta])
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break
                        k += r
                        coef[ZZ[k]] = extend(readbits(s), s)
                        k += 1
                    # dequant + literal A.3.3 IDCT double sum
                    dq = [coef[j] * qts[tq][ZZ.index(j)] for j in range(64)]
                    out = np.zeros((8, 8))
                    for x in range(8):
                        for y in range(8):
                            sv = 0.0
                            for u in range(8):
                                for v in range(8):
                                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                                    cvv = 1 / np.sqrt(2) if v == 0 else 1.0
                                    sv += (
                                        cu * cvv * dq[u * 8 + v]
                                        * np.cos((2 * x + 1) * u * np.pi / 16)
                                        * np.cos((2 * y + 1) * v * np.pi / 16)
                                    )
                            out[x, y] = sv / 4 + 128
                    r0 = (row * cv + by) * 8
                    c0 = (col * cl + bx) * 8
                    planes[cid][r0:r0 + 8, c0:c0 + 8] = out

    full = []
    for c in comps:
        cid, ch, cv = c[0], c[1], c[2]
        p = planes[cid][: -(-H * cv // vmax), : -(-W * ch // hmax)]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:H, :W])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = full[0], full[1] - 128, full[2] - 128
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- tests


class TestRoundTrip:
    def test_psnr_by_quality(self):
        # noise-free gradients: quality curve must rise well past the
        # north rule's 40 dB lossy gate by q=85
        img = _structured(40, 56, noise=0)
        last = 0
        for q, floor in ((50, 38), (85, 45), (95, 50)):
            out = jpeg_decode(jpeg_encode(img, q))
            assert out.shape == img.shape
            p = _psnr(img, out)
            assert p >= floor, f"q={q}: {p:.1f} dB"
            assert p > last  # quality is monotone
            last = p

    def test_noisy_image_saturates_at_noise_floor(self):
        # +/-8 uniform noise has variance ~24 -> if quantization removes
        # it entirely, PSNR caps at 10*log10(255^2/24) ~ 34.3 dB. A
        # correct codec lands NEAR that floor at mid quality (removing
        # the noise) and ABOVE it at q=95 (partially preserving it);
        # far below would mean real signal loss, not noise loss.
        img = _structured(40, 56)
        assert _psnr(img, jpeg_decode(jpeg_encode(img, 85))) >= 33.0
        assert _psnr(img, jpeg_decode(jpeg_encode(img, 95))) >= 35.5

    def test_non_multiple_of_8_dims(self):
        img = _structured(13, 21)
        out = jpeg_decode(jpeg_encode(img, 90))
        assert out.shape == (13, 21, 3)
        assert _psnr(img, out) >= 35

    def test_deterministic_bytes(self):
        img = _structured(24, 24, seed=9)
        assert jpeg_encode(img, 85) == jpeg_encode(img, 85)

    def test_flat_image_is_tiny_and_exact(self):
        img = np.full((32, 32, 3), 200, dtype=np.uint8)
        b = jpeg_encode(img, 85)
        assert len(b) < 800
        out = jpeg_decode(b)
        assert int(np.abs(out.astype(int) - 200).max()) <= 2

    def test_luma_only_flat_is_exact(self):
        # regression: luma/gray paths must ROUND like the RGB path, not
        # truncate (flat 200 decoded 199 before the fix)
        flat = np.full((16, 16, 3), 200, dtype=np.uint8)
        luma = jpeg_decode(jpeg_encode(flat, 85), luma_only=True)
        assert luma.shape == (16, 16)
        assert set(np.unique(luma)) == {200}


class TestSubsampledEncode:
    """4:2:0 encoding (libjpeg's default sampling): MCU = four Y blocks +
    averaged Cb + Cr. Cross-validated by the INDEPENDENT naive decoder,
    never only by our own decoder."""

    def test_roundtrip_and_independent_agreement(self):
        img = _structured(40, 56, noise=0)
        b = jpeg_encode(img, 90, subsampling="420")
        ours = jpeg_decode(b)
        assert _psnr(img, ours) >= 42
        theirs = naive_jpeg_decode(b)
        assert int(np.abs(ours.astype(int) - theirs.astype(int)).max()) == 0

    def test_chroma_payload_shrinks_on_real_content(self):
        # on content large enough that entropy data dominates the fixed
        # headers, 4:2:0 must be measurably smaller than 4:4:4
        img = _structured(96, 128, noise=4)
        b444 = jpeg_encode(img, 85)
        b420 = jpeg_encode(img, 85, subsampling="420")
        assert len(b420) < len(b444) * 0.9

    @pytest.mark.parametrize("hw", [(13, 21), (17, 16), (8, 8), (15, 33),
                                    (16, 16), (1, 1)])
    def test_odd_dimensions(self, hw):
        img = _structured(*hw, noise=0)
        out = jpeg_decode(jpeg_encode(img, 90, subsampling="420"))
        assert out.shape == img.shape
        assert _psnr(img, out) >= 30

    def test_deterministic_and_validated(self):
        img = _structured(24, 24, seed=7)
        assert jpeg_encode(img, 85, subsampling="420") == \
            jpeg_encode(img, 85, subsampling="420")
        with pytest.raises(ValueError, match="subsampling"):
            jpeg_encode(img, 85, subsampling="422x")


class TestFuzz:
    def test_random_images_roundtrip_both_samplings(self):
        """Hypothesis-style fuzz (seeded loop — hypothesis can't generate
        numpy images cheaply): random sizes/content/quality must roundtrip
        within the quantization-error bound for BOTH samplings, and the
        independent decoder must agree with ours on every stream."""
        rng = np.random.default_rng(42)
        for trial in range(12):
            h = int(rng.integers(1, 50))
            w = int(rng.integers(1, 50))
            q = int(rng.integers(35, 96))
            smooth = rng.integers(0, 200)
            img = np.clip(
                smooth + rng.integers(-20, 21, (h, w, 3)).cumsum(axis=1)
                // 4, 0, 255
            ).astype(np.uint8)
            for sub in ("444", "420"):
                b = jpeg_encode(img, q, subsampling=sub)
                out = jpeg_decode(b)
                assert out.shape == img.shape
                # noise-like content floors near 30 dB at q=35; real signal
                # loss would land far lower
                assert _psnr(img, out) >= 26, (trial, h, w, q, sub)
                theirs = naive_jpeg_decode(b)
                assert int(np.abs(out.astype(int)
                                  - theirs.astype(int)).max()) == 0


def _mux_scans(w, h, comp_defs, scans, qtables, entropy_parts,
               dri=0) -> bytes:
    """Hand-mux a baseline stream with arbitrary SOF sampling factors and
    one SOS (+ entropy segment) per entry in `scans` — builds the legal
    shapes the production ENCODER never emits (non-interleaved Ns=1 scans,
    multi-scan files, sampling >1 with a single component)."""
    from olake_spark.functions.jpegcodec import (
        K3_AC_CHROM, K3_AC_LUM, K3_DC_CHROM, K3_DC_LUM,
    )
    from olake_spark.functions.jpegcodec import ZIGZAG as PZZ

    out = bytearray(b"\xff\xd8")
    for tid, tbl in qtables:
        z = tbl.reshape(64)[PZZ].astype(np.uint8).tobytes()
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + z
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(comp_defs), 8, h, w, len(comp_defs)
    )
    for cid, hv, tq in comp_defs:
        out += struct.pack("BBB", cid, hv, tq)
    for tc, th, tdef in ((0, 0, K3_DC_LUM), (1, 0, K3_AC_LUM),
                         (0, 1, K3_DC_CHROM), (1, 1, K3_AC_CHROM)):
        bits, vals = tdef
        body = bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    for scan_comps, entropy in zip(scans, entropy_parts):
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(scan_comps),
                                         len(scan_comps))
        for cid, tdta in scan_comps:
            out += struct.pack("BB", cid, tdta)
        out += b"\x00\x3f\x00"
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def _entropy_for(plane, q, dc_key, ac_key) -> bytes:
    """Quantize one component plane and entropy-code its blocks in raster
    order (one non-interleaved scan), via the production encoder kernels."""
    from olake_spark.functions.jpegcodec import (
        ZIGZAG, _BitWriter, _blocks_of, _build_encode_table, _dct_blocks,
        _encode_zz,
    )
    from olake_spark.functions import jpegcodec as J

    co = _dct_blocks(_blocks_of(plane.astype(np.float64)) - 128.0)
    zz = np.round(co / q[None, :, :]).astype(np.int32).reshape(-1, 64)[
        :, ZIGZAG
    ]
    bw = _BitWriter()
    dc = _build_encode_table(*getattr(J, dc_key))
    ac = _build_encode_table(*getattr(J, ac_key))
    _encode_zz(bw, zz, dc, ac, 0)
    bw.flush()
    return bytes(bw.out)


class TestSpecShapes:
    """Legal baseline shapes the production encoder never writes — the
    decoder must still read them (T.81 A.2.2 non-interleaved data order,
    B.2.3 multiple scans per frame, B.1.1.2 fill bytes)."""

    def test_single_component_scan_with_sampling_gt_one(self):
        # Ns=1 ⇒ NON-interleaved: data units = the component's own block
        # grid ceil(w/8)*ceil(h/8), not the h=v=2 MCU geometry
        from olake_spark.functions.jpegcodec import _quality_tables

        gray = _structured(24, 40, noise=0)[..., 0]  # smooth gradient
        qy, _ = _quality_tables(90)
        b = _mux_scans(
            40, 24,
            comp_defs=[(1, 0x22, 0)],        # h=v=2, single component
            scans=[[(1, 0x00)]],
            qtables=[(0, qy)],
            entropy_parts=[_entropy_for(gray, qy, "K3_DC_LUM", "K3_AC_LUM")],
        )
        out = jpeg_decode(b)
        assert out.shape == (24, 40, 3)
        assert _psnr(np.stack([gray] * 3, axis=-1), out) >= 44
        # the pre-fix decoder applied interleaved ceil(w/16) MCU geometry
        # here and died with 'invalid Huffman code in scan'

    def test_three_scan_color_equals_interleaved(self):
        # same quantized coefficients muxed as three Ns=1 scans must decode
        # pixel-identically to the interleaved single-scan encoder output
        from olake_spark.functions.jpegcodec import _quality_tables

        img = _structured(21, 29, noise=0)
        interleaved = jpeg_decode(jpeg_encode(img, 88))
        qy, qc = _quality_tables(88)
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = (-0.168736 * f[..., 0] - 0.331264 * f[..., 1]
              + 0.5 * f[..., 2] + 128)
        cr = (0.5 * f[..., 0] - 0.418688 * f[..., 1]
              - 0.081312 * f[..., 2] + 128)
        b = _mux_scans(
            29, 21,
            comp_defs=[(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)],
            scans=[[(1, 0x00)], [(2, 0x11)], [(3, 0x11)]],
            qtables=[(0, qy), (1, qc)],
            entropy_parts=[
                _entropy_for(y, qy, "K3_DC_LUM", "K3_AC_LUM"),
                _entropy_for(cb, qc, "K3_DC_CHROM", "K3_AC_CHROM"),
                _entropy_for(cr, qc, "K3_DC_CHROM", "K3_AC_CHROM"),
            ],
        )
        assert (jpeg_decode(b) == interleaved).all()

    def test_fill_bytes_before_markers(self):
        img = _structured(16, 16)
        b = jpeg_encode(img, 85)
        base = jpeg_decode(b)
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xda", b"\xff\xd9"):
            i = b.find(marker)
            padded = b[:i] + b"\xff" * 3 + b[i:]
            assert (jpeg_decode(padded) == base).all()

    def test_truncated_streams_raise_valueerror(self):
        b = jpeg_encode(_structured(16, 16), 85)
        for cut in (4, 10, 30, len(b) // 2, len(b) - 3):
            with pytest.raises(ValueError):
                jpeg_decode(b[:cut])

    def test_missing_component_scan_raises(self):
        # color SOF but only the luma scan present → explicit error, not a
        # silently-gray image
        from olake_spark.functions.jpegcodec import _quality_tables

        img = _structured(16, 16, noise=0)
        qy, qc = _quality_tables(85)
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        b = _mux_scans(
            16, 16,
            comp_defs=[(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)],
            scans=[[(1, 0x00)]],
            qtables=[(0, qy), (1, qc)],
            entropy_parts=[_entropy_for(y, qy, "K3_DC_LUM", "K3_AC_LUM")],
        )
        with pytest.raises(ValueError, match="no scan data for component"):
            jpeg_decode(b)

    def test_undefined_table_and_component_refs_raise_valueerror(self):
        # the error contract covers references to things the stream never
        # defined, not just byte-level truncation: an SOS naming a component
        # absent from SOF, a scan using a Huffman table no DHT supplied, and
        # a frame quantized with a table no DQT supplied must all surface as
        # ValueError (not StopIteration / KeyError)
        import struct as _struct

        b = jpeg_encode(_structured(16, 16), 85)

        i = b.find(b"\xff\xda")
        mut = bytearray(b)
        mut[i + 5] = 9  # component selector -> id SOF never declared
        with pytest.raises(ValueError, match="component id 9 not in SOF"):
            jpeg_decode(bytes(mut))

        def _strip(d, marker):
            j = d.find(marker)
            ln = _struct.unpack(">H", d[j + 2 : j + 4])[0]
            return d[:j] + d[j + 2 + ln :]

        for marker in (b"\xff\xc4", b"\xff\xdb"):  # DHT, DQT
            with pytest.raises(ValueError, match="undefined Huffman/quant"):
                jpeg_decode(_strip(b, marker))


class TestRealFiles:
    @pytest.mark.parametrize("name", sorted(REAL_FILES))
    def test_decodes_real_libjpeg_output(self, name):
        path = REAL_FILES[name]
        if not os.path.exists(path):
            pytest.skip(f"{path} not in this container")
        arr = jpeg_decode(open(path, "rb").read())
        assert arr.dtype == np.uint8 and arr.ndim == 3 and arr.shape[2] == 3
        expected = {
            "gray_1x1_sampling": (2, 2, 3),
            "color_420": (16, 16, 3),
            "color_444_restart": (477, 720, 3),
        }[name]
        assert arr.shape == expected
        if name != "gray_1x1_sampling":
            assert float(arr.std()) > 10  # real content, not garbage/flat

    @pytest.mark.parametrize(
        "name", ["gray_1x1_sampling", "color_420"]
    )
    def test_independent_decoder_agrees(self, name):
        """The naive in-test decoder and the production decoder must agree
        pixel-for-pixel (±1 for float-rounding at .5 boundaries) on REAL
        libjpeg streams — neither implementation validates itself."""
        path = REAL_FILES[name]
        if not os.path.exists(path):
            pytest.skip(f"{path} not in this container")
        data = open(path, "rb").read()
        a = jpeg_decode(data)
        b = naive_jpeg_decode(data)
        assert a.shape == b.shape
        assert int(np.abs(a.astype(int) - b.astype(int)).max()) <= 1

    def test_independent_decoder_reads_our_encoder(self):
        """Cross-pair: our encoder's output parsed by the independent
        decoder (never by the production decoder alone)."""
        img = _structured(16, 24, seed=5)
        out = naive_jpeg_decode(jpeg_encode(img, 90))
        assert _psnr(img, out) >= 35


class TestSparkRouting:
    def test_decode_image_routes_real_jpeg(self):
        from olake_spark.functions.imagecodec import decode_image

        img = _structured(20, 20, seed=11)
        b = jpeg_encode(img, 90)
        assert np.array_equal(decode_image(b), jpeg_decode(b))

    def test_multimodal_stats_over_real_jpeg_payload(self, spark):
        """End to end through the Spark kernel: a table row carrying REAL
        baseline JPEG bytes decodes in multimodal.decode_stats."""
        from olake_spark.operators.multimodal import decode_stats

        img = _structured(18, 30, seed=13)
        payload = jpeg_encode(img, 92)
        df = spark.createDataFrame(
            [("jpg-1", bytearray(payload))], "image_id string, bytes binary"
        )
        row = decode_stats(df).collect()[0]
        assert row.decode_ok and row.n_pixels == 18 * 30
        want = img.astype(np.float64).mean(axis=(0, 1))
        assert abs(row.mean_r - want[0]) < 3
        assert abs(row.mean_g - want[1]) < 3
        assert abs(row.mean_b - want[2]) < 3


def _real_progressive_files() -> list:
    """Real libjpeg-written PROGRESSIVE (SOF2) files shipped with public
    packages in this environment, found by marker scan."""
    import glob

    cands = glob.glob("/opt/spark*/data/mllib/images/**/*.jpg",
                      recursive=True) + \
        glob.glob("/usr/share/doc/nodejs/*.jpg")
    out = []
    for p in sorted(set(cands)):
        try:
            d = open(p, "rb").read()
        except OSError:
            continue
        if d[:2] != b"\xff\xd8":
            continue
        i = 2
        while i < len(d) - 3:
            if d[i] != 0xFF:
                i += 1
                continue
            m = d[i + 1]
            if m == 0xC2:
                out.append((p, d))
                break
            if m == 0xC0 or m == 0xDA:
                break
            if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                i += 2
                continue
            i += 2 + ((d[i + 2] << 8) | d[i + 3])
    return out


class TestProgressive:
    """SOF2 progressive: the encoder emits libjpeg's default 10-scan
    script (spectral selection + successive approximation), so decoding
    it must be BIT-IDENTICAL to decoding the baseline encoding of the
    same image — the two bitstream layouts carry the same coefficients.
    Real libjpeg progressive files (which use EOB runs > 1 and optimized
    tables, paths our encoder never emits) cover the decoder's remaining
    branches."""

    @pytest.mark.parametrize("sub", ["444", "420"])
    @pytest.mark.parametrize("quality", [60, 85, 95])
    def test_progressive_equals_baseline(self, sub, quality):
        rng = np.random.default_rng(42)
        for hw in [(8, 8), (24, 24), (31, 17), (9, 70)]:
            a = rng.integers(0, 256, size=(*hw, 3), dtype=np.uint8)
            b0 = jpeg_decode(jpeg_encode(a, quality, sub))
            b1 = jpeg_decode(jpeg_encode(a, quality, sub, progressive=True))
            assert np.array_equal(b0, b1), (hw, sub, quality)

    def test_progressive_structured_content(self):
        # gradients + flat areas drive long zero runs / EOB-heavy blocks
        yy, xx = np.mgrid[0:40, 0:56]
        a = np.stack([(yy * 4) % 256, (xx * 3) % 256,
                      np.full_like(yy, 128)], axis=-1).astype(np.uint8)
        a[10:20, 10:30] = 255  # flat white patch
        b0 = jpeg_decode(jpeg_encode(a, 85))
        b1 = jpeg_decode(jpeg_encode(a, 85, progressive=True))
        assert np.array_equal(b0, b1)

    def test_progressive_marker_present(self):
        a = np.zeros((16, 16, 3), dtype=np.uint8)
        d = jpeg_encode(a, 85, progressive=True)
        assert b"\xff\xc2" in d and b"\xff\xc0" not in d
        # ten scans in the script -> ten SOS markers
        assert d.count(b"\xff\xda") >= 10

    def test_real_progressive_files_decode(self):
        files = _real_progressive_files()
        if not files:
            pytest.skip("no real progressive JPEGs in this environment")
        for p, d in files:
            a = jpeg_decode(d)
            assert a.ndim == 3 and a.shape[2] == 3 and a.dtype == np.uint8
            # frame dims from SOF2 must match the decoded shape
            i = 2
            while True:
                if d[i] == 0xFF and d[i + 1] == 0xC2:
                    fh, fw = struct.unpack(">HH", d[i + 5:i + 9])
                    break
                if d[i] == 0xFF and not (
                    d[i + 1] in (0x01,) or 0xD0 <= d[i + 1] <= 0xD8
                ):
                    i += 2 + ((d[i + 2] << 8) | d[i + 3])
                else:
                    i += 2
            assert a.shape[:2] == (fh, fw), p
            if "grayscale" in p:
                # a single-component frame must replicate exactly
                assert (a[:, :, 0] == a[:, :, 1]).all()
                assert (a[:, :, 1] == a[:, :, 2]).all()
            if "white-stripe" in p:
                assert a.mean() > 200  # the image is mostly white

    def test_truncated_progressive_raises(self):
        a = (np.arange(24 * 24 * 3, dtype=np.int64) % 256).astype(
            np.uint8).reshape(24, 24, 3)
        d = jpeg_encode(a, 85, progressive=True)
        with pytest.raises(ValueError):
            jpeg_decode(d[: len(d) // 3])

    def test_bad_subsampling_still_rejected(self):
        a = np.zeros((8, 8, 3), dtype=np.uint8)
        with pytest.raises(ValueError, match="subsampling"):
            jpeg_encode(a, 85, "422", progressive=True)
