"""Independent C-library validation of the pure-python image codecs.

The distro ships the canonical implementations real-world files were
written by — libwebp, libpng16, libtiff, libgif — and ``syscodec.py``
binds them via ctypes behind availability gates. These tests hold the
pure-python codecs to BYTE equality against those references, the same
independent-reader discipline ``tests/test_avro_independent.py`` applies
to the Avro export:

- WebP:  ``webp_encode`` output decoded by libwebp must reproduce the
  source exactly (spec-compliant-writer proof, both RGB and RGBA), and
  the pure ALPH-chunk decoder must match libwebp's alpha plane on the
  real lossy vector.
- PNG:   ``png_decode`` must match libpng on every hand-muxed depth
  fixture, on ``png_encode`` round-trips, and on a corpus of real
  distro PNG files (≤8-bit; the 16-bit strip-vs-scale convention split
  is documented in syscodec.py).
- TIFF:  ``tiff_decode`` must match libtiff's RGBA interface on every
  fixture shape the pure decoder claims (byte orders, photometrics,
  PackBits/LZW/predictor-2, multi-strip) and reproduce libtiff's exact
  unassociated-alpha premultiply relation on the real python.tiff.
- GIF:   ``gif_decode_frames`` must match giflib's LZW index rasters
  (palette-mapped, transparency-masked) on every real GIF on the box.

Every class skips cleanly when its library is absent, so the suite stays
green on codec-less hosts; on this container all four libraries exist and
all assertions are live.
"""

from __future__ import annotations

import glob
import struct
import zlib

import numpy as np
import pytest

from olake_spark.functions import syscodec
from olake_spark.functions.gifcodec import gif_decode_frames
from olake_spark.functions.imagecodec import decode_image, png_decode, png_encode, psnr
from olake_spark.functions.tiffcodec import tiff_decode
from olake_spark.functions.webpcodec import webp_alpha, webp_encode

# ---------------------------------------------------------------------------
# real-file discovery
# ---------------------------------------------------------------------------


def _find_asset(name: str) -> str | None:
    hits = glob.glob(
        f"/root/.pyenv/versions/*/lib/python*/test/**/{name}", recursive=True
    )
    return sorted(hits)[-1] if hits else None


def _real_gifs() -> list[str]:
    out = set()
    for pat in (
        "/root/.pyenv/versions/*/lib/python*/test/imghdrdata/python.gif",
        "/usr/share/tcltk/**/*.gif",
        "/usr/share/doc/**/*.gif",
    ):
        out.update(glob.glob(pat, recursive=True))
    return sorted(out)


def _real_pngs(limit: int = 60) -> list[str]:
    out = set()
    for pat in (
        "/root/.pyenv/versions/3.12*/lib/python*/test/imghdrdata/python.png",
        "/usr/share/doc/**/*.png",
        "/usr/share/icons/**/*.png",
        "/root/.pyenv/versions/3.12*/lib/python*/idlelib/Icons/*.png",
    ):
        out.update(glob.glob(pat, recursive=True))
    return sorted(out)[:limit]


def _png_props(data: bytes) -> dict:
    """IHDR fields + whether gamma/ICC chunks would make libpng's
    simplified API color-transform the pixels (we compare raw samples,
    so such files are excluded from the corpus comparison)."""
    w, h, depth, color, _c, _f, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    gamma_safe = True
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"iCCP":
            gamma_safe = False
        elif tag == b"gAMA":
            (g,) = struct.unpack(">I", data[pos + 8 : pos + 12])
            if abs(g - 45455) > 1:  # not ~sRGB → simplified API transforms
                gamma_safe = False
        elif tag == b"IDAT":
            break
        pos += 12 + ln
    return {
        "depth": depth,
        "color": color,
        "interlace": interlace,
        "gamma_safe": gamma_safe,
    }


def _png_exif_orientation(data: bytes, parse) -> int:
    """The file's declared eXIf orientation (1 when absent) — an
    independent chunk walk, not png_decode's."""
    pos = 8
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"eXIf":
            return parse(data[pos + 8 : pos + 8 + ln])
        if tag == b"IEND":
            break
        pos += 12 + ln
    return 1


# ---------------------------------------------------------------------------
# WebP — encoder interop + ALPH oracle + lossy fallback
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not syscodec.have("webp"), reason="libwebp absent")
class TestWebpLibwebpOracle:
    @pytest.mark.parametrize(
        "shape",
        [(1, 1, 3), (6, 7, 3), (16, 16, 3), (5, 33, 3), (6, 7, 4), (11, 3, 4)],
    )
    def test_encoder_output_read_by_libwebp(self, shape):
        # the interop claim in full: our VP8L writer's bits, decoded by
        # Google's decoder, must reproduce the source EXACTLY
        rng = np.random.default_rng(int(np.prod(shape)))
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = syscodec.webp_decode_rgba_sys(webp_encode(img))
        assert got.shape == (shape[0], shape[1], 4)
        if shape[2] == 3:
            assert (got[..., :3] == img).all() and (got[..., 3] == 255).all()
        else:
            assert (got == img).all()

    def test_encoder_gray_and_gradient(self):
        g = np.linspace(0, 255, 24 * 17, dtype=np.uint8).reshape(24, 17)
        got = syscodec.webp_decode_rgba_sys(webp_encode(g))
        assert (got[..., 0] == g).all() and (got[..., 1] == g).all()
        assert (got[..., 2] == g).all() and (got[..., 3] == 255).all()

    def test_alph_plane_matches_libwebp(self):
        # python.webp: lossy VP8 color + ALPH alpha. webp_alpha decodes the
        # ALPH chunk with PURE-PYTHON VP8L machinery; libwebp's RGBA alpha
        # channel is the independent reference — byte equality required.
        path = _find_asset("python.webp")
        if not path:
            pytest.skip("python.webp not present")
        data = open(path, "rb").read()
        ours = webp_alpha(data)
        libs = syscodec.webp_decode_rgba_sys(data)[..., 3]
        assert ours.shape == libs.shape
        assert (ours == libs).all()

    def test_lossy_vp8_fallback_end_to_end(self):
        # decode_image on a real lossy-VP8 file: gated fallback wiring plus
        # a cross-format sanity anchor — the decoded logo must resemble its
        # PNG sibling on fully-opaque pixels (lossy, so PSNR not equality)
        wp = _find_asset("python.webp")
        pp = _find_asset("python.png")
        if not (wp and pp):
            pytest.skip("vector assets not present")
        data = open(wp, "rb").read()
        rgb = decode_image(data)
        assert rgb.shape == (16, 16, 3) and rgb.dtype == np.uint8
        ref = png_decode(open(pp, "rb").read())
        alpha = syscodec.webp_decode_rgba_sys(data)[..., 3]
        mask = alpha == 255
        assert mask.sum() >= 32  # enough opaque logo pixels to be meaningful
        d = rgb[mask].astype(np.float64) - ref[mask].astype(np.float64)
        p = 10 * np.log10(255.0**2 / max((d**2).mean(), 1e-12))
        # 23.5 dB measured: a sharp-edged 16x16 logo at whatever quality
        # its author picked. 20 dB separates "correct lossy decode" from
        # wiring bugs (a channel swap reads ~10 dB on this vector).
        assert p >= 20.0, f"lossy decode vs PNG sibling PSNR {p:.1f} dB"


# ---------------------------------------------------------------------------
# PNG — libpng simplified-API oracle
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not syscodec.have("png"), reason="libpng absent")
class TestPngLibpngOracle:
    @pytest.mark.parametrize("shape", [(1, 1, 3), (9, 13, 3), (32, 24, 3)])
    def test_encoder_roundtrip_via_libpng(self, shape):
        rng = np.random.default_rng(shape[0] * shape[1])
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = syscodec.png_decode_rgba_sys(png_encode(img))
        assert (got[..., :3] == img).all() and (got[..., 3] == 255).all()

    def test_depth_fixtures_match_libpng(self):
        # the hand-muxed sub-byte fixtures from the depth suite, decoded by
        # both implementations — catches packing/scaling divergence the
        # fixture's known-pixels assertions could miss symmetrically
        import test_functions as tf

        fixtures = []
        # gray 1/2/4-bit, 10 px wide to exercise byte padding
        for depth in (1, 2, 4):
            rows = [
                [(x * 7 + y * 3) % (1 << depth) for x in range(10)]
                for y in range(4)
            ]
            raw = b"".join(b"\x00" + tf._pack_bits(r, depth) for r in rows)
            fixtures.append(tf._mux_png_d(10, 4, 0, depth, raw))
        # palette 4-bit with a 11-entry palette
        pal = bytes(range(33))
        rows = [[(x + y) % 11 for x in range(7)] for y in range(5)]
        raw = b"".join(b"\x00" + tf._pack_bits(r, 4) for r in rows)
        fixtures.append(tf._mux_png_d(7, 5, 3, 4, raw, plte=pal))
        for data in fixtures:
            ours = png_decode(data)
            libs = syscodec.png_decode_rgba_sys(data)
            assert (ours == libs[..., :3]).all()

    def test_real_corpus_matches_libpng(self):
        # every ≤8-bit, gamma-neutral real PNG on the box: full RGB byte
        # equality (alpha dropped by the pure decoder by contract).
        # libpng's simplified API ignores eXIf, so its raw raster is
        # transformed by each file's declared orientation before the
        # compare — png_decode returns display orientation (exif.py);
        # pngtest.png (orientation 5) exercises this live.
        from olake_spark.functions.exif import (
            apply_orientation,
            orientation_from_exif,
        )

        paths = _real_pngs()
        if not paths:
            pytest.skip("no real PNG corpus found")
        compared = oriented = 0
        for path in paths:
            data = open(path, "rb").read()
            props = _png_props(data)
            if props["depth"] == 16 or not props["gamma_safe"]:
                continue  # documented convention splits (syscodec docstring)
            o = _png_exif_orientation(data, orientation_from_exif)
            ours = png_decode(data)
            libs = apply_orientation(syscodec.png_decode_rgba_sys(data), o)
            assert ours.shape == libs.shape[:2] + (3,), path
            assert (ours == libs[..., :3]).all(), path
            compared += 1
            oriented += o != 1
        assert compared >= 3, f"corpus too thin: {compared} files compared"
        assert oriented >= 1, "corpus never exercised a non-identity eXIf"


# ---------------------------------------------------------------------------
# TIFF — libtiff RGBA-interface oracle
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not syscodec.have("tiff"), reason="libtiff absent")
class TestTiffLibtiffOracle:
    def _check(self, data: bytes):
        ours = tiff_decode(data)
        libs = syscodec.tiff_decode_rgba_sys(data)
        assert ours.shape == libs.shape[:2] + (3,)
        assert (ours == libs[..., :3]).all()

    @pytest.mark.parametrize("bo", ["<", ">"])
    def test_rgb8_both_byte_orders(self, bo):
        import test_tiffcodec as tt

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        self._check(
            tt._mux_tiff(bo, 5, 6, 2, [img.tobytes()], bits=(8, 8, 8), samples=3)
        )

    def test_gray8_and_inverted(self):
        import test_tiffcodec as tt

        g = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
        # photometric 1 (BlackIsZero) and 0 (WhiteIsZero → both invert)
        self._check(tt._mux_tiff("<", 8, 6, 1, [g.tobytes()]))
        self._check(tt._mux_tiff("<", 8, 6, 0, [g.tobytes()]))

    def test_multi_strip_packbits(self):
        import test_tiffcodec as tt

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (9, 4, 3), dtype=np.uint8)
        strips = [
            tt._packbits_encode(img[i : i + 3].tobytes()) for i in range(0, 9, 3)
        ]
        self._check(
            tt._mux_tiff(
                "<", 4, 9, 2, strips, bits=(8, 8, 8), samples=3,
                compression=32773, rows_per_strip=3,
            )
        )

    def test_lzw_with_predictor2(self):
        import test_tiffcodec as tt

        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
        diff = img.astype(np.int16)
        diff[:, 1:] -= img[:, :-1].astype(np.int16)
        payload = tt._lzw_encode_tiff((diff & 0xFF).astype(np.uint8).tobytes())
        self._check(
            tt._mux_tiff(
                "<", 6, 7, 2, [payload], bits=(8, 8, 8), samples=3,
                compression=5, predictor=2,
            )
        )

    def test_palette_16bit_colormap(self):
        import test_tiffcodec as tt

        idx = np.array([[0, 1, 2, 3]] * 3, dtype=np.uint8)
        # full 3*2^8-entry ColorMap (spec-required length): 16-bit planes
        # R,G,B with four live entries each; libtiff >>8s them, as does
        # the pure decoder
        pad = [0] * 252
        cmap = (
            [0x1100, 0x2200, 0x3300, 0x4400] + pad
            + [0x0500, 0x0600, 0x0700, 0x0800] + pad
            + [0xAA00, 0xBB00, 0xCC00, 0xDD00] + pad
        )
        self._check(
            tt._mux_tiff(
                "<", 4, 3, 3, [idx.tobytes()], bits=(8,), samples=1,
                colormap=cmap,
            )
        )

    def test_tiled_rgb_with_edge_padding(self):
        import test_tiffcodec as tt

        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (20, 37, 3), dtype=np.uint8)
        tiles = tt._tile_split(img, 16, 16)
        self._check(
            tt._mux_tiff("<", 37, 20, 2, tiles, bits=(8, 8, 8), samples=3,
                         tiles=(16, 16))
        )

    def test_tiled_lzw_predictor(self):
        import test_tiffcodec as tt

        rng = np.random.default_rng(32)
        img = rng.integers(0, 256, (18, 30, 3), dtype=np.uint8)
        tiles = []
        for t in tt._tile_split(img, 16, 16):
            a = np.frombuffer(t, np.uint8).reshape(16, 16, 3).astype(np.int16)
            d = a.copy()
            d[:, 1:] -= a[:, :-1]
            tiles.append(
                tt._lzw_encode_tiff((d & 0xFF).astype(np.uint8).tobytes())
            )
        self._check(
            tt._mux_tiff("<", 30, 18, 2, tiles, bits=(8, 8, 8), samples=3,
                         compression=5, predictor=2, tiles=(16, 16))
        )

    def test_planar_strips_and_planar_tiled(self):
        import test_tiffcodec as tt

        rng = np.random.default_rng(33)
        img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        strips = []
        for p in range(3):
            plane = img[:, :, p]
            strips += [plane[i : i + 2].tobytes() for i in range(0, 5, 2)]
        self._check(
            tt._mux_tiff("<", 4, 5, 2, strips, bits=(8, 8, 8), samples=3,
                         rows_per_strip=2, planar=2)
        )
        img2 = rng.integers(0, 256, (16, 18, 3), dtype=np.uint8)
        tiles = []
        for p in range(3):
            tiles += tt._tile_split(img2[:, :, p], 16, 16)
        self._check(
            tt._mux_tiff("<", 18, 16, 2, tiles, bits=(8, 8, 8), samples=3,
                         planar=2, tiles=(16, 16))
        )

    def test_deflate_strips(self):
        import test_tiffcodec as tt
        import zlib

        rng = np.random.default_rng(34)
        img = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
        strips = [
            zlib.compress(img[i : i + 2].tobytes()) for i in range(0, 6, 2)
        ]
        self._check(
            tt._mux_tiff("<", 7, 6, 2, strips, bits=(8, 8, 8), samples=3,
                         compression=8, rows_per_strip=2)
        )

    def test_real_python_tiff_premultiply_relation(self):
        # python.tiff carries unassociated alpha: the pure decoder returns
        # the unmultiplied RGB planes; libtiff premultiplies with the exact
        # (v*a + 127) // 255 kernel. Reconstructing libtiff's output from
        # ours + libtiff's alpha must match BYTE-FOR-BYTE — a far stronger
        # statement than fuzzy closeness.
        path = _find_asset("python.tiff")
        if not path:
            pytest.skip("python.tiff not present")
        data = open(path, "rb").read()
        ours = tiff_decode(data)
        libs = syscodec.tiff_decode_rgba_sys(data)
        a = libs[..., 3:4].astype(np.uint32)
        premul = ((ours.astype(np.uint32) * a + 127) // 255).astype(np.uint8)
        assert (premul == libs[..., :3]).all()
        # and where alpha is opaque the planes must agree directly
        opaque = libs[..., 3] == 255
        assert (ours[opaque] == libs[..., :3][opaque]).all()


# ---------------------------------------------------------------------------
# GIF — giflib raster oracle over every real GIF on the box
# ---------------------------------------------------------------------------


@pytest.mark.skipif(not syscodec.have("gif"), reason="giflib absent")
class TestGifGiflibOracle:
    def test_every_real_gif_frame0_raster(self):
        paths = _real_gifs()
        if not paths:
            pytest.skip("no real GIFs found")
        compared = 0
        for path in paths:
            data = open(path, "rb").read()
            ref = syscodec.gif_slurp_sys(data)
            frames, _delays = gif_decode_frames(data)
            assert len(frames) == len(ref["frames"]), path
            f0 = ref["frames"][0]
            # DGifSlurp de-interlaces (4-pass writes to display rows), so
            # the raster is already display-order for both flag states
            raster = f0["raster"]
            assert f0["palette"] is not None, path
            rgb = f0["palette"][raster]
            mine = frames[0][
                f0["top"] : f0["top"] + f0["height"],
                f0["left"] : f0["left"] + f0["width"],
            ]
            mask = (
                raster != f0["transparent"]
                if f0["transparent"] >= 0
                else np.ones_like(raster, bool)
            )
            assert (mine[mask] == rgb[mask]).all(), path
            compared += 1
        assert compared >= 5, f"corpus too thin: {compared} GIFs"

    def test_multiframe_rasters_and_delays(self):
        # deepest multi-frame file available: every frame's raster (not
        # just frame 0) against giflib, transparency-masked, plus delays
        paths = [p for p in _real_gifs() if "tai-ku" in p] or _real_gifs()
        if not paths:
            pytest.skip("no real GIFs found")
        data = open(paths[0], "rb").read()
        ref = syscodec.gif_slurp_sys(data)
        frames, delays = gif_decode_frames(data)
        assert len(frames) == len(ref["frames"])
        for i, fr in enumerate(ref["frames"]):
            raster = fr["raster"]  # display order (DGifSlurp de-interlaces)
            rgb = fr["palette"][raster]
            mine = frames[i][
                fr["top"] : fr["top"] + fr["height"],
                fr["left"] : fr["left"] + fr["width"],
            ]
            mask = (
                raster != fr["transparent"]
                if fr["transparent"] >= 0
                else np.ones_like(raster, bool)
            )
            assert (mine[mask] == rgb[mask]).all(), f"frame {i}"
            assert delays[i] == fr["delay"]
