"""EXIF orientation: parsing, the 8 raster transforms, and the wiring
into every container decode path (JPEG APP1, TIFF tag 274, PNG eXIf,
WebP EXIF chunk).

Oracles: hand-derived expected matrices for all 8 transforms on an
asymmetric raster; libtiff (syscodec) byte-equality for TIFF
orientations 1-4 — libtiff's RGBA interface is the reference for the
"return display orientation" convention — plus a pinned assertion of
libtiff's KNOWN divergence on 5-8 (tif_getimage.c drops the transpose,
collapsing 5/6/7/8 to 1/2/3/4; we follow the EXIF spec / Pillow
exif_transpose / libvips autorotate instead, which the hand oracles
verify)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from olake_spark.functions import syscodec
from olake_spark.functions.exif import (
    apply_orientation,
    jpeg_orientation,
    orientation_from_exif,
)
from olake_spark.functions.imagecodec import _chunk, decode_image, png_decode, png_encode
from olake_spark.functions.jpegcodec import jpeg_decode, jpeg_encode
from olake_spark.functions.tiffcodec import tiff_decode
from olake_spark.functions.webpcodec import webp_decode, webp_encode

# ---------------------------------------------------------------------------
# muxers
# ---------------------------------------------------------------------------


def _exif_tiff(o: int, bo: str = "<") -> bytes:
    """A minimal EXIF TIFF stream: one IFD0 with Orientation (274)."""
    if bo == "<":
        return (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 274, 3, 1) + struct.pack("<HH", o, 0)
            + struct.pack("<I", 0)
        )
    return (
        b"MM\x00*" + struct.pack(">I", 8) + struct.pack(">H", 1)
        + struct.pack(">HHI", 274, 3, 1) + struct.pack(">HH", o, 0)
        + struct.pack(">I", 0)
    )


def _jpeg_with_exif(jpg: bytes, o: int, bo: str = "<") -> bytes:
    body = b"Exif\x00\x00" + _exif_tiff(o, bo)
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpg[:2] + seg + jpg[2:]


def _png_with_exif(png: bytes, o: int) -> bytes:
    # insert the eXIf chunk right after IHDR (signature 8 + IHDR 25 = 33)
    return png[:33] + _chunk(b"eXIf", _exif_tiff(o)) + png[33:]


def _webp_with_exif(webp: bytes, o: int) -> bytes:
    t = _exif_tiff(o)
    chunk = b"EXIF" + struct.pack("<I", len(t)) + t + (b"\x00" if len(t) & 1 else b"")
    out = webp + chunk
    return out[:4] + struct.pack("<I", len(out) - 8) + out[8:]


# ---------------------------------------------------------------------------
# the 8 transforms — hand oracle
# ---------------------------------------------------------------------------


class TestApplyOrientation:
    def test_all_eight_hand_oracle(self):
        a = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
        exp = {
            1: [[1, 2, 3], [4, 5, 6]],
            2: [[3, 2, 1], [6, 5, 4]],          # mirror
            3: [[6, 5, 4], [3, 2, 1]],          # rot180
            4: [[4, 5, 6], [1, 2, 3]],          # flip vertical
            5: [[1, 4], [2, 5], [3, 6]],        # transpose
            6: [[4, 1], [5, 2], [6, 3]],        # rot90 CW
            7: [[6, 3], [5, 2], [4, 1]],        # transverse
            8: [[3, 6], [2, 5], [1, 4]],        # rot90 CCW
        }
        for o, e in exp.items():
            got = apply_orientation(a, o)
            assert got.tolist() == e, f"orientation {o}"
            assert got.flags.c_contiguous

    def test_identity_is_copy_free_and_out_of_range_tolerant(self):
        a = np.arange(12, dtype=np.uint8).reshape(3, 4)
        assert apply_orientation(a, 1) is a
        assert apply_orientation(a, 0) is a
        assert apply_orientation(a, 9) is a

    def test_inverses_round_trip(self):
        rng = np.random.default_rng(5)
        a = rng.integers(0, 256, (4, 7, 3), dtype=np.uint8)
        inverse = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
        for o, inv in inverse.items():
            assert (apply_orientation(apply_orientation(a, o), inv) == a).all()

    def test_3d_matches_2d_per_channel(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
        for o in range(1, 9):
            got = apply_orientation(a, o)
            for c in range(3):
                assert (got[..., c] == apply_orientation(a[..., c], o)).all()


# ---------------------------------------------------------------------------
# payload parsing tolerance
# ---------------------------------------------------------------------------


class TestOrientationFromExif:
    @pytest.mark.parametrize("bo", ["<", ">"])
    @pytest.mark.parametrize("o", [1, 3, 6, 8])
    def test_both_byte_orders(self, bo, o):
        assert orientation_from_exif(_exif_tiff(o, bo)) == o

    def test_optional_prefix_accepted(self):
        assert orientation_from_exif(b"Exif\x00\x00" + _exif_tiff(7)) == 7

    def test_garbage_and_absent_yield_identity(self):
        assert orientation_from_exif(b"") == 1
        assert orientation_from_exif(b"not a tiff at all") == 1
        assert orientation_from_exif(b"II*\x00\x08\x00\x00") == 1  # truncated
        # valid TIFF stream with no orientation tag
        no_tag = (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 1)
            + struct.pack("<HHI", 256, 3, 1) + struct.pack("<HH", 4, 0)
            + struct.pack("<I", 0)
        )
        assert orientation_from_exif(no_tag) == 1
        # out-of-range values
        assert orientation_from_exif(_exif_tiff(0)) == 1
        assert orientation_from_exif(_exif_tiff(9)) == 1


# ---------------------------------------------------------------------------
# JPEG APP1
# ---------------------------------------------------------------------------


class TestJpegExif:
    @pytest.mark.parametrize("bo", ["<", ">"])
    @pytest.mark.parametrize("o", list(range(1, 9)))
    def test_decode_image_returns_display_orientation(self, o, bo):
        rng = np.random.default_rng(o)
        img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
        plain = jpeg_encode(img, quality=90)
        base = jpeg_decode(plain)
        data = _jpeg_with_exif(plain, o, bo)
        assert jpeg_orientation(data) == o
        got = decode_image(data)
        exp = apply_orientation(base, o)
        assert got.shape == exp.shape  # dims swap for 5-8
        assert (got == exp).all()

    def test_non_exif_app1_and_plain_streams_are_identity(self):
        img = np.full((8, 8, 3), 200, dtype=np.uint8)
        plain = jpeg_encode(img)
        assert jpeg_orientation(plain) == 1
        body = b"http://ns.adobe.com/xap/1.0/\x00<xml/>"
        seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
        assert jpeg_orientation(plain[:2] + seg + plain[2:]) == 1

    def test_malformed_exif_never_breaks_the_decode(self):
        img = np.full((8, 8, 3), 90, dtype=np.uint8)
        plain = jpeg_encode(img)
        body = b"Exif\x00\x00" + b"\xde\xad\xbe\xef" * 4
        seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
        data = plain[:2] + seg + plain[2:]
        assert jpeg_orientation(data) == 1
        assert (decode_image(data) == jpeg_decode(plain)).all()

    def test_non_jpeg_is_identity(self):
        assert jpeg_orientation(b"\x89PNG\r\n\x1a\n") == 1
        assert jpeg_orientation(b"") == 1


# ---------------------------------------------------------------------------
# TIFF tag 274 — with the libtiff oracle
# ---------------------------------------------------------------------------


class TestTiffOrientation:
    def _fixture(self, o: int):
        import test_tiffcodec as tt

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        data = tt._mux_tiff(
            "<", 6, 4, 2, [img.tobytes()], bits=(8, 8, 8), samples=3,
            extra=[(274, 3, [o])],
        )
        return img, data

    @pytest.mark.parametrize("o", list(range(1, 9)))
    def test_spec_transform(self, o):
        img, data = self._fixture(o)
        assert (tiff_decode(data) == apply_orientation(img, o)).all()

    @pytest.mark.skipif(not syscodec.have("tiff"), reason="libtiff absent")
    @pytest.mark.parametrize("o", [1, 2, 3, 4])
    def test_libtiff_oracle_flips(self, o):
        _img, data = self._fixture(o)
        ours = tiff_decode(data)
        libs = syscodec.tiff_decode_rgba_sys(data)
        assert ours.shape == libs.shape[:2] + (3,)
        assert (ours == libs[..., :3]).all()

    @pytest.mark.skipif(not syscodec.have("tiff"), reason="libtiff absent")
    @pytest.mark.parametrize("o", [5, 6, 7, 8])
    def test_libtiff_known_transpose_collapse(self, o):
        # pinned divergence: libtiff's RGBA interface drops the transpose
        # (tif_getimage.c), rendering 5/6/7/8 as 1/2/3/4. We follow the
        # EXIF spec (Pillow exif_transpose / libvips autorotate).
        img, data = self._fixture(o)
        libs = syscodec.tiff_decode_rgba_sys(data)
        assert (libs[..., :3] == apply_orientation(img, o - 4)).all()
        assert tiff_decode(data).shape == (6, 4, 3)  # ours transposes


# ---------------------------------------------------------------------------
# PNG eXIf + WebP EXIF chunk
# ---------------------------------------------------------------------------


class TestPngAndWebpExif:
    @pytest.mark.parametrize("o", [2, 5, 6, 8])
    def test_png_exif_chunk(self, o):
        rng = np.random.default_rng(o + 20)
        img = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
        data = _png_with_exif(png_encode(img), o)
        assert (png_decode(data) == apply_orientation(img, o)).all()
        assert (decode_image(data) == apply_orientation(img, o)).all()

    def test_png_without_exif_unchanged(self):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (5, 5, 3), dtype=np.uint8)
        assert (png_decode(png_encode(img)) == img).all()

    @pytest.mark.skipif(not syscodec.have("png"), reason="libpng absent")
    def test_png_exif_mux_still_valid_per_libpng(self):
        # the muxed file must remain a spec-valid PNG (chunk CRCs, order)
        img = np.arange(27, dtype=np.uint8).reshape(3, 3, 3) * 9
        data = _png_with_exif(png_encode(img), 3)
        libs = syscodec.png_decode_rgba_sys(data)
        assert (libs[..., :3] == img).all()  # libpng ignores eXIf content

    @pytest.mark.parametrize("o", [3, 6])
    def test_webp_exif_chunk_after_image_data(self, o):
        rng = np.random.default_rng(o + 30)
        img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
        data = _webp_with_exif(webp_encode(img), o)
        assert (webp_decode(data) == apply_orientation(img, o)).all()
        assert (decode_image(data) == apply_orientation(img, o)).all()

    def test_webp_without_exif_unchanged(self):
        rng = np.random.default_rng(51)
        img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
        assert (webp_decode(webp_encode(img)) == img).all()
