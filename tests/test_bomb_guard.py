"""Decompression-bomb guard (imagecodec.MAX_IMAGE_PIXELS): every
compressed container must reject oversized declared dimensions BEFORE
allocating the canvas / inflating, through the normal ValueError seam;
in-limit images must be unaffected; the env override must be honored."""

import struct
import zlib

import numpy as np
import pytest

from olake_spark.functions import imagecodec
from olake_spark.functions.imagecodec import decode_image, png_encode


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _bomb_png(w: int, h: int) -> bytes:
    """A tiny file legally declaring w x h (payload deliberately small —
    the guard must fire on the HEADER, before any inflate)."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + _png_chunk(b"IEND", b""))


@pytest.fixture
def tiny_limit(monkeypatch):
    monkeypatch.setattr(imagecodec, "MAX_IMAGE_PIXELS", 1_000)


class TestBombGuard:
    def test_real_expanding_png_bomb_blocked(self):
        # 20000x20000 (400 Mpx > the 2^27 default): a ~100 KB file that
        # would expand to 1.2 GB of raster — must die on the header
        w = h = 20_000
        raw = b"\x00" * (h * (1 + 3 * w) // 100)  # partial payload suffices
        png = (b"\x89PNG\r\n\x1a\n"
               + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + _png_chunk(b"IDAT", zlib.compress(raw))
               + _png_chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(png)

    def test_boundary_exact_limit_decodes(self, tiny_limit):
        # exactly at the limit: allowed (guard is strict-greater)
        arr = np.zeros((25, 40, 3), dtype=np.uint8)  # 1000 px
        assert decode_image(png_encode(arr)).shape == (25, 40, 3)
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(_bomb_png(25, 41))

    def test_zero_disables(self, monkeypatch):
        monkeypatch.setattr(imagecodec, "MAX_IMAGE_PIXELS", 0)
        arr = np.zeros((40, 40, 3), dtype=np.uint8)
        assert decode_image(png_encode(arr)).shape == (40, 40, 3)

    def test_gif_guarded(self, tiny_limit):
        # header-only GIF declaring a 65535x65535 canvas
        gif = (b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
               + b"\x3b")
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(gif)

    def test_bmp_guarded(self, tiny_limit):
        hdr = (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
               + struct.pack("<IiiHHIIiiII", 40, 100_000, 100_000, 1, 24,
                             0, 0, 0, 0, 0, 0))
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(hdr + b"\x00" * 16)

    def test_jpeg_guarded(self, tiny_limit):
        # SOI + SOF0 declaring 60000x60000, one component
        sof = struct.pack(">HBHHB", 8 + 3, 8, 60_000, 60_000, 1) + b"\x01\x11\x00"
        jpg = b"\xff\xd8\xff\xc0" + sof + b"\xff\xd9"
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(jpg)

    def test_tiff_guarded(self, tiny_limit):
        # minimal little-endian IFD declaring 50000x50000
        def entry(tag, typ, val):
            return struct.pack("<HHII", tag, typ, 1, val)
        entries = (entry(256, 3, 50_000) + entry(257, 3, 50_000)
                   + entry(262, 3, 1) + entry(273, 4, 8)
                   + entry(279, 4, 4))
        ifd = struct.pack("<H", 5) + entries + struct.pack("<I", 0)
        tif = b"II*\x00" + struct.pack("<I", 8) + ifd
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(tif)

    def test_tiff_tile_grid_guarded(self, tiny_limit):
        # w x h passes the guard, but the declared tile size pads the
        # assembly canvas beyond it: 30x30 image, 1024x1024 tiles
        def entry(tag, typ, val):
            return struct.pack("<HHII", tag, typ, 1, val)
        entries = (entry(256, 3, 30) + entry(257, 3, 30)
                   + entry(262, 3, 1)
                   + entry(322, 3, 1024) + entry(323, 3, 1024)
                   + entry(324, 4, 8) + entry(325, 4, 4))
        ifd = struct.pack("<H", 7) + entries + struct.pack("<I", 0)
        tif = b"II*\x00" + struct.pack("<I", 8) + ifd
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(tif)

    def test_netpbm_guarded(self, tiny_limit):
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(b"P5\n50000 50000\n255\n" + b"\x00" * 64)

    def test_webp_vp8l_guarded(self, tiny_limit):
        # VP8L header: signature 0x2f then 14-bit (w-1), 14-bit (h-1) LSB-first
        w = h = 16_000
        bits = (w - 1) | ((h - 1) << 14)  # + version 0 / alpha 0 in top bits
        payload = b"\x2f" + struct.pack("<I", bits)
        webp = (b"RIFF" + struct.pack("<I", 4 + 8 + len(payload) + 1)
                + b"WEBP" + b"VP8L" + struct.pack("<I", len(payload))
                + payload + b"\x00")
        with pytest.raises(ValueError, match="decompression-bomb"):
            decode_image(webp)

    def test_in_limit_default_unaffected(self):
        # the default limit must not touch normal fixtures
        arr = (np.arange(48 * 32 * 3, dtype=np.uint32) % 256).astype(np.uint8)
        arr = arr.reshape(48, 32, 3)
        out = decode_image(png_encode(arr))
        assert np.array_equal(out, arr)
