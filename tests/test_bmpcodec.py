"""BMP decoder vs hand-muxed known-pixel files (independent test-side mux)."""

import struct

import numpy as np
import pytest

from olake_spark.functions import imagecodec as ic
from olake_spark.functions.bmpcodec import bmp_decode


def _mux_bmp(w, h_signed, bpp, pixel_rows, palette=None, compression=0,
             hdr_size=40, clr_used=0):
    """Hand-mux a BMP: `pixel_rows` is the raw padded pixel array bytes in
    FILE order (bottom-up unless h_signed < 0). Palette entries are RGB
    tuples, stored as BGRA quads like real encoders write."""
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    pix_off = 14 + hdr_size + len(pal)
    body = (struct.pack("<IiiHHIIiiII", hdr_size, w, h_signed, 1, bpp,
                        compression, len(pixel_rows), 2835, 2835,
                        clr_used, 0)
            + b"\x00" * (hdr_size - 40))
    return (b"BM" + struct.pack("<IHHI", pix_off + len(pixel_rows), 0, 0,
                                pix_off)
            + body + pal + bytes(pixel_rows))


def _pad4(row: bytes) -> bytes:
    return row + b"\x00" * ((-len(row)) % 4)


class TestBmpDecode:
    def test_24bpp_bottom_up_with_padding(self):
        # 3x2 image; rows stored bottom-up, BGR, padded 9 -> 12 bytes
        top = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        bot = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]
        raw = (_pad4(b"".join(bytes([b, g, r]) for r, g, b in bot))
               + _pad4(b"".join(bytes([b, g, r]) for r, g, b in top)))
        out = bmp_decode(_mux_bmp(3, 2, 24, raw))
        assert (out == np.array([top, bot], dtype=np.uint8)).all()

    def test_32bpp_and_top_down(self):
        px = [(9, 8, 7), (6, 5, 4)]
        raw = b"".join(bytes([b, g, r, 0xEE]) for r, g, b in px)  # X ignored
        out = bmp_decode(_mux_bmp(2, -1, 32, raw))  # negative h = top-down
        assert (out == np.array([px], dtype=np.uint8)).all()

    def test_8bpp_palette(self):
        pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
        rows = _pad4(bytes([3, 0, 1])) + _pad4(bytes([2, 2, 0]))  # bottom-up
        out = bmp_decode(_mux_bmp(3, 2, 8, rows, palette=pal, clr_used=4))
        want = np.array([[pal[2], pal[2], pal[0]],
                         [pal[3], pal[0], pal[1]]], dtype=np.uint8)
        assert (out == want).all()

    def test_4bpp_packed_odd_width(self):
        pal = [(i, i * 2, i * 3) for i in range(16)]
        # w=3: indices 5,10,15 pack to bytes 0x5A 0xF0 (pad nibble), pad to 4
        row = _pad4(bytes([0x5A, 0xF0]))
        out = bmp_decode(_mux_bmp(3, 1, 4, row, palette=pal))
        want = np.array([[pal[5], pal[10], pal[15]]], dtype=np.uint8)
        assert (out == want).all()

    def test_1bpp_spans_byte(self):
        pal = [(0, 0, 0), (255, 255, 255)]
        bits = [1, 0, 1, 1, 0, 0, 1, 0, 1]  # w=9 -> 2 bytes -> pad to 4
        b0 = int("".join(map(str, bits[:8])), 2)
        row = _pad4(bytes([b0, 0b10000000]))
        out = bmp_decode(_mux_bmp(9, 1, 1, row, palette=pal))
        want = np.array([[pal[b] for b in bits]], dtype=np.uint8)
        assert (out == want).all()

    def test_v5_header_palette_offset(self):
        # 124-byte BITMAPV5HEADER: palette sits after the bigger header
        pal = [(11, 22, 33), (44, 55, 66)]
        row = _pad4(bytes([1, 0]))
        out = bmp_decode(_mux_bmp(2, 1, 8, row, palette=pal, hdr_size=124,
                                  clr_used=2))
        assert (out == np.array([[pal[1], pal[0]]], dtype=np.uint8)).all()

    def test_errors(self):
        with pytest.raises(ValueError, match="not a BMP"):
            bmp_decode(b"XX" + b"\x00" * 60)
        row = _pad4(bytes([0, 0]))
        with pytest.raises(ValueError, match="compression"):
            bmp_decode(_mux_bmp(2, 1, 8, row,
                                palette=[(0, 0, 0)] * 256, compression=1))
        with pytest.raises(ValueError, match="bit depth"):
            bmp_decode(_mux_bmp(2, 1, 16, row))
        with pytest.raises(ValueError, match="truncated BMP pixel"):
            bmp_decode(_mux_bmp(100, 100, 24, b"\x00" * 10))
        with pytest.raises(ValueError, match="beyond palette"):
            # clr_used=2 but an index of 5 appears
            bmp_decode(_mux_bmp(2, 1, 8, _pad4(bytes([5, 0])),
                                palette=[(0, 0, 0), (1, 1, 1)], clr_used=2))

    def test_decode_image_dispatch_and_error_contract(self):
        px = [(100, 110, 120)]
        raw = _pad4(bytes([120, 110, 100]))
        data = _mux_bmp(1, 1, 24, raw)
        assert (ic.decode_image(data) == np.array([px], dtype=np.uint8)).all()
        with pytest.raises(ValueError):
            ic.decode_image(data[:20])
