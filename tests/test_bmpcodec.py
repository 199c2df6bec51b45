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
        with pytest.raises(ValueError, match="compression"):  # BI_BITFIELDS
            bmp_decode(_mux_bmp(2, 1, 8, row,
                                palette=[(0, 0, 0)] * 256, compression=3))
        with pytest.raises(ValueError, match="BI_RLE8 requires 8 bpp"):
            bmp_decode(_mux_bmp(2, 1, 4, row,
                                palette=[(0, 0, 0)] * 16, compression=1))
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


# ---------------------------------------------------------------------------
# RLE8 / RLE4
# ---------------------------------------------------------------------------


def _rle8_encode(idx: np.ndarray) -> bytes:
    """Independent row-wise RLE8 encoder: maximal runs per row, EOL after
    each row, EOB at the end — the shape real encoders emit."""
    out = bytearray()
    for row in idx[::-1]:  # file order is bottom-up
        x, w = 0, len(row)
        while x < w:
            run = 1
            while x + run < w and row[x + run] == row[x] and run < 255:
                run += 1
            out += bytes([run, int(row[x])])
            x += run
        out += b"\x00\x00"  # EOL
    out += b"\x00\x01"  # EOB
    return bytes(out)


def _rle4_encode(idx: np.ndarray) -> bytes:
    """Independent RLE4 encoder using absolute mode per row (covers the
    nibble packing + word-alignment padding path)."""
    out = bytearray()
    for row in idx[::-1]:
        vals = list(map(int, row))
        # absolute mode needs >= 3 pixels; pad logic handled by decoder
        assert len(vals) >= 3
        out += bytes([0, len(vals)])
        packed = bytearray()
        for i in range(0, len(vals), 2):
            hi = vals[i] << 4
            lo = vals[i + 1] if i + 1 < len(vals) else 0
            packed.append(hi | lo)
        if len(packed) & 1:
            packed.append(0)  # word alignment
        out += packed
        out += b"\x00\x00"
    out += b"\x00\x01"
    return bytes(out)


class TestBmpRle:
    def test_rle8_runs_round_trip(self):
        rng = np.random.default_rng(61)
        pal = [(i, 255 - i, i ^ 0x5A) for i in range(16)]
        idx = rng.integers(0, 16, (7, 9), dtype=np.uint8)
        # make some actual runs
        idx[2, :5] = 7
        idx[5, 3:] = 12
        data = _mux_bmp(9, 7, 8, _rle8_encode(idx),
                        palette=pal, compression=1, clr_used=16)
        out = bmp_decode(data)
        exp = np.array(pal, dtype=np.uint8)[idx]
        assert (out == exp).all()

    def test_rle8_absolute_delta_and_early_eob(self):
        # hand-built stream: run, absolute mode (odd count -> pad byte),
        # delta skip (skipped pixels = palette 0), early EOB
        pal = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30),
               (40, 40, 40)]
        stream = bytes(
            [3, 1]            # row0 (bottom): 1 1 1
            + [0, 3, 2, 3, 4, 0]  # absolute: 2 3 4 (+pad byte)
            + [0, 0]          # EOL -> row 1
            + [0, 2, 2, 1]    # delta: skip 2 right, 1 up -> row 2, x=2
            + [2, 4]          # 4 4 at row2 x=2..3
            + [0, 1]          # EOB: everything else stays index 0
        )
        data = _mux_bmp(6, 3, 8, stream, palette=pal, compression=1,
                        clr_used=5)
        out = bmp_decode(data)
        idx = np.zeros((3, 6), dtype=np.uint8)
        idx[2, :3] = 1          # display row 2 = bottom
        idx[2, 3:6] = [2, 3, 4]
        idx[0, 2:4] = 4         # delta put cursor on bottom-up row 2 = top
        exp = np.array(pal, dtype=np.uint8)[idx]
        assert (out == exp).all()

    def test_rle4_absolute_round_trip(self):
        rng = np.random.default_rng(62)
        pal = [(15 * i, 255 - 15 * i, 7 * i) for i in range(16)]
        idx = rng.integers(0, 16, (5, 7), dtype=np.uint8)
        data = _mux_bmp(7, 5, 4, _rle4_encode(idx),
                        palette=pal, compression=2, clr_used=16)
        exp = np.array(pal, dtype=np.uint8)[idx]
        assert (bmp_decode(data) == exp).all()

    def test_rle4_run_alternates_nibbles(self):
        pal = [(0, 0, 0), (100, 0, 0), (0, 100, 0)]
        # run of 5 with value 0x12 -> 1 2 1 2 1
        stream = bytes([5, 0x12, 0, 0, 0, 1])
        data = _mux_bmp(5, 1, 4, stream, palette=pal, compression=2,
                        clr_used=3)
        exp = np.array(pal, dtype=np.uint8)[np.array([[1, 2, 1, 2, 1]])]
        assert (bmp_decode(data) == exp).all()

    def test_rle_error_contracts(self):
        pal = [(0, 0, 0)] * 256
        with pytest.raises(ValueError, match="truncated BMP RLE stream"):
            bmp_decode(_mux_bmp(4, 2, 8, bytes([2, 1]),  # no EOB
                                palette=pal, compression=1))
        with pytest.raises(ValueError, match="run past row end"):
            bmp_decode(_mux_bmp(4, 2, 8, bytes([9, 1, 0, 1]),
                                palette=pal, compression=1))
        with pytest.raises(ValueError, match="delta out of bounds"):
            bmp_decode(_mux_bmp(4, 2, 8, bytes([0, 2, 200, 200, 0, 1]),
                                palette=pal, compression=1))
        with pytest.raises(ValueError, match="bottom-up"):
            bmp_decode(_mux_bmp(4, -2, 8, bytes([0, 1]),
                                palette=pal, compression=1))
        with pytest.raises(ValueError, match="beyond palette"):
            bmp_decode(_mux_bmp(4, 1, 8, bytes([2, 9, 0, 1]),
                                palette=[(0, 0, 0), (1, 1, 1)],
                                compression=1, clr_used=2))

    def test_decode_image_routes_rle(self):
        from olake_spark.functions.imagecodec import decode_image

        pal = [(0, 0, 0), (200, 100, 50)]
        stream = bytes([4, 1, 0, 1])
        data = _mux_bmp(4, 1, 8, stream, palette=pal, compression=1,
                        clr_used=2)
        assert (decode_image(data)
                == np.array([[pal[1]] * 4], dtype=np.uint8)).all()
