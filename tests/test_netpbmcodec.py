"""Netpbm P1-P6 decoder vs hand-written files (the formats are simple
enough that the test files ARE the spec examples)."""

import numpy as np
import pytest

from olake_spark.functions import imagecodec as ic
from olake_spark.functions.netpbmcodec import netpbm_decode


class TestNetpbm:
    def test_p1_unseparated_digits_and_comments(self):
        data = b"P1\n# a comment\n4 2\n0110\n# mid\n1 0 0 1\n"
        out = netpbm_decode(data)
        bits = np.array([[0, 1, 1, 0], [1, 0, 0, 1]])
        want = np.repeat(((1 - bits) * 255).astype(np.uint8)[:, :, None], 3, 2)
        assert (out == want).all()

    def test_p2_maxval_scaling(self):
        data = b"P2\n3 1\n15\n0 7 15\n"
        out = netpbm_decode(data)
        # round(v*255/15): 0, 119, 255
        want = np.repeat(np.array([[0, 119, 255]],
                                  dtype=np.uint8)[:, :, None], 3, 2)
        assert (out == want).all()

    def test_p3_rgb_ascii(self):
        data = b"P3 2 2 255  1 2 3  4 5 6\n7 8 9  10 11 12"
        out = netpbm_decode(data)
        want = np.arange(1, 13, dtype=np.uint8).reshape(2, 2, 3)
        assert (out == want).all()

    def test_p4_packed_rows_pad(self):
        # 9x2: each row 2 bytes, 7 pad bits; 1 = black = 0 output
        rows = bytes([0b10110010, 0b10000000, 0b01001101, 0b00000000])
        data = b"P4\n9 2\n" + rows
        out = netpbm_decode(data)
        bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1],
                         [0, 1, 0, 0, 1, 1, 0, 1, 0]])
        want = np.repeat(((1 - bits) * 255).astype(np.uint8)[:, :, None], 3, 2)
        assert (out == want).all()

    def test_p5_binary_gray_8bit(self):
        data = b"P5 3 2 255\n" + bytes([0, 50, 100, 150, 200, 250])
        out = netpbm_decode(data)
        want = np.repeat(np.array([[0, 50, 100], [150, 200, 250]],
                                  dtype=np.uint8)[:, :, None], 3, 2)
        assert (out == want).all()

    def test_p5_16bit_big_endian(self):
        # maxval 65535 → two-byte BE samples, scaled v*255//65535 ≈ hi byte
        samples = np.array([[0x1234, 0xFF00]], dtype=">u2")
        data = b"P5 2 1 65535\n" + samples.tobytes()
        out = netpbm_decode(data)
        want_vals = (samples.astype(np.uint32) * 255 + 32767) // 65535
        want = np.repeat(want_vals.astype(np.uint8)[:, :, None], 3, 2)
        assert (out == want).all()

    def test_p6_rgb_binary_via_dispatch(self):
        arr = (np.arange(4 * 3 * 3, dtype=np.int64) * 13 % 256).astype(
            np.uint8).reshape(4, 3, 3)
        data = b"P6\n# made by a test\n3 4 255\n" + arr.tobytes()
        assert (ic.decode_image(data) == arr).all()

    def test_errors(self):
        with pytest.raises(ValueError, match="not a Netpbm"):
            netpbm_decode(b"P7 1 1 255 x")
        with pytest.raises(ValueError, match="truncated P5"):
            netpbm_decode(b"P5 10 10 255\n" + b"\x00" * 5)
        with pytest.raises(ValueError, match="truncated P1"):
            netpbm_decode(b"P1 4 4\n0101")
        with pytest.raises(ValueError, match="exceeds declared maxval"):
            netpbm_decode(b"P2 2 1 10\n5 11\n")
        with pytest.raises(ValueError, match="non-bit"):
            netpbm_decode(b"P1 2 1\n0 2\n")
        with pytest.raises(ValueError):
            ic.decode_image(b"P6 2 2 255\n")  # truncated, via dispatch


class TestNetpbmRealFiles:
    """CPython ships the SAME 16x16 Python-logo image as python.ppm (P6),
    python.pgm (P5), python.pbm (P4) and python.tiff — independently
    encoded by real tools. The PPM must decode BIT-IDENTICAL to the TIFF's
    RGB channels: two production decode paths (netpbmcodec, tiffcodec)
    meeting exactly on independently-authored files."""

    BASE = "/root/.pyenv/versions/3.7.16/lib/python3.7/test/imghdrdata/"

    def _read(self, name):
        import os
        p = self.BASE + name
        if not os.path.exists(p):
            pytest.skip(f"container file {p} not present")
        return open(p, "rb").read()

    def test_ppm_bit_identical_to_tiff(self):
        from olake_spark.functions.tiffcodec import tiff_decode
        ppm = netpbm_decode(self._read("python.ppm"))
        tif = tiff_decode(self._read("python.tiff"))
        assert ppm.shape == tif.shape == (16, 16, 3)
        assert (ppm == tif).all()

    def test_pgm_and_pbm_decode(self):
        pgm = netpbm_decode(self._read("python.pgm"))
        pbm = netpbm_decode(self._read("python.pbm"))
        assert pgm.shape == pbm.shape == (16, 16, 3)
        # gray/bilevel renditions of the same logo: every pbm pixel is
        # 0 or 255, and the gray version has intermediate tones
        assert set(np.unique(pbm)) <= {0, 255}
        assert len(np.unique(pgm)) > 2
