"""ICO/CUR decoder: hand-muxed known-pixel fixtures for both payload
kinds (headerless DIB, embedded PNG), directory handling, entry
selection, error contracts — and the real idle.ico shipped with every
CPython on the box (32-bpp DIB entries at 16/32/48 px plus a 256-px PNG
entry), whose PNG entry is cross-checked byte-for-byte against a direct
png_decode of the embedded stream."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from olake_spark.functions.icocodec import ico_decode, ico_entries, is_ico
from olake_spark.functions.imagecodec import decode_image, png_decode, png_encode

# ---------------------------------------------------------------------------
# muxers
# ---------------------------------------------------------------------------


def _pad4(row: bytes) -> bytes:
    return row + b"\x00" * ((-len(row)) % 4)


def _dib_payload(w: int, h: int, bpp: int, pixel_rows: bytes,
                 palette=None, with_mask: bool = True) -> bytes:
    """A headerless ICO DIB: BITMAPINFOHEADER with DOUBLED height, BGRA
    palette quads, bottom-up XOR raster, then the 1-bpp AND mask."""
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in palette)
    mask = _pad4(b"\x00" * ((w + 7) // 8)) * h if with_mask else b""
    hdr = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, bpp, 0,
                      len(pixel_rows) + len(mask), 0, 0,
                      0 if palette is None else len(palette), 0)
    return hdr + pal + pixel_rows + mask


def _mux_ico(payloads: list[tuple[int, int, int, bytes]], typ: int = 1) -> bytes:
    """ICONDIR + entries. payloads: (w, h, bpp, payload_bytes)."""
    cnt = len(payloads)
    off = 6 + 16 * cnt
    dirents, blobs = b"", b""
    for w, h, bpp, body in payloads:
        dirents += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, bpp, len(body), off
        )
        blobs += body
        off += len(body)
    return struct.pack("<HHH", 0, typ, cnt) + dirents + blobs


# ---------------------------------------------------------------------------
# hand-muxed fixtures
# ---------------------------------------------------------------------------


class TestIcoDecode:
    def test_32bpp_dib_entry(self):
        top = [(1, 2, 3), (4, 5, 6)]
        bot = [(7, 8, 9), (10, 11, 12)]
        raw = (b"".join(bytes([b, g, r, 0xAA]) for r, g, b in bot)
               + b"".join(bytes([b, g, r, 0xAA]) for r, g, b in top))
        ico = _mux_ico([(2, 2, 32, _dib_payload(2, 2, 32, raw))])
        out = ico_decode(ico)
        assert (out == np.array([top, bot], dtype=np.uint8)).all()

    def test_8bpp_palette_dib_entry(self):
        pal = [(250, 0, 0), (0, 250, 0), (0, 0, 250), (7, 7, 7)]
        rows = _pad4(bytes([3, 2, 1])) + _pad4(bytes([0, 1, 2]))  # bottom-up
        ico = _mux_ico([(3, 2, 8, _dib_payload(3, 2, 8, rows, palette=pal))])
        out = ico_decode(ico)
        exp = np.array([[pal[0], pal[1], pal[2]], [pal[3], pal[2], pal[1]]],
                       dtype=np.uint8)
        assert (out == exp).all()

    def test_png_entry(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
        ico = _mux_ico([(7, 5, 32, png_encode(img))])
        assert (ico_decode(ico) == img).all()

    def test_best_entry_selection_and_explicit_index(self):
        rng = np.random.default_rng(10)
        small = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
        big = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
        ico = _mux_ico([
            (2, 2, 32, png_encode(small)),
            (6, 6, 32, png_encode(big)),
        ])
        assert (ico_decode(ico) == big).all()          # area wins
        assert (ico_decode(ico, entry=0) == small).all()
        ents = ico_entries(ico)
        assert [e["w"] for e in ents] == [2, 6]
        assert all(e["png"] for e in ents)

    def test_bpp_breaks_area_ties(self):
        px4 = [(250, 0, 0)]
        pal = [(250, 0, 0), (0, 250, 0)]
        lo = _dib_payload(1, 1, 8, _pad4(bytes([0])), palette=pal)
        hi = _dib_payload(1, 1, 32, bytes([0, 250, 0, 0]))  # green, BGRX
        ico = _mux_ico([(1, 1, 8, lo), (1, 1, 32, hi)])
        assert ico_decode(ico).tolist() == [[[0, 250, 0]]]
        assert ico_decode(ico, entry=0).tolist() == [[list(px4[0])]]

    def test_cursor_type_accepted(self):
        img = np.full((2, 2, 3), 60, dtype=np.uint8)
        ico = _mux_ico([(2, 2, 32, png_encode(img))], typ=2)
        assert (ico_decode(ico) == img).all()

    def test_decode_image_routes_ico(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
        ico = _mux_ico([(4, 4, 32, png_encode(img))])
        assert is_ico(ico)
        assert (decode_image(ico) == img).all()

    def test_256px_zero_dims_convention(self):
        # directory bytes of 0 mean 256; use a PNG entry to keep it light
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
        ico = _mux_ico([(256, 256, 32, png_encode(img))])  # 256%256 == 0
        ents = ico_entries(ico)
        assert ents[0]["w"] == 256 and ents[0]["h"] == 256
        assert (ico_decode(ico) == img).all()


class TestIcoErrors:
    def test_not_ico(self):
        assert not is_ico(b"\x89PNG\r\n\x1a\n" + b"\x00" * 24)
        assert not is_ico(b"")
        with pytest.raises(ValueError, match="not an ICO"):
            ico_decode(b"\x01\x00\x01\x00\x01\x00" + b"\x00" * 16)

    def test_zero_entries(self):
        with pytest.raises(ValueError, match="zero directory"):
            ico_decode(struct.pack("<HHH", 0, 1, 0))

    def test_truncated_directory_and_payload(self):
        img = np.full((2, 2, 3), 1, dtype=np.uint8)
        good = _mux_ico([(2, 2, 32, png_encode(img))])
        with pytest.raises(ValueError, match="truncated ICO directory"):
            ico_decode(good[:12])
        # payload size pointing past EOF
        bad = bytearray(good)
        struct.pack_into("<I", bad, 6 + 8, 10 ** 6)
        with pytest.raises(ValueError, match="out of bounds"):
            ico_decode(bytes(bad))

    def test_odd_dib_height_rejected(self):
        hdr = struct.pack("<IiiHHIIiiII", 40, 2, 5, 1, 32, 0, 40, 0, 0, 0, 0)
        ico = _mux_ico([(2, 2, 32, hdr + b"\x00" * 40)])
        with pytest.raises(ValueError, match="not doubled"):
            ico_decode(ico)

    def test_entry_index_out_of_range(self):
        img = np.full((2, 2, 3), 1, dtype=np.uint8)
        ico = _mux_ico([(2, 2, 32, png_encode(img))])
        with pytest.raises(ValueError, match="out of range"):
            ico_decode(ico, entry=3)


# ---------------------------------------------------------------------------
# real files
# ---------------------------------------------------------------------------


class TestRealIdleIco:
    def _paths(self):
        return sorted(glob.glob(
            "/root/.pyenv/versions/*/lib/python*/idlelib/Icons/idle.ico"
        ))

    def test_every_idle_ico_decodes(self):
        paths = self._paths()
        if not paths:
            pytest.skip("no idle.ico on the box")
        for path in paths:
            data = open(path, "rb").read()
            assert is_ico(data), path
            ents = ico_entries(data)
            # CPython's icon: 32-bpp DIBs at 16/32/48 + a 256-px PNG
            assert {(e["w"], e["h"]) for e in ents} >= {(16, 16), (32, 32)}
            for i, e in enumerate(ents):
                out = ico_decode(data, entry=i)
                assert out.shape == (e["h"], e["w"], 3), (path, i)
                assert out.dtype == np.uint8

    def test_png_entry_matches_direct_png_decode(self):
        paths = self._paths()
        if not paths:
            pytest.skip("no idle.ico on the box")
        checked = 0
        for path in paths:
            data = open(path, "rb").read()
            ents = ico_entries(data)
            for i, e in enumerate(ents):
                if not e["png"]:
                    continue
                direct = png_decode(data[e["offset"] : e["offset"] + e["size"]])
                assert (ico_decode(data, entry=i) == direct).all(), path
                checked += 1
        assert checked >= 1, "no PNG entries found in the corpus"

    def test_default_entry_is_the_256px_png(self):
        paths = self._paths()
        if not paths:
            pytest.skip("no idle.ico on the box")
        data = open(paths[-1], "rb").read()
        out = decode_image(data)  # dispatch end-to-end
        assert out.shape == (256, 256, 3)
        # the IDLE logo is mostly white/light background
        assert out.mean() > 100
