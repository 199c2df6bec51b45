"""GIF decoder vs an INDEPENDENT test-side encoder + real container files.

The encoder below is the textbook GIF-LZW compressor (dictionary of seen
strings, variable-width LSB-first emission, CLEAR/EOI) written from the
spec without looking at the production decoder's structure — a
synchronization bug on either side (width-bump timing, KwKwK, clear
handling) breaks the round-trips here.
"""

import struct

import numpy as np
import pytest

from olake_spark.functions import gifcodec as gc
from olake_spark.functions import imagecodec as ic
from olake_spark.functions.videocodec import decode_video


def _lzw_encode(mcs, pixels, clear_every=None, emit_eoi=True):
    """Independent GIF-LZW encoder. `clear_every`: force a CLEAR code after
    every N emissions (exercises mid-stream dictionary resets)."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = mcs + 1

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    emit(clear)
    emitted = 0
    s = b""
    for p in bytes(pixels):
        c = bytes([p])
        if s + c in table:
            s = s + c
            continue
        emit(table[s])
        emitted += 1
        if next_code < 4096:
            table[s + c] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        s = c
        if clear_every and emitted % clear_every == 0:
            emit(clear)
            table = fresh()
            next_code = eoi + 1
            width = mcs + 1
    if s:
        emit(table[s])
    if emit_eoi:
        emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(payload):
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _mux_gif(w, h, palette, frames, bg=0, gct=True):
    """Hand-mux a GIF89a. `frames`: list of dicts with keys idx (2-D array
    of palette indices), x, y, interlace, transparent, disposal, delay,
    local_palette."""
    size_field = max((len(palette) - 1).bit_length() - 1, 0)
    n_entries = 2 << size_field
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h,
                       (0x80 | size_field) if gct else 0, bg, 0)
    if gct:
        pal = np.zeros((n_entries, 3), dtype=np.uint8)
        pal[: len(palette)] = palette
        out += pal.tobytes()
    for f in frames:
        idx = np.asarray(f["idx"], dtype=np.uint8)
        if f.get("transparent") is not None or f.get("disposal") or f.get("delay"):
            flags = (f.get("disposal", 0) & 7) << 2
            t = f.get("transparent")
            if t is not None:
                flags |= 1
            out += bytes([0x21, 0xF9, 4, flags])
            out += struct.pack("<H", f.get("delay", 0))
            out += bytes([t if t is not None else 0, 0])
        lp = f.get("local_palette")
        ipacked = 0x40 if f.get("interlace") else 0
        if lp is not None:
            lsz = max((len(lp) - 1).bit_length() - 1, 0)
            ipacked |= 0x80 | lsz
        out += b"\x2C" + struct.pack(
            "<HHHH", f.get("x", 0), f.get("y", 0), idx.shape[1], idx.shape[0]
        ) + bytes([ipacked])
        if lp is not None:
            lpal = np.zeros((2 << lsz, 3), dtype=np.uint8)
            lpal[: len(lp)] = lp
            out += lpal.tobytes()
        rows = idx
        if f.get("interlace"):  # serialize rows in pass order
            rows = np.concatenate(
                [idx[s::st] for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))]
            )
        ncolors = len(lp) if lp is not None else n_entries
        mcs = max((ncolors - 1).bit_length(), 2)
        payload = _lzw_encode(
            mcs, rows.tobytes(),
            clear_every=f.get("clear_every"),
            emit_eoi=f.get("emit_eoi", True),
        )
        out += bytes([mcs]) + _sub_blocks(payload)
    out += b"\x3B"
    return bytes(out)


_PAL8 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
         (0, 255, 255), (255, 0, 255), (20, 30, 40), (200, 100, 50)]


def _rand_idx(h, w, ncolors, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, ncolors, size=(h, w), dtype=np.uint8)


class TestGifLzwRoundtrip:
    def test_small_known_pixels(self):
        idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
        out = gc.gif_decode(_mux_gif(3, 2, _PAL8[:4], [dict(idx=idx)]))
        assert (out == np.array(_PAL8[:4], dtype=np.uint8)[idx]).all()

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_images_exact(self, seed):
        idx = _rand_idx(40, 53, 8, seed)
        out = gc.gif_decode(_mux_gif(53, 40, _PAL8, [dict(idx=idx)]))
        assert (out == np.array(_PAL8, dtype=np.uint8)[idx]).all()

    def test_width_growth_past_11_bits(self):
        # 120x120 random over 8 colors creates thousands of dictionary
        # entries → code width walks 4..12; any width-bump desync corrupts
        idx = _rand_idx(120, 120, 8, 99)
        out = gc.gif_decode(_mux_gif(120, 120, _PAL8, [dict(idx=idx)]))
        assert (out == np.array(_PAL8, dtype=np.uint8)[idx]).all()

    def test_kwkwk_runs(self):
        idx = np.zeros((4, 19), dtype=np.uint8)  # long single-color runs
        idx[2:, :] = 1
        out = gc.gif_decode(_mux_gif(19, 4, _PAL8[:2], [dict(idx=idx)]))
        assert (out == np.array(_PAL8[:2], dtype=np.uint8)[idx]).all()

    def test_mid_stream_clear_codes(self):
        idx = _rand_idx(30, 30, 8, 5)
        data = _mux_gif(30, 30, _PAL8, [dict(idx=idx, clear_every=40)])
        assert (gc.gif_decode(data)
                == np.array(_PAL8, dtype=np.uint8)[idx]).all()

    def test_missing_eoi_tolerated(self):
        idx = _rand_idx(16, 16, 4, 7)
        data = _mux_gif(16, 16, _PAL8[:4], [dict(idx=idx, emit_eoi=False)])
        assert (gc.gif_decode(data)
                == np.array(_PAL8[:4], dtype=np.uint8)[idx]).all()

    def test_interlaced(self):
        idx = _rand_idx(13, 9, 8, 3)  # odd height exercises pass bounds
        data = _mux_gif(9, 13, _PAL8, [dict(idx=idx, interlace=True)])
        assert (gc.gif_decode(data)
                == np.array(_PAL8, dtype=np.uint8)[idx]).all()


class TestGifAnimation:
    def test_compose_transparency_and_disposal(self):
        pal = np.array(_PAL8, dtype=np.uint8)
        base = np.zeros((6, 6), dtype=np.uint8)  # all red
        # frame 2: 2x2 patch at (2,1) with transparent holes, disposal 2
        patch = np.array([[1, 7], [7, 2]], dtype=np.uint8)
        frames = [
            dict(idx=base),
            dict(idx=patch, x=2, y=1, transparent=7, disposal=2, delay=4),
            dict(idx=np.full((1, 1), 3, dtype=np.uint8), x=5, y=5, delay=4),
        ]
        out, delays = gc.gif_decode_frames(_mux_gif(6, 6, _PAL8, frames, bg=6))
        assert out.shape == (3, 6, 6, 3)
        assert delays == [0, 4, 4]
        # frame 1: all red
        assert (out[0] == pal[0]).all()
        # frame 2: patch composited, transparent cells keep frame-1 red
        assert (out[1][1, 2] == pal[1]).all() and (out[1][2, 3] == pal[2]).all()
        assert (out[1][1, 3] == pal[0]).all() and (out[1][2, 2] == pal[0]).all()
        # frame 3: disposal-2 restored the patch RECT to background color 6
        assert (out[2][1:3, 2:4] == pal[6]).all()
        assert (out[2][5, 5] == pal[3]).all()
        assert (out[2][0, 0] == pal[0]).all()  # outside rect untouched

    def test_disposal_restore_previous(self):
        pal = np.array(_PAL8, dtype=np.uint8)
        frames = [
            dict(idx=np.full((4, 4), 2, dtype=np.uint8)),
            dict(idx=np.full((2, 2), 5, dtype=np.uint8), x=1, y=1,
                 disposal=3, delay=1),
            dict(idx=np.full((1, 1), 1, dtype=np.uint8), delay=1),
        ]
        out, _ = gc.gif_decode_frames(_mux_gif(4, 4, _PAL8, frames))
        assert (out[1][1:3, 1:3] == pal[5]).all()
        # frame 3 starts from the PRE-frame-2 canvas (disposal 3)
        assert (out[2][1:3, 1:3] == pal[2]).all()
        assert (out[2][0, 0] == pal[1]).all()

    def test_local_palette_overrides_global(self):
        lp = [(9, 9, 9), (250, 240, 230)]
        idx = np.array([[0, 1]], dtype=np.uint8)
        out = gc.gif_decode(_mux_gif(2, 1, _PAL8, [dict(idx=idx, local_palette=lp)]))
        assert (out == np.array(lp, dtype=np.uint8)[idx]).all()

    def test_video_adapter_luma_and_fps(self):
        frames = [
            dict(idx=np.full((2, 2), 0, dtype=np.uint8), delay=5),
            dict(idx=np.full((2, 2), 1, dtype=np.uint8), delay=5),
        ]
        luma, num, den = decode_video(_mux_gif(2, 2, _PAL8, frames))
        assert luma.shape == (2, 2, 2)
        # BT.601 of pure red (255,0,0) = round(299*255/1000) = 76
        assert (luma[0] == 76).all()
        # pure green (0,255,0) = round(587*255/1000) = 150
        assert (luma[1] == 150).all()
        assert (num, den) == (100, 5)  # 20 fps from 5 cs delays

    def test_video_adapter_default_fps(self):
        luma, num, den = decode_video(
            _mux_gif(2, 2, _PAL8, [dict(idx=np.zeros((2, 2), dtype=np.uint8))]))
        assert (num, den) == (10, 1)


class TestGifErrors:
    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            gc.gif_decode(b"NOTGIF" + b"\x00" * 20)

    def test_truncated_raises_valueerror_via_decode_image(self):
        idx = _rand_idx(10, 10, 8, 1)
        data = _mux_gif(10, 10, _PAL8, [dict(idx=idx)])
        for cut in (8, 20, len(data) // 2, len(data) - 2):
            with pytest.raises(ValueError):
                ic.decode_image(data[:cut])

    def test_frame_rect_outside_canvas(self):
        data = _mux_gif(4, 4, _PAL8,
                        [dict(idx=np.zeros((3, 3), dtype=np.uint8), x=2, y=2)])
        with pytest.raises(ValueError, match="outside logical screen"):
            gc.gif_decode(data)

    def test_index_beyond_palette(self):
        # 2-entry palette but a pixel index of 3
        idx = np.array([[0, 3]], dtype=np.uint8)
        data = _mux_gif(2, 1, _PAL8[:2], [dict(idx=idx)])
        with pytest.raises(ValueError, match="beyond color table"):
            gc.gif_decode(data)

    def test_no_frames(self):
        data = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3B"
        with pytest.raises(ValueError, match="no image data"):
            gc.gif_decode(data)


class TestGifRealFiles:
    """Real GIFs written by real encoders (tk, web tooling). Dimensions are
    cross-checked against the file's own logical-screen descriptor parsed
    HERE (not via the production parser), and every decoded pixel must be
    a member of the file's declared palette."""

    FILES = [
        "/usr/share/tcltk/tk8.6/images/logo64.gif",
        "/usr/share/tcltk/tk8.6/images/pwrdLogo150.gif",
        "/usr/share/tcltk/tk8.6/images/tai-ku.gif",
        "/usr/share/doc/libxslt1-dev/html/Libxslt-Logo-180x168.gif",
        "/usr/share/doc/libxslt1-dev/html/redhat.gif",
    ]

    @pytest.mark.parametrize("path", FILES)
    def test_decode_matches_header_and_palette(self, path):
        import os
        if not os.path.exists(path):
            pytest.skip(f"container file {path} not present")
        data = open(path, "rb").read()
        w, h, packed = struct.unpack("<HHB", data[6:11])
        out = ic.decode_image(data)  # via the dispatch seam
        assert out.shape == (h, w, 3)
        if packed & 0x80:  # global color table → pixel membership check
            n = 2 << (packed & 7)
            pal = {tuple(c) for c in
                   np.frombuffer(data[13:13 + 3 * n],
                                 dtype=np.uint8).reshape(n, 3)}
            got = {tuple(c) for c in np.unique(out.reshape(-1, 3), axis=0)}
            # transparent pixels show the background entry, still in-palette
            assert got <= pal

    def test_animated_real_file_if_present(self):
        import glob
        # /root/.pyenv/install_local_python.gif is a 783-frame screen
        # recording — the heaviest real animation in the container
        candidates = (sorted(glob.glob("/root/.pyenv/*.gif"))
                      + sorted(glob.glob("/usr/share/**/*.gif",
                                         recursive=True)))
        for path in candidates:
            try:
                frames, _ = gc.gif_decode_frames(open(path, "rb").read())
            except ValueError:
                continue
            if frames.shape[0] > 1:
                assert frames.ndim == 4 and frames.shape[3] == 3
                return
        pytest.skip("no decodable multi-frame GIF in container")
