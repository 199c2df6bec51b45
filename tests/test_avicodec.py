"""MJPEG-in-AVI container codec: roundtrip quality, RIFF structural
validation by an INDEPENDENT from-scratch chunk walker written here (the
production decoder is never the only reader of a stream it claims to
understand — the same pattern as test_jpegcodec / test_avro_independent),
idx1 index consistency, decoder tolerance (rec-grouped movi, missing idx1,
avih-only fps), and the Spark route through multimodal.sample_frames."""

import struct

import numpy as np
import pytest

from olake_spark.functions.avicodec import decode_mjpeg_avi, encode_mjpeg_avi
from olake_spark.functions.jpegcodec import jpeg_decode
from olake_spark.functions.videocodec import decode_video, encode_y4m


def _frames(n=6, h=32, w=48, seed=5):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    out = np.stack([
        np.stack(
            [(xx * 3 + f * 11) % 256, (yy * 5 + f * 7) % 256,
             ((xx + yy) * 2 + f) % 256],
            axis=-1,
        )
        for f in range(n)
    ]).astype(np.uint8)
    return out


def _psnr(a, b):
    mse = float(np.mean((a.astype(float) - b.astype(float)) ** 2))
    return float("inf") if mse == 0 else 10 * np.log10(255.0**2 / mse)


# --------------------------------------------- independent RIFF walker


def walk_riff(data: bytes):
    """From-scratch flat RIFF parse: list of (path, fourcc, offset, body)
    tuples, structured deliberately unlike the production decoder (it
    returns the whole tree; the decoder streams with an explicit stack)."""
    assert data[:4] == b"RIFF"
    total = struct.unpack("<I", data[4:8])[0]
    assert 8 + total == len(data), "RIFF size must cover the whole file"
    assert data[8:12] == b"AVI "
    out = []

    def rec(path, pos, end):
        while pos < end:
            assert pos + 8 <= end, f"dangling bytes at {pos}"
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = pos + 8
            assert body + size <= end, f"chunk {fourcc} overruns parent"
            if fourcc == b"LIST":
                kind = data[body:body + 4]
                out.append((path, b"LIST:" + kind, pos, b""))
                rec(path + [kind.decode()], body + 4, body + size)
            else:
                out.append((path, fourcc, pos, data[body:body + size]))
            pos = body + size + (size & 1)
        assert pos == end or pos == end + 1  # final pad byte allowed

    rec([], 12, 8 + total)
    return out


class TestEncodedStructure:
    def test_independent_walker_validates_layout(self):
        frames = _frames()
        data = encode_mjpeg_avi(frames, 24, 1, quality=90)
        chunks = walk_riff(data)
        kinds = [(tuple(p), f) for p, f, _, _ in chunks]
        # required spine, in order
        assert kinds[0] == ((), b"LIST:hdrl")
        assert (("hdrl",), b"avih") in kinds
        assert (("hdrl",), b"LIST:strl") in kinds
        assert (("hdrl", "strl"), b"strh") in kinds
        assert (("hdrl", "strl"), b"strf") in kinds
        assert ((), b"LIST:movi") in kinds
        assert ((), b"idx1") in kinds

        avih = next(b for p, f, _, b in chunks if f == b"avih")
        assert len(avih) == 56
        usec, _, _, flags, total_frames = struct.unpack("<IIIII", avih[:20])
        assert total_frames == len(frames)
        assert usec == 1_000_000 // 24
        assert flags & 0x10  # AVIF_HASINDEX

        strh = next(b for p, f, _, b in chunks if f == b"strh")
        assert strh[:4] == b"vids" and strh[4:8] == b"MJPG"
        scale, rate = struct.unpack("<II", strh[20:28])
        assert (rate, scale) == (24, 1)

        strf = next(b for p, f, _, b in chunks if f == b"strf")
        bisize, w, h = struct.unpack("<Iii", strf[:12])
        assert (bisize, w, h) == (40, 48, 32)
        assert strf[16:20] == b"MJPG"

        dcs = [b for p, f, _, b in chunks if f == b"00dc"]
        assert len(dcs) == len(frames)
        for i, payload in enumerate(dcs):
            # every frame chunk is a standalone baseline JPEG
            assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
            assert _psnr(frames[i], jpeg_decode(payload)) >= 40

    def test_idx1_offsets_point_at_their_chunks(self):
        data = encode_mjpeg_avi(_frames(4), 30, 1)
        chunks = walk_riff(data)
        movi_pos = next(o for p, f, o, _ in chunks if f == b"LIST:movi")
        # idx1 offsets are relative to the 'movi' fourcc (at movi_pos + 8)
        base = movi_pos + 8
        idx = next(b for p, f, _, b in chunks if f == b"idx1")
        assert len(idx) % 16 == 0 and len(idx) // 16 == 4
        for i in range(4):
            ck, flags, off, ln = struct.unpack_from("<4sIII", idx, 16 * i)
            assert ck == b"00dc" and flags == 0x10
            assert data[base + off:base + off + 4] == b"00dc"
            got_ln = struct.unpack(
                "<I", data[base + off + 4:base + off + 8]
            )[0]
            assert got_ln == ln

    def test_word_alignment_of_odd_chunks(self):
        # JPEG payloads are arbitrary-length; the walker's overrun asserts
        # fail if any chunk is unpadded. Vary content so sizes vary.
        for seed in range(3):
            rng = np.random.default_rng(seed)
            f = rng.integers(0, 256, (3, 24, 24, 3)).astype(np.uint8)
            walk_riff(encode_mjpeg_avi(f, 30, 1, quality=40 + seed * 17))


class TestRoundTrip:
    def test_rgb_roundtrip_quality_and_fps(self):
        frames = _frames(7)
        out, fn, fd = decode_mjpeg_avi(encode_mjpeg_avi(frames, 24000, 1001, 92))
        assert out.shape == frames.shape and out.dtype == np.uint8
        assert (fn, fd) == (24000, 1001)  # exact rational, not µs-rounded
        assert _psnr(frames, out) >= 42

    def test_luma_only_matches_coded_plane(self):
        frames = _frames(3)
        data = encode_mjpeg_avi(frames, 30, 1, 90)
        luma, _, _ = decode_mjpeg_avi(data, luma_only=True)
        assert luma.shape == frames.shape[:3]
        # must equal the per-frame JPEG coded-Y decode exactly
        dcs = [b for p, f, _, b in walk_riff(data) if f == b"00dc"]
        for i, payload in enumerate(dcs):
            assert (luma[i] == jpeg_decode(payload, luma_only=True)).all()

    def test_deterministic_bytes(self):
        f = _frames(2)
        assert encode_mjpeg_avi(f, 30, 1, 85) == encode_mjpeg_avi(f, 30, 1, 85)

    def test_420_subsampled_stream(self):
        frames = _frames(4, h=48, w=64)
        b420 = encode_mjpeg_avi(frames, 30, 1, 88, subsampling="420")
        b444 = encode_mjpeg_avi(frames, 30, 1, 88)
        assert len(b420) < len(b444)
        out, fn, fd = decode_mjpeg_avi(b420)
        assert out.shape == frames.shape and (fn, fd) == (30, 1)
        # this fixture's chroma carries full-rate gradients, so 2x2
        # averaging costs real chroma fidelity (that IS 4:2:0); the loss
        # must be chroma-CONFINED: luma stays near-lossless
        assert _psnr(frames, out) >= 29

        def luma(a):
            a = a.astype(np.float64)
            return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

        mse = float(np.mean((luma(frames) - luma(out)) ** 2))
        assert 10 * np.log10(255.0**2 / mse) >= 45

    def test_input_validation(self):
        with pytest.raises(ValueError):
            encode_mjpeg_avi(np.zeros((0, 8, 8, 3), np.uint8), 30, 1)
        with pytest.raises(ValueError):
            encode_mjpeg_avi(np.zeros((2, 8, 8), np.uint8), 30, 1)
        with pytest.raises(ValueError):
            encode_mjpeg_avi(_frames(1), 0, 1)
        with pytest.raises(ValueError):
            decode_mjpeg_avi(b"RIFF\x00\x00\x00\x00WAVE")

    def test_truncation_raises_valueerror_everywhere(self):
        # cutting the stream at ANY byte must surface as ValueError (or, in
        # the tail, still decode — idx1 is expendable), never a raw
        # struct.error/IndexError from a header-body unpack
        data = encode_mjpeg_avi(_frames(2), 30, 1, 85)
        avih = data.find(b"avih")
        strh = data.find(b"strh")
        cuts = [avih + 8, avih + 10, strh + 9, len(data) // 3, len(data) // 2]
        for cut in cuts:
            try:
                decode_mjpeg_avi(data[:cut])
            except ValueError:
                pass  # the contract
        # truncating only the trailing idx1 index still decodes in full
        idx1 = data.rfind(b"idx1")
        out, fn, fd = decode_mjpeg_avi(data[:idx1])
        assert out.shape[0] == 2 and (fn, fd) == (30, 1)


class TestDecoderTolerance:
    def test_rec_grouped_movi_and_missing_idx1(self):
        """Some muxers group movi chunks under LIST('rec ') and omit idx1;
        the decoder must read both shapes."""
        frames = _frames(4)
        data = encode_mjpeg_avi(frames, 30, 1, 90)
        chunks = walk_riff(data)
        hdrl_pos = next(o for p, f, o, _ in chunks if f == b"LIST:hdrl")
        hdrl_sz = struct.unpack("<I", data[hdrl_pos + 4:hdrl_pos + 8])[0]
        hdrl = data[hdrl_pos:hdrl_pos + 8 + hdrl_sz]
        dcs = [b for p, f, _, b in chunks if f == b"00dc"]

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        recs = b"".join(
            chunk(b"LIST", b"rec " + chunk(b"00dc", d)) for d in dcs
        )
        movi = chunk(b"LIST", b"movi" + recs)
        body = b"AVI " + hdrl + movi  # no idx1
        rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
        out, fn, fd = decode_mjpeg_avi(rebuilt)
        base, _, _ = decode_mjpeg_avi(data)
        assert (out == base).all() and (fn, fd) == (30, 1)

    def test_fps_falls_back_to_avih(self):
        """A stream with no vids strh still gets fps from the main header."""
        frames = _frames(2)
        data = encode_mjpeg_avi(frames, 25, 1, 90)
        # surgically blank the strh fccType so the decoder ignores it
        pos = data.find(b"strh")
        assert pos > 0
        data = data[:pos + 8] + b"xxxx" + data[pos + 12:]
        out, fn, fd = decode_mjpeg_avi(data)
        assert out.shape == frames.shape
        assert (fn, fd) == (1_000_000, 1_000_000 // 25)

    def test_second_stream_chunks_are_not_fed_to_the_jpeg_decoder(self):
        """A two-stream AVI (audio stream 00 + MJPEG vids stream 01): the
        decoder must read ONLY the vids stream's '01dc' chunks and skip the
        '00wb' audio payloads instead of crashing on them."""
        frames = _frames(3)
        base = encode_mjpeg_avi(frames, 30, 1, 90)
        chunks = walk_riff(base)
        avih = next(b for p, f, _, b in chunks if f == b"avih")
        strh_vids = next(b for p, f, _, b in chunks if f == b"strh")
        strf_vids = next(b for p, f, _, b in chunks if f == b"strf")
        dcs = [b for p, f, _, b in chunks if f == b"00dc"]

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        def lst(kind, body):
            return chunk(b"LIST", kind + body)

        strh_auds = b"auds" + b"\x00" * 52
        strl_a = lst(b"strl", chunk(b"strh", strh_auds)
                     + chunk(b"strf", b"\x00" * 16))
        strl_v = lst(b"strl", chunk(b"strh", strh_vids)
                     + chunk(b"strf", strf_vids))
        hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl_a + strl_v)
        movi_body = b""
        for i, d in enumerate(dcs):
            movi_body += chunk(b"00wb", b"\x11\x22\x33" * (40 + i))  # audio
            movi_body += chunk(b"01dc", d)                           # video
        body = b"AVI " + hdrl + lst(b"movi", movi_body)
        two_stream = b"RIFF" + struct.pack("<I", len(body)) + body

        out, fn, fd = decode_mjpeg_avi(two_stream)
        ref, _, _ = decode_mjpeg_avi(base)
        assert (out == ref).all() and (fn, fd) == (30, 1)

    def test_opendml_avix_extension_frames_are_included(self):
        """Frames stored in a trailing 'RIFF AVIX' extension (OpenDML, how
        muxers exceed the first RIFF's 32-bit limit) must be decoded, not
        silently dropped."""
        frames = _frames(4)
        full = encode_mjpeg_avi(frames, 30, 1, 90)
        dcs = [b for p, f, _, b in walk_riff(full) if f == b"00dc"]
        first = encode_mjpeg_avi(frames[:2], 30, 1, 90)

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        movi = chunk(
            b"LIST",
            b"movi" + chunk(b"00dc", dcs[2]) + chunk(b"00dc", dcs[3]),
        )
        avix = b"RIFF" + struct.pack("<I", 4 + len(movi)) + b"AVIX" + movi
        out, fn, fd = decode_mjpeg_avi(first + avix)
        ref, _, _ = decode_mjpeg_avi(full)
        assert out.shape[0] == 4
        assert (out == ref).all() and (fn, fd) == (30, 1)

    def test_dimension_change_rejected(self):
        a = encode_mjpeg_avi(_frames(2, h=32, w=48), 30, 1)
        b = encode_mjpeg_avi(_frames(2, h=16, w=16), 30, 1)
        dcs_a = [c for p, f, _, c in walk_riff(a) if f == b"00dc"]
        dcs_b = [c for p, f, _, c in walk_riff(b) if f == b"00dc"]
        chunks = walk_riff(a)
        hdrl_pos = next(o for p, f, o, _ in chunks if f == b"LIST:hdrl")
        hdrl_sz = struct.unpack("<I", a[hdrl_pos + 4:hdrl_pos + 8])[0]
        hdrl = a[hdrl_pos:hdrl_pos + 8 + hdrl_sz]

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) % 2 else b""
            return fourcc + struct.pack("<I", len(body)) + body + pad

        movi = chunk(
            b"LIST",
            b"movi" + chunk(b"00dc", dcs_a[0]) + chunk(b"00dc", dcs_b[0]),
        )
        body = b"AVI " + hdrl + movi
        bad = b"RIFF" + struct.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="dimensions"):
            decode_mjpeg_avi(bad)


class TestDispatchAndSpark:
    def test_decode_video_routes_both_containers(self):
        frames = _frames(3)
        avi = encode_mjpeg_avi(frames, 30, 1, 90)
        luma_avi, fn, fd = decode_video(avi)
        assert luma_avi.shape == frames.shape[:3] and (fn, fd) == (30, 1)
        y4m = encode_y4m(luma_avi, 30, 1)
        luma_y4m, _, _ = decode_video(y4m)
        assert (luma_y4m == luma_avi).all()
        with pytest.raises(ValueError, match="container"):
            decode_video(b"\x00" * 64)

    def test_sample_frames_over_mjpeg_avi(self, spark):
        """The Spark frame-stats kernel ingests MJPEG AVI payloads through
        the same mapInPandas path as Y4M, including the mixed case."""
        from olake_spark.operators import multimodal

        frames = _frames(8)
        avi = encode_mjpeg_avi(frames, 30, 1, 90)
        luma, _, _ = decode_video(avi)
        y4m = encode_y4m(luma, 30, 1)
        df = spark.createDataFrame(
            [("v-avi", bytearray(avi)), ("v-y4m", bytearray(y4m)),
             ("v-bad", bytearray(b"notvideo"))],
            "video_id string, bytes binary",
        )
        out = multimodal.sample_frames(df, every_n=3).orderBy(
            "video_id", "frame_idx"
        ).collect()
        by_vid = {}
        for r in out:
            by_vid.setdefault(r["video_id"], []).append(r)
        assert [r["frame_idx"] for r in by_vid["v-avi"]] == [0, 3, 6]
        assert not by_vid["v-bad"][0]["decode_ok"]
        # AVI and the Y4M re-encode of its luma must produce IDENTICAL stats
        for ra, ry in zip(by_vid["v-avi"], by_vid["v-y4m"]):
            assert ra["decode_ok"] and ry["decode_ok"]
            assert ra["mean_luma_milli"] == ry["mean_luma_milli"]
            assert (ra["w"], ra["h"]) == (ry["w"], ry["h"])
            assert bytes(ra["frame_png"]) == bytes(ry["frame_png"])
