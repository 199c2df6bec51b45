"""YUV4MPEG2 (Y4M) video codec — pure stdlib/numpy, no demuxer needed.

The container ships no ffmpeg, but Y4M needs none: the format (public, from
mjpegtools, spec mirrored in the ffmpeg and mplayer docs) is a plain ASCII
stream header followed by uncompressed planar frames:

    YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C<colorspace>\\n
    FRAME\\n <plane bytes> FRAME\\n <plane bytes> ...

This gives the video half of the multimodal layer a REAL container parser —
the same role functions/audiocodec.py (PCM WAV) plays for audio and
functions/imagecodec.py (PNG) plays for images. The reference treats media
payloads as opaque binary columns end-to-end (types.go DataTypeBytes); the
frame-sampling kernel is the Spark-side capability the reference leaves to
downstream consumers.

Scope: mono (Cmono, one luma plane) encode; mono + 4:2:0 / 4:2:2 / 4:4:4
decode returning the LUMA plane per frame (chroma is parsed and skipped —
frame statistics and perceptual features are luma-driven; plug a full YUV→RGB
conversion into the seam when color output is needed). Compressed codecs
(h264/vp9/av1) stay out of scope — plug a demuxer into `decode_y4m`'s seam
when the deployment image ships one.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"
# colorspace tag → bytes-per-frame as a fraction (num, den) of w*h
_CHROMA_SIZE = {
    "mono": (1, 1),
    "420": (3, 2), "420jpeg": (3, 2), "420mpeg2": (3, 2), "420paldv": (3, 2),
    "422": (2, 1),
    "444": (3, 1),
}


def encode_y4m(frames: "np.ndarray", fps_num: int = 30, fps_den: int = 1) -> bytes:
    """uint8 mono frames (n, h, w) → Y4M bytes (Cmono)."""
    f = np.asarray(frames)
    if f.dtype != np.uint8:
        raise ValueError(f"encode_y4m wants uint8 frames, got {f.dtype}")
    if f.ndim != 3:
        raise ValueError("encode_y4m wants (n_frames, h, w) mono frames")
    n, h, w = f.shape
    if n == 0 or h == 0 or w == 0:
        raise ValueError("encode_y4m: empty frame stack")
    head = f"YUV4MPEG2 W{w} H{h} F{int(fps_num)}:{int(fps_den)} Ip A1:1 Cmono\n"
    parts = [head.encode("ascii")]
    for i in range(n):
        parts.append(b"FRAME\n")
        parts.append(f[i].tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple["np.ndarray", int, int]:
    """Y4M bytes → (luma frames (n, h, w) uint8, fps_num, fps_den).

    Chroma planes (when present) are skipped; only the luma plane is
    returned per frame.
    """
    nl = data.find(b"\n")
    if nl < 0 or not data[:nl].startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps_num, fps_den = 30, 1
    cspace = "420jpeg"  # the spec's default when no C tag is present
    for tag in data[len(_MAGIC):nl].decode("ascii", "replace").split():
        if tag[0] == "W":
            w = int(tag[1:])
        elif tag[0] == "H":
            h = int(tag[1:])
        elif tag[0] == "F":
            a, b = tag[1:].split(":")
            fps_num, fps_den = int(a), int(b)
        elif tag[0] == "C":
            cspace = tag[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cspace not in _CHROMA_SIZE:
        raise ValueError(f"unsupported Y4M colorspace {cspace!r}")
    num, den = _CHROMA_SIZE[cspace]
    luma = w * h
    frame_bytes = luma * num // den
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad FRAME marker at byte {pos}")
        body = fnl + 1
        if body + frame_bytes > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=luma, offset=body)
            .reshape(h, w)
        )
        pos = body + frame_bytes
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return np.stack(frames), fps_num, fps_den


def decode_video(data: bytes) -> tuple["np.ndarray", int, int]:
    """Container dispatch: video bytes → (luma frames (n, h, w) uint8,
    fps_num, fps_den).

    Routes by magic — YUV4MPEG2 (uncompressed, this module) or RIFF/AVI
    MJPEG (compressed, functions/avicodec.py over the baseline JPEG codec).
    Both return per-frame luma: Y4M's stored Y plane, MJPEG's coded Y plane
    (jpeg_decode(luma_only=True), no RGB roundtrip). Every decode-bearing
    video kernel goes through this seam, so adding a container = one new
    branch here."""
    head = bytes(data[:12])
    if head.startswith(_MAGIC):
        return decode_y4m(data)
    if head[:4] == b"RIFF" and head[8:12] == b"AVI ":
        from olake_spark.functions.avicodec import decode_mjpeg_avi

        return decode_mjpeg_avi(data, luma_only=True)
    if head[:4] == b"GIF8":
        # animated GIF: composed frames -> BT.601 luma (functions/gifcodec.py)
        from olake_spark.functions.gifcodec import gif_decode_video

        return gif_decode_video(data)
    raise ValueError(
        "unrecognized video container (want Y4M, MJPEG AVI, or GIF)"
    )
