"""MJPEG-in-AVI video container codec — pure stdlib/numpy, no ffmpeg.

Closes the compressed-video seam left by ``videocodec.py`` (Y4M is
uncompressed): AVI is a RIFF container (public Microsoft format, the RIFF
chunk grammar and AVIMAINHEADER/AVISTREAMHEADER/BITMAPINFOHEADER layouts are
documented in the public Windows SDK headers and the OpenDML AVI spec), and
MJPEG stores each frame as an independent baseline JPEG — which
``jpegcodec.py`` already encodes and decodes in full. Together they make a
real compressed video format this engine can both read and write with zero
native dependencies.

Encoder (``encode_mjpeg_avi``): RIFF('AVI ') → LIST('hdrl': 'avih' main
header + LIST('strl': 'strh' vids/MJPG + 'strf' BITMAPINFOHEADER)) →
LIST('movi': one '00dc' chunk per frame, each a spec-compliant baseline
JPEG, word-aligned) → 'idx1' index. Any ffmpeg/VLC-class consumer reads the
output.

Decoder (``decode_mjpeg_avi``): tolerant RIFF walk — locates LIST('movi'),
recurses into LIST('rec ') groupings, accepts '00dc'/'00db' frame chunks
(and any '..dc/..db' stream number), ignores 'idx1'/'JUNK', takes fps from
'strh' dwRate/dwScale when present, falling back to 'avih'
dwMicroSecPerFrame. Frames decode through ``jpegcodec.jpeg_decode``;
``luma_only=True`` returns the JPEG's coded Y plane directly (no RGB
roundtrip), which is what the frame-stats kernel consumes.

The reference treats media payloads as opaque binary columns end-to-end
(types.go DataTypeBytes); this module is consumer-side capability, placed —
like the JPEG/PNG/WAV/Y4M codecs — inside mapInPandas kernels where one
Python worker handles an Arrow batch of payloads (entropy coding is
inherently per-stream sequential; the engine's parallelism is across rows,
not within one).
"""

from __future__ import annotations

import struct

import numpy as np

from olake_spark.functions.jpegcodec import jpeg_decode, jpeg_encode

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    """RIFF chunk: fourcc + size + body, padded to word alignment."""
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_mjpeg_avi(
    frames: "np.ndarray",
    fps_num: int = 30,
    fps_den: int = 1,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """uint8 RGB frames (n, h, w, 3) → MJPEG AVI bytes.

    Every frame becomes an independent baseline JPEG ('00dc' chunk), so the
    stream is all-keyframes — the property that makes MJPEG the standard
    archival/intermediate format and every frame random-accessible.
    ``subsampling`` passes through to :func:`jpegcodec.jpeg_encode`
    ("444" full chroma, "420" for libjpeg-default half-rate chroma).
    """
    f = np.asarray(frames)
    if f.dtype != np.uint8 or f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("encode_mjpeg_avi wants (n, h, w, 3) uint8 frames")
    n, h, w = f.shape[:3]
    if n == 0 or h == 0 or w == 0:
        raise ValueError("encode_mjpeg_avi: empty frame stack")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("fps must be a positive rational")

    payloads = [jpeg_encode(f[i], quality, subsampling) for i in range(n)]
    max_len = max(len(p) for p in payloads)

    # AVIMAINHEADER (56 bytes): rate as integer microseconds per frame
    usec = (1_000_000 * fps_den) // fps_num
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec,                      # dwMicroSecPerFrame
        max_len * fps_num // max(fps_den, 1),  # dwMaxBytesPerSec (advisory)
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_len,                   # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                # dwReserved
    )
    # AVISTREAMHEADER (56 bytes): exact rational rate dwRate/dwScale
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0,                         # dwFlags
        0, 0,                      # wPriority, wLanguage
        0,                         # dwInitialFrames
        fps_den, fps_num,          # dwScale, dwRate → rate = dwRate/dwScale
        0,                         # dwStart
        n,                         # dwLength (frames)
        max_len,                   # dwSuggestedBufferSize
        0xFFFFFFFF,                # dwQuality: -1 = driver default
        0,                         # dwSampleSize: 0 = variable (one frame/chunk)
        0, 0, w, h,                # rcFrame
    )
    # BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = bytearray()
    idx = bytearray()
    for p in payloads:
        # idx1 offsets are from the 'movi' fourcc (offset 4 = first chunk)
        idx += struct.pack(
            "<4sIII", b"00dc", _AVIIF_KEYFRAME, 4 + len(movi_body), len(p)
        )
        movi_body += _chunk(b"00dc", p)
    movi = _list(b"movi", bytes(movi_body))

    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk_movi(data: bytes, pos: int, end: int, payloads: list,
               stream: bytes) -> None:
    """Collect the target stream's 'NNdc'/'NNdb' chunk payloads, recursing
    into LIST('rec ') groupings. Chunks of OTHER streams (a second video,
    audio 'NNwb', subtitles) are skipped, not fed to the JPEG decoder."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = pos + 8
        if fourcc == b"LIST" and data[body:body + 4] == b"rec ":
            _walk_movi(data, body + 4, body + size, payloads, stream)
        elif (fourcc[:2] == stream and fourcc[2:4] in (b"dc", b"db")
                and size):
            payloads.append(data[body:body + size])
        pos = body + size + (size & 1)


def decode_mjpeg_avi(data: bytes, luma_only: bool = False):
    """MJPEG AVI bytes → (frames, fps_num, fps_den).

    frames is (n, h, w, 3) uint8 RGB, or (n, h, w) coded-luma planes when
    ``luma_only`` (no YCbCr→RGB roundtrip — exact and ~3× less work, the
    frame-stats path). Frames with dimensions differing from the first are
    rejected (one stream = one raster in AVI).

    Reads the FIRST 'vids' stream (stream number = that strh's position in
    strl order, per the AVI stream-numbering rule), ignoring audio/text/
    secondary-video chunks; frames in OpenDML 'RIFF AVIX' extension chunks
    (how muxers exceed the 32-bit first-RIFF limit on >1 GB files) are
    included — the walk covers every top-level RIFF, not just the first.
    """
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")

    fps_num, fps_den = 0, 0
    usec_per_frame = 0
    strh_types: list[bytes] = []   # fccType per stream, in strl order
    movi_spans: list[tuple] = []   # movi LIST bodies, in document order

    def walk(pos: int, lim: int) -> None:
        nonlocal fps_num, fps_den, usec_per_frame
        while pos + 8 <= lim:
            fourcc = data[pos:pos + 4]
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            body = pos + 8
            if fourcc == b"LIST":
                kind = data[body:body + 4]
                if kind == b"movi":
                    movi_spans.append((body + 4, min(body + size, lim)))
                else:  # hdrl / strl / odml — descend, keeping doc order
                    walk(body + 4, min(body + size, lim))
            elif fourcc == b"avih" and size >= 4:
                usec_per_frame = struct.unpack("<I", data[body:body + 4])[0]
            elif fourcc == b"strh" and size >= 32:
                fcc_type = data[body:body + 4]
                strh_types.append(fcc_type)
                if fcc_type == b"vids" and not fps_num:
                    scale, rate = struct.unpack(
                        "<II", data[body + 20:body + 28]
                    )
                    if rate and scale:
                        fps_num, fps_den = rate, scale
            pos = body + size + (size & 1)

    # every top-level RIFF: the primary 'AVI ' plus OpenDML 'AVIX' extensions
    try:
        pos = 0
        while pos + 12 <= len(data):
            if data[pos:pos + 4] != b"RIFF" or \
                    data[pos + 8:pos + 12] not in (b"AVI ", b"AVIX"):
                break
            size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
            walk(pos + 12, min(pos + 8 + size, len(data)))
            pos = pos + 8 + size + (size & 1)
    except struct.error as exc:
        # a chunk header promised bytes the stream doesn't have (the walk
        # guards cover the fourcc+size reads; header BODIES near a truncated
        # EOF can still come up short inside avih/strh field unpacks)
        raise ValueError(f"truncated or corrupt AVI stream ({exc})") from None

    vids = next(
        (i for i, t in enumerate(strh_types) if t == b"vids"), 0
    )
    stream = b"%02d" % vids
    payloads: list[bytes] = []
    for s, e in movi_spans:
        _walk_movi(data, s, e, payloads, stream)
    if not payloads:
        raise ValueError("AVI stream has no video frame chunks")
    if not fps_num:  # no vids strh — fall back to the main header
        if usec_per_frame:
            fps_num, fps_den = 1_000_000, usec_per_frame
        else:
            fps_num, fps_den = 30, 1
    frames = [jpeg_decode(p, luma_only=luma_only) for p in payloads]
    shape = frames[0].shape
    if any(f.shape != shape for f in frames):
        raise ValueError("AVI video frames change dimensions mid-stream")
    return np.stack(frames), fps_num, fps_den
