"""PCM WAV codec — stdlib `wave` + numpy, no external audio libs.

The container ships no libsndfile/ffmpeg, but PCM WAV needs neither: the
format is a RIFF header over raw little-endian PCM frames, which the
standard library reads and writes. This gives the audio half of the
multimodal layer a REAL codec (the reference treats audio as opaque binary
payloads the same way it treats images; this is the same role
functions/imagecodec.py plays for images). Compressed codecs (mp3/opus/aac)
stay out of scope — plug a decoder into `decode_wav`'s seam when the
deployment image ships one.

Mono int16 only: the deterministic synthetic fixtures are mono, and the
feature kernel averages channels anyway; multi-channel raises rather than
silently mixing.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: "np.ndarray", sample_rate: int) -> bytes:
    """int16 mono samples → PCM WAV bytes."""
    s = np.asarray(samples)
    if s.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16 samples, got {s.dtype}")
    if s.ndim != 1:
        raise ValueError("encode_wav is mono: pass a 1-D array")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple["np.ndarray", int]:
    """PCM WAV bytes → (int16 mono samples, sample_rate).

    Error contract: malformed or truncated streams raise ValueError (the
    stdlib parser's wave.Error/EOFError are translated), matching the
    image/video codecs."""
    try:
        return _decode_wav_impl(data)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"truncated or corrupt WAV stream ({exc})") from None


def _decode_wav_impl(data: bytes) -> tuple["np.ndarray", int]:
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getnchannels() != 1:
            raise ValueError(
                f"decode_wav is mono-only, got {w.getnchannels()} channels"
            )
        if w.getsampwidth() != 2:
            raise ValueError(
                f"decode_wav wants 16-bit PCM, got {8 * w.getsampwidth()}-bit"
            )
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2"), sr
