"""Deterministic fuzz of decode_image's error contract: any mutation of a
valid payload must either decode or raise ValueError — no other exception
class may escape the seam. (The per-row multimodal UDFs catch Exception so
a batch is never poisoned, but direct callers — verify_scan's PSNR path,
user code — rely on the documented ValueError contract; an uncaught
KeyError/TypeError would also make the UDF fallback indistinguishable from
a codec bug.) Seeds cover all nine container families; mutations are
truncation, 1-4 byte flips, and magic-prefixed garbage, all from a fixed
RNG so a failure is reproducible."""

import zlib

import numpy as np
import pytest

from olake_spark.functions.imagecodec import decode_image, png_encode
from olake_spark.functions.jpegcodec import jpeg_encode
from olake_spark.functions.webpcodec import webp_encode

from test_bmpcodec import _mux_bmp
from test_gifcodec import _mux_gif
from test_icocodec import _mux_ico
from test_tiffcodec import _mux_tiff

_rng = np.random.default_rng(20260819)
_ARR = _rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
_GRAY = _ARR.mean(axis=2).astype(np.uint8)


def _pad4(row: bytes) -> bytes:
    return row + b"\x00" * ((-len(row)) % 4)


def _seeds() -> dict[str, bytes]:
    bgr_rows = b"".join(
        _pad4(bytes(_ARR[y][:, ::-1].reshape(-1))) for y in range(23, -1, -1)
    )
    png = png_encode(_ARR)
    return {
        "png": png,
        "jpeg": jpeg_encode(_ARR, quality=80),
        "webp": webp_encode(_ARR),
        "bmp": _mux_bmp(31, 24, 24, bgr_rows),
        "tiff": _mux_tiff("<", 31, 24, 1, [_GRAY.tobytes()]),
        "gif": _mux_gif(31, 24, [(i, i, i) for i in range(256)],
                        [{"idx": _GRAY}]),
        "pgm": b"P5\n31 24\n255\n" + _GRAY.tobytes(),
        "ppm": (b"P3\n4 3\n255\n"
                + " ".join(str(v) for v in _ARR[:3, :4].reshape(-1)).encode()),
        "ico": _mux_ico([(31, 24, 24, png)]),
    }


def _assert_contract(data: bytes, ctx: str) -> None:
    try:
        decode_image(data)
    except ValueError:
        pass
    except Exception as exc:  # noqa: BLE001 — the point of the test
        pytest.fail(
            f"{ctx}: {type(exc).__name__} escaped the ValueError seam: {exc!r}"
        )


@pytest.mark.parametrize("family", sorted(_seeds()))
def test_mutations_keep_valueerror_contract(family):
    seed = _seeds()[family]
    # the unmutated seed must decode (else the fuzz below proves nothing)
    decode_image(seed)
    # zlib.crc32, not hash(): str hashing is salted per process, and a
    # fuzz failure must reproduce under the same seed
    rng = np.random.default_rng(zlib.crc32(family.encode()))
    for i in range(25):  # truncations
        cut = int(rng.integers(0, len(seed)))
        _assert_contract(seed[:cut], f"{family} truncate@{cut}")
    for i in range(60):  # 1-4 byte flips
        b = bytearray(seed)
        for _ in range(int(rng.integers(1, 5))):
            p = int(rng.integers(0, len(b)))
            b[p] ^= int(rng.integers(1, 256))
        _assert_contract(bytes(b), f"{family} flip#{i}")
    for i in range(12):  # magic-prefixed garbage tail
        keep = int(rng.integers(8, min(64, len(seed))))
        tail = bytes(rng.integers(0, 256, int(rng.integers(0, 200)),
                                  dtype=np.uint8).tolist())
        _assert_contract(seed[:keep] + tail, f"{family} garbage#{i}")
