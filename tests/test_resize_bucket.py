"""resize_to_bucket: the SDXL resize-to-cover + center-crop kernel over
bucketing.assign_aspect_buckets output. Pixel correctness is checked
against an independent test-side reimplementation (own scale/crop/NN
math), plus the corrupt-payload seam and the NULL-bucket exclusion."""

import numpy as np
import pytest

from olake_spark.functions.imagecodec import decode_image, encode_image
from olake_spark.operators.bucketing import (aspect_bucket_grid,
                                             assign_aspect_buckets)
from olake_spark.operators.multimodal import resize_to_bucket


def _img(w: int, h: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return encode_image(rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "png")


def _expected(arr: np.ndarray, bw: int, bh: int) -> tuple:
    """Independent reimplementation: cover-scale (ceil), center crop,
    nearest neighbor."""
    h, w = arr.shape[:2]
    import math
    if w * bh >= h * bw:
        ph, pw = bh, max(bw, math.ceil(w * bh / h))
    else:
        pw, ph = bw, max(bh, math.ceil(h * bw / w))
    x0, y0 = (pw - bw) // 2, (ph - bh) // 2
    out = np.empty((bh, bw, 3), dtype=arr.dtype)
    for j in range(bh):
        sy = min((y0 + j) * h // ph, h - 1)
        for i in range(bw):
            sx = min((x0 + i) * w // pw, w - 1)
            out[j, i] = arr[sy, sx]
    return out, x0, y0


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        ("wide", _img(200, 50, 1), 200, 50),     # 4:1 banner
        ("tall", _img(40, 160, 2), 40, 160),     # 1:4 portrait
        ("square", _img(64, 64, 3), 64, 64),
        ("exact", _img(512, 512, 4), 512, 512),  # already a bucket shape
        ("tiny", _img(3, 2, 5), 3, 2),           # upscale path
        ("corrupt", b"\x89PNG\r\n\x1a\nnope", 10, 10),
        ("nodims", _img(30, 30, 6), None, None),  # unassignable
    ]
    return spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int"
    )


@pytest.fixture(scope="module")
def resized(frame):
    assigned = assign_aspect_buckets(frame, aspect_bucket_grid())
    out = resize_to_bucket(assigned).collect()
    assigned_rows = {r["image_id"]: r for r in assigned.collect()}
    return {r["image_id"]: r for r in out}, assigned_rows


def test_null_bucket_rows_excluded(resized):
    out, _ = resized
    assert "nodims" not in out
    assert len(out) == 6


def test_corrupt_flagged_not_poisoning(resized):
    out, _ = resized
    r = out["corrupt"]
    assert r["decode_ok"] is False and r["bytes"] is None
    assert r["src_w"] is None and r["crop_x"] is None
    # the rest of the batch survived
    assert out["square"]["decode_ok"] is True


def test_output_dims_equal_bucket_and_pixels_exact(resized, frame):
    out, assigned = resized
    raws = {r["image_id"]: bytes(r["bytes"]) for r in frame.collect()
            if r["image_id"] not in ("corrupt", "nodims")}
    for iid, raw in raws.items():
        r = out[iid]
        bw, bh = assigned[iid]["bucket_w"], assigned[iid]["bucket_h"]
        assert (r["w"], r["h"]) == (bw, bh)
        got = decode_image(bytes(r["bytes"]))
        assert got.shape == (bh, bw, 3)
        want, x0, y0 = _expected(decode_image(raw), bw, bh)
        assert (got == want).all(), iid
        assert (r["crop_x"], r["crop_y"]) == (x0, y0)
        # decoded dims, never metadata
        src = decode_image(raw)
        assert (r["src_w"], r["src_h"]) == (src.shape[1], src.shape[0])


def test_cover_never_leaves_a_short_edge(resized):
    """The scaled frame covers the bucket: crop offsets are always >= 0
    (a negative offset would mean the scale left a gap)."""
    out, _ = resized
    for iid, r in out.items():
        if r["decode_ok"]:
            assert r["crop_x"] >= 0 and r["crop_y"] >= 0


def test_exact_bucket_shape_is_identity(resized, frame):
    """A 512x512 source in the 512x512 bucket: no scale, no crop —
    pixels pass through exactly."""
    out, assigned = resized
    assert (assigned["exact"]["bucket_w"], assigned["exact"]["bucket_h"]) \
        == (512, 512)
    r = out["exact"]
    assert (r["crop_x"], r["crop_y"]) == (0, 0)
    raw = {x["image_id"]: bytes(x["bytes"]) for x in frame.collect()}["exact"]
    assert (decode_image(bytes(r["bytes"])) == decode_image(raw)).all()
