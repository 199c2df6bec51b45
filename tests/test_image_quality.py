"""Image quality curation (operators/multimodal.py image_quality_*):
measured-not-trusted dimensions, per-rule flags, flat-image detection,
corrupt-payload contract, and the Catalyst-only rules stage."""

import numpy as np
import pytest

from olake_spark.functions.imagecodec import encode_image
from olake_spark.operators.multimodal import (image_quality,
                                              image_quality_rules,
                                              image_quality_stats)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _img(w, h, solid=None, seed=0):
    if solid is not None:
        arr = np.full((h, w, 3), solid, dtype=np.uint8)
    else:
        arr = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8
        )
    return encode_image(arr, "png")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("ok", _img(64, 64)),                 # passes everything
        ("tiny", _img(8, 8)),                 # short edge below min_side
        ("banner", _img(256, 16)),            # aspect 16:1
        ("flat", _img(64, 64, solid=128)),    # solid color, stddev 0
        ("corrupt", b"\x89PNG\r\n\x1a\nnope"),
    ]
    return spark.createDataFrame(rows, ["image_id", "bytes"])


class TestImageQuality:
    def test_stats_measure_the_decoded_raster(self, spark, corpus):
        out = {r["image_id"]: r for r in image_quality_stats(corpus).collect()}
        assert out["ok"]["decode_ok"] and out["ok"]["n_pixels"] == 64 * 64
        assert (out["banner"]["w"], out["banner"]["h"]) == (256, 16)
        assert out["flat"]["luma_stddev_ppm"] == 0
        assert out["ok"]["luma_stddev_ppm"] > 100_000  # uniform noise
        c = out["corrupt"]
        assert c["decode_ok"] is False and c["w"] is None

    def test_rules_flags_and_keep(self, spark, corpus):
        out = {r["image_id"]: r for r in
               image_quality(corpus, min_side=32,
                             max_aspect_ppm=3_000_000).collect()}
        assert out["ok"]["keep"]
        assert out["tiny"]["too_small"] and not out["tiny"]["keep"]
        assert out["banner"]["aspect_ppm"] == 16_000_000
        assert out["banner"]["bad_aspect"] and not out["banner"]["keep"]
        # flat rule disabled by default: solid image survives
        assert out["flat"]["keep"]
        # corrupt: dropped, but per-rule flags stay NULL (dims unknown)
        assert not out["corrupt"]["keep"]
        assert out["corrupt"]["too_small"] is None

    def test_flat_rule_opt_in(self, spark, corpus):
        out = {r["image_id"]: r["keep"] for r in
               image_quality(corpus, min_side=32, max_aspect_ppm=3_000_000,
                             min_luma_stddev_ppm=1_000).collect()}
        assert out == {"ok": True, "tiny": False, "banner": False,
                       "flat": False, "corrupt": False}

    def test_boundary_is_inclusive_exclusive_exact(self, spark):
        # min_side is a strict < drop; aspect is a strict > drop
        rows = [("edge", _img(32, 32)), ("ratio3", _img(96, 32))]
        df = spark.createDataFrame(rows, ["image_id", "bytes"])
        out = {r["image_id"]: r for r in
               image_quality(df, min_side=32,
                             max_aspect_ppm=3_000_000).collect()}
        assert out["edge"]["keep"]          # == min_side survives
        assert out["ratio3"]["aspect_ppm"] == 3_000_000
        assert out["ratio3"]["keep"]        # == max_aspect survives

    def test_rules_stage_is_pure_catalyst(self, spark):
        stats = spark.createDataFrame(
            [("a", True, 64, 64, 4096, 5000)],
            "image_id string, decode_ok boolean, w int, h int, "
            "n_pixels long, luma_stddev_ppm long",
        )
        plan = plan_of(image_quality_rules(stats, min_side=32))
        assert "EvalPython" not in plan  # flags never re-enter Python


class TestPairQuality:
    def test_both_sides_gate_the_pair(self, spark):
        from olake_spark.operators.multimodal import pair_quality

        rows = [
            ("good", _img(64, 64), "a clear photo of a cat"),
            ("imgbad", _img(8, 8), "a perfectly fine caption"),
            ("capshort", _img(64, 64), "x"),
            ("caplong", _img(64, 64), " ".join(["w"] * 40)),
            ("capnull", _img(64, 64), None),
            ("corrupt", b"\x89PNG\r\n\x1a\nnope", "caption is fine"),
        ]
        df = spark.createDataFrame(rows, ["image_id", "bytes", "caption"])
        out = {r["image_id"]: r for r in
               pair_quality(df, min_side=32, min_caption_tokens=2,
                            max_caption_tokens=16).collect()}
        assert out["good"]["keep"]
        assert out["good"]["caption_tokens"] == 6
        assert not out["imgbad"]["keep"] and out["imgbad"]["caption_ok"]
        assert out["capshort"]["image_ok"] and not out["capshort"]["keep"]
        assert out["caplong"]["caption_tokens"] == 40
        assert not out["caplong"]["caption_ok"]
        assert out["capnull"]["caption_tokens"] is None
        assert not out["capnull"]["keep"]
        assert not out["corrupt"]["keep"] and out["corrupt"]["caption_ok"]
        # the caption rode the kernel batch through unchanged
        assert out["good"]["caption"] == "a clear photo of a cat"

    def test_single_pass_no_join_no_shuffle(self, spark):
        from olake_spark.operators.multimodal import pair_quality

        df = spark.createDataFrame(
            [("a", _img(64, 64), "cap")], ["image_id", "bytes", "caption"]
        )
        plan = plan_of(pair_quality(df))
        assert "Join" not in plan
        assert "Exchange" not in plan  # one map-side pass end-to-end
