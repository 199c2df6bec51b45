"""Unit tests for the vectorized kernels (no SparkSession needed)."""

import numpy as np
import pandas as pd
import pytest

from olake_spark.functions import imagecodec as ic
from olake_spark.functions import zorder as z


def _img(seed: int, w: int = 32, h: int = 48) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestImageCodec:
    def test_png_roundtrip_exact(self):
        for seed in range(5):
            a = _img(seed)
            assert np.array_equal(ic.png_decode(ic.png_encode(a)), a)

    def test_png_deterministic(self):
        a = _img(7)
        assert ic.png_encode(a) == ic.png_encode(a.copy())

    def test_lossy_psnr_above_40(self):
        a = _img(3, 64, 64)
        b = ic.decode_image(ic.encode_image(a, "jpeg"))
        p = ic.psnr(a, b)
        assert 40.0 <= p < float("inf")

    def test_psnr_inf_on_equal(self):
        a = _img(1)
        assert ic.psnr(a, a) == float("inf")

    def test_phash_stable_and_locality(self):
        a = _img(11, 64, 64)
        assert ic.phash64(a) == ic.phash64(a.copy())
        # lossy re-encode should not change the perceptual hash much
        b = ic.decode_image(ic.encode_image(a, "jpeg"))
        d = bin((ic.phash64(a) ^ ic.phash64(b)) & (2**64 - 1)).count("1")
        assert d <= 8

    def test_decode_dispatch(self):
        a = _img(2)
        assert np.array_equal(ic.decode_image(ic.encode_image(a, "png")), a)


class TestZOrder:
    def test_interleave3_matches_naive(self):
        rng = np.random.default_rng(0)
        a, b, c = (rng.integers(0, 1 << 21, 200, dtype=np.uint64) for _ in range(3))
        got = z.interleave3(a, b, c)
        naive = z._interleave_generic([a, b, c], 21)
        assert np.array_equal(got, naive)

    def test_interleave2_matches_naive(self):
        rng = np.random.default_rng(1)
        a, b = (rng.integers(0, 1 << 16, 200, dtype=np.uint64) for _ in range(2))
        assert np.array_equal(z.interleave2(a, b), z._interleave_generic([a, b], 16))

    def test_hilbert_bijective_small(self):
        bits, n = 4, 2
        side = 1 << bits
        xs, ys = np.meshgrid(np.arange(side), np.arange(side))
        coords = np.stack([xs.ravel(), ys.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        assert len(np.unique(idx)) == side**2
        assert idx.max() == side**2 - 1 and idx.min() == 0

    def test_hilbert_adjacency(self):
        """Consecutive Hilbert indices are unit steps in exactly one dim."""
        bits = 3
        side = 1 << bits
        xs, ys, zs = np.meshgrid(*([np.arange(side)] * 3))
        coords = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        order = np.argsort(idx)
        walk = coords[order].astype(np.int64)
        steps = np.abs(np.diff(walk, axis=0)).sum(axis=1)
        assert (steps == 1).all()

    def test_hilbert_3d_bijective(self):
        bits = 3
        side = 1 << bits
        xs, ys, zs = np.meshgrid(*([np.arange(side)] * 3))
        coords = np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=1).astype(np.uint64)
        idx = z.hilbert_index(coords, bits)
        assert len(np.unique(idx)) == side**3

    def test_batch_keys_nonnegative_long(self):
        ph = pd.Series(np.array([-(2**63), -1, 0, 2**63 - 1, 12345], dtype=np.int64))
        w = pd.Series([32, 64, 128, 4096, 0])
        h = pd.Series([32, 48, 96, 4096, 0])
        zk = z.zorder_key_batch(ph, w, h).to_numpy()
        hk = z.hilbert_key_batch(ph, w, h).to_numpy()
        assert (zk >= 0).all() and (hk >= 0).all()
        # order preservation on phash when w/h fixed
        ph2 = pd.Series(np.array([-100, 100], dtype=np.int64))
        fixed = pd.Series([32, 32])
        k = z.zorder_key_batch(ph2, fixed, fixed).to_numpy()
        assert k[0] < k[1]

    def test_zorder2_sql_text_generates(self):
        s = z.zorder2_sql("w", "h", 4)
        import duckdb

        v = duckdb.sql(f"SELECT {s} AS k FROM (SELECT 3 AS w, 5 AS h)").fetchone()[0]
        naive = z._interleave_generic(
            [np.array([3], dtype=np.uint64), np.array([5], dtype=np.uint64)], 4
        )[0]
        assert v == int(naive)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
