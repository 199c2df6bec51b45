"""Semantic tests for the training-data pipeline operators: planted
near-duplicates for dedup, planted neighbors for ANN, exact values for text
kernels, bounded-stream drain + checkpoint resume for streaming."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, FloatType, LongType, StringType,
                               StructField, StructType)

from olake_spark.functions import text as T
from olake_spark.operators import ann, dedup

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _doc(rng, n=40):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(99)
    rows = []
    for i in range(30):
        rows.append((i, _doc(rng)))
    # planted near-dups: copy doc 0 with 2 tokens changed, doc 1 verbatim
    toks = rows[0][1].split()
    toks[5], toks[20] = "prism", "vortex"
    rows.append((100, " ".join(toks)))
    rows.append((101, rows[1][1]))
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestDedup:
    def test_exact_groups_verbatim_copy(self, docs):
        out = dedup.dedup_exact(docs, "doc_id", "text")
        dups = out.filter(F.col("dup_count") > 1).collect()
        assert len(dups) == 1 and dups[0]["keep_id"] == 1

    def test_jaccard_finds_planted_pair(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard_ppm"]
            for r in dedup.jaccard_pairs(
                docs, "doc_id", "text", threshold_ppm=400_000
            ).collect()
        }
        assert (0, 100) in pairs
        assert (1, 101) in pairs and pairs[(1, 101)] == 1_000_000

    def test_minhash_lsh_equals_exact(self, docs):
        exact = sorted(
            tuple(r) for r in dedup.jaccard_pairs(
                docs, "doc_id", "text", threshold_ppm=500_000
            ).collect()
        )
        lsh = sorted(
            tuple(r) for r in dedup.minhash_lsh_pairs(
                docs, "doc_id", "text", threshold_ppm=500_000
            ).collect()
        )
        assert lsh == exact and len(exact) >= 2

    def test_simhash_catches_near_identical(self, docs):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=8).collect()
        }
        assert pairs.get((1, 101)) == 0
        assert (0, 100) in pairs

    def test_embedding_near_dup_planted(self, spark):
        rng = np.random.default_rng(5)
        vecs = [rng.standard_normal(16).astype("float32") for _ in range(20)]
        vecs.append(vecs[3] + rng.standard_normal(16).astype("float32") * 0.01)
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ])
        df = spark.createDataFrame(rows, schema)
        out = dedup.embedding_near_dup(df, "vec_id", "embedding", 990_000).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(3, 20)]


class TestAnn:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.default_rng(17)
        rows = []
        for i in range(200):
            rows.append((i, [float(x) for x in rng.standard_normal(32)]))
        # planted twin of vec 0 (tiny perturbation → same LSH bucket w.h.p.)
        twin = [v + float(e) * 1e-3 for v, e in zip(rows[0][1], rng.standard_normal(32))]
        rows.append((500, twin))
        schema = StructType([
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ])
        return spark.createDataFrame(rows, schema)

    def test_bruteforce_finds_twin_rank1(self, emb):
        out = ann.knn_bruteforce(
            emb, emb.filter(F.col("vec_id") == 0), "vec_id", "embedding", k=3
        ).collect()
        assert out[0]["rank"] == 1 and out[0]["neighbor_id"] == 500
        assert out[0]["cos_ppm"] > 999_000

    def test_lsh_finds_twin_and_subsets_bruteforce(self, emb):
        q = emb.filter(F.col("vec_id") == 0)
        lsh = ann.knn_lsh(emb, q, "vec_id", "embedding", dim=32, k=3).collect()
        assert lsh and lsh[0]["neighbor_id"] == 500
        # every LSH result must carry the true cosine (verified, not approx)
        bf = {
            r["neighbor_id"]: r["cos_ppm"]
            for r in ann.knn_bruteforce(emb, q, "vec_id", "embedding", k=200).collect()
        }
        for r in lsh:
            assert bf[r["neighbor_id"]] == r["cos_ppm"]


class TestTextKernels:
    def test_exact_values(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat on a mat")], ["doc_id", "text"]
        )
        row = df.select(
            T.token_count_col("text").alias("n"),
            T.stopword_count_col("text").alias("stop"),
            T.avg_token_len_ppm_col("text").alias("avg_ppm"),
            T.lang_id_col("text").alias("lang"),
            T.fingerprint_col("text").alias("fp"),
        ).collect()[0]
        assert row["n"] == 6
        assert row["stop"] == 2  # 'the', 'a'
        # 20 chars - 5 separators = 15 token chars / 6 tokens
        assert row["avg_ppm"] == int(15 * 1_000_000 / 6)
        assert row["lang"] == "en"
        # rolling hash: deterministic + order-sensitive
        row2 = spark.createDataFrame(
            [(1, "cat the sat on a mat")], ["doc_id", "text"]
        ).select(T.fingerprint_col("text").alias("fp")).collect()[0]
        assert row["fp"] != row2["fp"]

    def test_shingles_short_doc_empty(self, spark):
        df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
        out = df.withColumn("toks", F.split("text", " ")).select(
            T.shingles_col("toks", 3).alias("sh")
        )
        assert out.collect()[0]["sh"] == []


class TestMultimodal:
    def test_decode_stats_matches_pixels(self, spark):
        from olake_spark import datagen
        from olake_spark.operators.multimodal import decode_stats

        imgs = datagen.gen_images_df(spark, 20)
        out = {r["image_id"]: r for r in decode_stats(imgs).collect()}
        assert len(out) == 20 and all(r["decode_ok"] for r in out.values())
        for i in (0, 3):  # 0 = jpeg (lossy stand-in), 3 = png
            exp = datagen.expected_pixels(i)
            got = out[f"img-{i:012d}"]
            assert got["n_pixels"] == exp.shape[0] * exp.shape[1]
            tol = 1.5 if i % 4 == 0 else 1e-9
            assert abs(got["mean_r"] - exp[:, :, 0].mean()) <= tol

    def test_resize_shapes(self, spark):
        from olake_spark import datagen
        from olake_spark.functions.imagecodec import decode_image
        from olake_spark.operators.multimodal import resize_images

        imgs = datagen.gen_images_df(spark, 4)
        out = resize_images(imgs, 8, 8).collect()
        for r in out:
            assert decode_image(bytes(r["bytes"])).shape == (8, 8, 3)

    def test_y4m_codec_roundtrip(self):
        import numpy as np

        from olake_spark.functions.videocodec import decode_y4m, encode_y4m

        rng = np.random.default_rng(7)
        frames = rng.integers(0, 256, size=(5, 9, 14), dtype=np.uint8)
        out, num, den = decode_y4m(encode_y4m(frames, 24, 1))
        assert (num, den) == (24, 1)
        assert np.array_equal(out, frames)
        with pytest.raises(ValueError, match="uint8"):
            encode_y4m(frames.astype(np.int32))
        with pytest.raises(ValueError, match="YUV4MPEG2"):
            decode_y4m(b"RIFFnot-a-video")

    def test_y4m_decode_420_luma(self):
        # hand-built 4:2:0 stream: luma must be recovered, chroma skipped
        import numpy as np

        from olake_spark.functions.videocodec import decode_y4m

        w, h = 8, 6
        rng = np.random.default_rng(3)
        lumas = [rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                 for _ in range(3)]
        chroma = bytes((w // 2) * (h // 2) * 2)
        data = b"YUV4MPEG2 W8 H6 F25:1 Ip A1:1 C420jpeg\n" + b"".join(
            b"FRAME\n" + y.tobytes() + chroma for y in lumas
        )
        out, num, den = decode_y4m(data)
        assert (num, den) == (25, 1)
        assert np.array_equal(out, np.stack(lumas))
        with pytest.raises(ValueError, match="truncated"):
            decode_y4m(data[:-5])

    def test_sample_frames_real_kernel(self, spark):
        import numpy as np

        from olake_spark import datagen
        from olake_spark.functions.imagecodec import decode_image
        from olake_spark.operators.multimodal import sample_frames

        vids = datagen.gen_video_df(spark, 6)
        out = sample_frames(vids, every_n=2).collect()
        by_vid = {}
        for r in out:
            assert r["decode_ok"]
            by_vid.setdefault(r["video_id"], []).append(r)
        assert len(by_vid) == 6
        for vid in range(6):
            frames = datagen.video_frames(vid)
            rows = sorted(by_vid[f"vid-{vid:08d}"],
                          key=lambda r: r["frame_idx"])
            assert [r["frame_idx"] for r in rows] == list(
                range(0, frames.shape[0], 2)
            )
            for r in rows:
                luma = frames[r["frame_idx"]]
                assert r["n_pixels"] == luma.size
                assert r["mean_luma_milli"] == int(
                    luma.sum(dtype=np.int64)
                ) * 1000 // luma.size
                png = decode_image(bytes(r["frame_png"]))
                assert np.array_equal(png[:, :, 0], luma)
                assert np.array_equal(png[:, :, 1], luma)

    def test_sample_frames_bad_payload(self, spark):
        from olake_spark.operators.multimodal import sample_frames

        vids = spark.createDataFrame([("v1", b"xx")], ["video_id", "bytes"])
        rows = sample_frames(vids).collect()
        assert len(rows) == 1 and not rows[0]["decode_ok"]
        with pytest.raises(ValueError, match="every_n"):
            sample_frames(vids, every_n=0)

    def test_wav_codec_roundtrip(self):
        import numpy as np

        from olake_spark.functions.audiocodec import decode_wav, encode_wav

        s = (np.arange(-100, 100, dtype=np.int64) * 127).astype(np.int16)
        out, sr = decode_wav(encode_wav(s, 8000))
        assert sr == 8000
        assert np.array_equal(out, s)
        with pytest.raises(ValueError, match="int16"):
            encode_wav(s.astype(np.float64), 8000)

    def test_audio_features_real_kernel(self, spark):
        import numpy as np

        from olake_spark import datagen
        from olake_spark.operators.multimodal import audio_features

        clips = datagen.gen_audio_df(spark, 8)
        # one undecodable payload must flag, not poison the batch
        bad = spark.createDataFrame(
            [("clip-bad", bytearray(b"not a wav"), 0, 0)],
            datagen.AUDIO_SCHEMA,
        )
        out = {r["clip_id"]: r for r in
               audio_features(clips.unionByName(bad)).collect()}
        assert len(out) == 9
        assert not out["clip-bad"]["decode_ok"]
        for cid in range(8):
            r = out[f"clip-{cid:08d}"]
            s = datagen.audio_waveform(cid).astype(np.float64)
            assert r["decode_ok"] and r["sample_rate"] == datagen.AUDIO_SR
            assert r["n_samples"] == len(s)
            assert r["duration_s"] == pytest.approx(len(s) / datagen.AUDIO_SR)
            assert r["rms"] == pytest.approx(
                float(np.sqrt((s * s).mean())), rel=1e-12
            )
            assert r["zero_crossings"] == int(((s[1:] * s[:-1]) < 0).sum())
            assert r["peak"] == int(np.abs(s).max())
            # sawtooth fundamental = k*sr/65536; centroid sits above it
            # (energy in harmonics) but far below Nyquist
            k = 3 + cid % 11
            fund = k * datagen.AUDIO_SR / 65536
            assert fund < r["spectral_centroid_hz"] < datagen.AUDIO_SR / 2


class TestBoundedStreaming:
    def test_drain_matches_batch_and_resumes(self, spark, tmp_path):
        from olake_spark.streaming import (bounded_file_stream,
                                           run_available_now, windowed_counts)

        feed = tmp_path / "feed"
        feed.mkdir()
        ckpt = str(tmp_path / "ckpt")
        df = spark.range(0, 300).select(
            F.col("id").alias("event_id"),
            F.expr(
                "cast(timestampadd(MINUTE, cast(id * 7 as int), "
                "TIMESTAMP '2026-02-01 00:00:00') as timestamp)"
            ).alias("ts"),
            (F.col("id") % 3).alias("user_id"),
            F.lit("click").alias("event_type"),
            (F.col("id") * 1.0).alias("value"),
        )
        df.coalesce(3).write.parquet(str(feed), mode="overwrite")

        stream = bounded_file_stream(spark, str(feed), df.schema, max_files_per_trigger=1)
        agg = windowed_counts(stream, "ts", "1 hour", "2 hours")
        out1 = run_available_now(agg, ckpt)
        batch = df.groupBy(F.window("ts", "1 hour")).count()
        assert out1.count() == batch.count()
        assert out1.agg(F.sum("n")).collect()[0][0] == 300

        # resume: drain again from the same checkpoint — no new input, and
        # the run completes instantly without reprocessing (offsets persisted)
        out2 = run_available_now(agg, ckpt)
        assert out2.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0] in (0, 300)


class TestEmbeddingLshDedup:
    def test_lsh_near_dup_recall_on_planted_twins(self, spark):
        """The 10^9-scale approximate path must recover ≥90% of planted
        cos≈0.99 twin pairs, each verified with the exact fold cosine
        (so precision is 1.0 by construction — only recall is at stake)."""
        rng = np.random.default_rng(11)
        dim, n, nt = 24, 150, 40
        base = rng.standard_normal((n, dim)).astype(np.float32)
        rows = [(i, base[i].tolist()) for i in range(n)]
        for j in range(nt):  # twin of vector j with tiny perturbation
            tw = base[j] + 0.03 * rng.standard_normal(dim).astype(np.float32)
            rows.append((1000 + j, tw.tolist()))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = dedup.embedding_near_dup_lsh(
            df, "vec_id", "embedding", dim=dim, threshold_ppm=950_000
        ).collect()
        pairs = {(r["id_a"], r["id_b"]) for r in got}
        hits = sum(1 for j in range(nt) if (j, 1000 + j) in pairs)
        assert hits >= int(0.9 * nt), f"LSH dedup recall {hits}/{nt}"
        # every emitted pair really is above threshold (exact verify ran)
        assert all(r["cos_ppm"] >= 950_000 for r in got)


class TestConnectedComponents:
    def test_chain_star_and_singleton_components(self, spark):
        from olake_spark.operators.dedup import connected_components

        # chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, isolated pair 20-21
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
            ["id_a", "id_b"],
        )
        got = {
            r["node"]: r["cluster"]
            for r in connected_components(pairs).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                       10: 10, 11: 10, 12: 10, 13: 10,
                       20: 20, 21: 20}

    def test_label_is_component_min_regardless_of_edge_direction(self, spark):
        from olake_spark.operators.dedup import connected_components

        # min id appears only as id_b: propagation must still find it
        pairs = spark.createDataFrame([(5, 1), (5, 9)], ["id_a", "id_b"])
        got = {
            r["node"]: r["cluster"]
            for r in connected_components(pairs).collect()
        }
        assert got == {1: 1, 5: 1, 9: 1}


class TestHammingPairs:
    """hamming_pairs is EXACT (pigeonhole banding, not probabilistic): on a
    random 64-bit corpus with planted near-twins, its output must equal the
    brute-force popcount join, including full-width negative hashes."""

    def test_matches_bruteforce(self, spark):
        from olake_spark.operators.dedup import hamming_pairs

        base = spark.sql(
            """
            SELECT concat('id-', id) AS id,
                   CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10)
                        AS BIGINT)
                   ^ shiftleft(CAST(id % 2 AS BIGINT), 63) AS h
            FROM range(250)
            """
        )
        twins = spark.sql(
            """
            SELECT concat('id-', id, '~t') AS id,
                   CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10)
                        AS BIGINT)
                   ^ shiftleft(CAST(id % 2 AS BIGINT), 63)
                   ^ shiftleft(CAST(1 AS BIGINT), CAST(id % 64 AS INT)) AS h
            FROM range(250) WHERE id % 9 = 2
            """
        )
        corpus = base.unionByName(twins)
        got = {
            tuple(r)
            for r in hamming_pairs(corpus, "id", "h", max_hamming=4).collect()
        }
        brute = {
            tuple(r)
            for r in corpus.alias("a")
            .crossJoin(corpus.alias("b"))
            .filter("a.id < b.id")
            .selectExpr(
                "a.id AS id_a",
                "b.id AS id_b",
                "CAST(bit_count(a.h ^ b.h) AS BIGINT) AS hamming",
            )
            .filter("hamming <= 4")
            .collect()
        }
        assert got == brute
        assert len(got) >= 26  # every planted twin found (250/9 ≈ 28)
