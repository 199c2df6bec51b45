"""End-to-end tour of olake_spark: every major capability in one runnable
script (~2 min on local[4]).

    PYTHONPATH=/root/repo python examples/pipeline_tour.py [workdir]

Walks the full lifecycle a reference (OLake) user needs, Spark-first:
table create → chunked resumable backfill → CDC merge (with schema drift) →
write-audit-publish → bin-packing compaction → Hilbert clustering → manifest
rewrite → time travel / incremental scan / tags → snapshot expiry + orphan
reap — then the training-data layer: dedup (pairs → clusters → survivors),
ANN (brute force / LSH / IVF), text quality + PII scrub, deterministic
curation. Prints one JSON line per step."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile


def step(name: str, **kv) -> None:
    print(json.dumps({"step": name, **kv}))


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from olake_spark import datagen
    from olake_spark.checkpoint import MaintenanceLog
    from olake_spark.functions import curate
    from olake_spark.functions import text as T
    from olake_spark.icelite import PartitionField, PartitionSpec, Table
    from olake_spark.operators import ann, dedup
    from olake_spark.operators.cluster import run_cluster_rewrite
    from olake_spark.operators.compact import run_compaction
    from olake_spark.operators.manifests import rewrite_manifests
    from olake_spark.operators.merge import merge_into
    from olake_spark.session import get_spark
    from olake_spark.sync import backfill

    wd = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="olake-tour-")
    spark = get_spark("olake-tour", master="local[4]", shuffle_partitions=4)
    try:
        # -- 1. table + chunked resumable backfill ------------------------
        src = datagen.gen_images_df(spark, 600)
        t = Table.create(
            spark, os.path.join(wd, "images"), datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 4),)),
            identifier_fields=("image_id",),
        )
        log = MaintenanceLog(spark, os.path.join(wd, "_mlog"))
        res = backfill(t, src, key_col="phash", job_id="tour", log=log,
                       n_chunks=8)
        step("backfill", **{k: res[k] for k in ("chunks_executed", "rows_written")})
        res = backfill(t, src, key_col="phash", job_id="tour", log=log,
                       n_chunks=8)  # resume: everything already done
        step("backfill_resume", skipped=res["chunks_skipped"])

        # -- 2. CDC merge, including upstream schema drift ----------------
        ch = (
            src.limit(50)
            .withColumn("caption", F.concat(F.col("caption"), F.lit(" v2")))
            .withColumn("_op_type", F.lit("u"))
            .withColumn("_cdc_timestamp", F.lit(1))
            .withColumn("license", F.lit("cc-by"))  # new upstream column
        )
        merge_into(t, ch, keep_deletes=False, evolve=True)
        step("merge_cdc_evolved",
             license_col="license" in [f.name for f in t.schema.fields])

        # -- 3. write-audit-publish ---------------------------------------
        staged = t.stage_append(
            datagen.gen_images_df(spark, 650).filter(
                F.col("image_id") >= "img-000000000600"
            )
        )
        audit_rows = t.scan(snapshot_id=staged["snapshot_id"]).count()
        t.publish_snapshot(staged["snapshot_id"])
        step("write_audit_publish", audited_rows=audit_rows,
             published=t.scan().count())

        # -- 3b. row-level ops: MoR delete/update, changelog, evolution ---
        clog_from = t.current_snapshot_id
        d = t.delete_where("phash % 97 = 0")  # positional-delete marks
        u = t.update_where(
            "phash % 97 = 1", {"caption": "caption || ' [flagged]'"}
        )
        feed = t.changelog_scan(clog_from)
        by_kind = {
            r["_change_type"]: r["n"]
            for r in feed.groupBy("_change_type").agg(
                F.count("*").alias("n")).collect()
        }
        t.update_spec(PartitionSpec((PartitionField("fmt", "identity"),)))
        step("row_level_ops", deleted=d["rows_deleted"],
             updated=u["rows_updated"], changelog=by_kind,
             spec_now=[f.name for f in t.spec.fields])

        # -- 3c. delete-file consolidation + metadata tables ---------------
        #    the two MoR commits above left two pos-delete files; the
        #    rewrite folds them into one without touching a data file, and
        #    the inspect tables answer layout questions metadata-only
        from olake_spark.operators.compact import rewrite_position_deletes

        rpd = rewrite_position_deletes(t)
        debt = t.inspect_partitions().agg(
            F.sum("data_file_count").alias("files"),
            F.sum("pos_delete_record_count").alias("marks"),
        ).collect()[0]
        step("rewrite_deletes", consolidated=rpd["rewritten_files"],
             into=rpd["added_files"], live_marks=rpd["kept_marks"],
             data_files=debt["files"], marks=debt["marks"],
             refs=t.inspect_refs().count())

        # -- 4. maintenance: compact → cluster → manifests ----------------
        #    (folds the delete/update marks in and migrates old-layout
        #    files to the evolved partition spec)
        pre_tag = t.create_tag("pre-maintenance")
        c = run_compaction(t, "tour", log=log, fill_ratio=1.0,
                           target_bytes=1 << 21, verify=True)
        z = run_cluster_rewrite(t, "tour", curve="hilbert",
                                target_bytes=1 << 21, log=log)
        m = rewrite_manifests(t, audit=True)
        step("maintenance", bins=c["bins_executed"],
             clustered_rows=z["rows"], manifests=m["manifests_after"])

        # -- 5. time travel / incremental / tags --------------------------
        assert t.scan_tag("pre-maintenance").count() == t.scan().count()
        inc = t.incremental_scan(staged["snapshot_id"])
        step("history", tag_rows=t.scan_tag("pre-maintenance").count(),
             incremental_since_publish=inc.count(),
             snapshot_as_of_now=t.snapshot_as_of(
                 t.snapshot()["timestamp_ms"])["snapshot_id"])

        # -- 5b. set-replacement writes ------------------------------------
        #    INSERT OVERWRITE (dynamic partition overwrite: jpeg partition
        #    atomically replaced by re-captioned copies, metadata-only
        #    delete side) and TRUNCATE on a zero-copy scratch clone — the
        #    source provably untouched
        from olake_spark.icelite import snapshot_table

        jpeg_v2 = t.scan().filter("fmt = 'jpeg'").withColumn(
            "caption", F.concat(F.col("caption"), F.lit(" [v2]")))
        ow = t.overwrite_partitions(jpeg_v2)
        scratch = snapshot_table(t, os.path.join(wd, "scratch"))
        scratch.truncate()
        step("overwrite_truncate",
             partitions_replaced=ow["partitions_replaced"],
             files_dropped=ow["removed_files"],
             rows=t.count_rows(),
             scratch_rows_after_truncate=scratch.count_rows())

        # -- 6. retention -------------------------------------------------
        t.drop_tag("pre-maintenance")
        t.expire_snapshots(keep_last=1)
        orphans = t.remove_orphan_files(grace_seconds=0)
        step("expire_reap", orphans=len(orphans), rows=t.scan().count())

        # -- 6b. maintenance autopilot: a fresh messy table, ONE call
        # decides (from metadata only) and runs what it needs
        from olake_spark.operators.autopilot import run_autopilot

        mt = Table.create(
            spark, os.path.join(wd, "messy"), datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 2),)),
            identifier_fields=("image_id",),
            properties={"write.target-file-size-bytes": str(4 << 20),
                        "autopilot.cluster.curve": "hilbert"},
        )
        mt.append(datagen.gen_images_df(spark, 100), max_records_per_file=10)
        mt.delete_where("phash % 7 = 0")
        rep = run_autopilot(mt, "tour-auto",
                            policy={"expire.max-snapshots": 1,
                                    "expire.grace-seconds": 0.0})
        step("autopilot",
             planned=[a["op"] for a in rep["actions"]],
             files=f"{rep['health_before']['data_files']}->"
                   f"{rep['health_after']['data_files']}",
             delete_files=f"{rep['health_before']['pos_delete_files']}->"
                          f"{rep['health_after']['pos_delete_files']}",
             rows=mt.scan().count())

        # -- 6c. bloom point lookup: the clustered layout defeats min/max
        # bounds (every file spans the id space), the per-file Bloom
        # sidecars restore metadata-only pruning; the autopilot owns their
        # staleness from here on (bloom.columns policy)
        from olake_spark.icelite.bloom import (bloom_file_filter,
                                               build_bloom_index,
                                               point_lookup)

        bidx = build_bloom_index(t, "image_id")
        probe = t.scan(columns=["image_id"]).first()["image_id"]
        cand = bloom_file_filter(t, "image_id", [probe])
        hit = point_lookup(t, "image_id", [probe])
        assert hit.count() == 1 and hit.first()["image_id"] == probe
        step("bloom_lookup", indexed_files=bidx["n_files"],
             candidate_files=len(cand), rows=1)

        # -- 7. training-data layer over documents ------------------------
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

        # 7-pre: the chain now starts at raw HTML — wrap each doc in a
        # deterministic page (nav boilerplate, script, entities), extract,
        # and hand the TEXT to everything below
        from olake_spark.functions.htmltext import extract_html_text

        pages = docs.select(
            "doc_id",
            F.expr(
                "'<html><head><script>var x=1<2;</script></head><body>"
                "<nav><a href=\"/\">Home</a></nav><p>' || "
                "replace(text, '. ', '.</p><p>') || "
                "'</p><!-- c --></body></html>'"
            ).alias("html"),
        )
        extracted = extract_html_text(pages)
        assert extracted.filter("link_density_ppm > 0").count() == docs.count()
        step("html_extract",
             pages=extracted.count(),
             med_chars=extracted.approxQuantile("n_chars", [0.5], 0.0)[0])
        pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", 500_000, k=3)
        cc = dedup.connected_components(pairs)
        best = dedup.keep_best_per_cluster(
            docs, cc, "doc_id", T.quality_score_ppm_col("text")
        )
        step("dedup", dup_pairs=pairs.count(),
             survivors=best.filter("is_kept").count(), corpus=docs.count())

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 3)
        bf = ann.knn_bruteforce(emb, q, "vec_id", "embedding", k=3)
        ivf = ann.knn_ivf(emb, q, "vec_id", "embedding", k=3, n_cells=16,
                          nprobe=4)
        sq8 = ann.knn_sq8(emb, q, "vec_id", "embedding", k=3)
        sq8_top1_agree = (
            sq8.filter("rank = 1").join(
                bf.filter("rank = 1").withColumnRenamed(
                    "neighbor_id", "bf_neighbor"),
                "query_id")
            .filter("neighbor_id = bf_neighbor").count()
        )
        step("ann", bruteforce_rows=bf.count(), ivf_rows=ivf.count(),
             sq8_rows=sq8.count(), sq8_top1_agree=sq8_top1_agree)

        # 7a-bis: normalization-insensitive cross-corpus dedup — normalize
        # (CCNet view), then flag the "new crawl" against a standing
        # reference built from case/accent variants of the same pages
        from olake_spark.functions.textnorm import normalize_documents
        from olake_spark.operators.crossdedup import dedup_against_exact

        ref = docs.filter("doc_id % 4 = 1").select(
            (F.col("doc_id") + 900000).alias("doc_id"),
            F.upper("text").alias("text"),  # case variant: raw md5 differs
        )
        raw_flags = dedup_against_exact(docs, ref)
        norm_docs = normalize_documents(docs).select(
            "doc_id", F.col("normalized_text").alias("text")
        )
        norm_ref = normalize_documents(ref).select(
            "doc_id", F.col("normalized_text").alias("text")
        )
        norm_flags = dedup_against_exact(norm_docs, norm_ref)
        raw_hits = raw_flags.filter("keep = 0").count()
        norm_hits = norm_flags.filter("keep = 0").count()
        assert raw_hits == 0 and norm_hits == docs.filter("doc_id % 4 = 1").count()
        step("crossdedup_normalized", raw_hits=raw_hits, norm_hits=norm_hits)

        sampled = curate.hash_sample(docs, "doc_id", 500_000)
        capped = curate.stratified_cap(sampled, ["lang"], "doc_id", 50)
        scrubbed = capped.withColumn(
            "text", curate.scrub_pii_col("text"))
        step("curate", sampled=sampled.count(), final=scrubbed.count())

        # -- 7b. quality rules + sequence packing --------------------------
        rules = docs.select("doc_id", *T.gopher_rules_cols("text"))
        from olake_spark.operators import pack

        packed = pack.pack_sequences(
            docs, "doc_id", T.token_count_col("text"), budget=256
        )
        step("curate2", kept=rules.filter("keep = 1").count(),
             sequences=packed.select("bucket", "seq").distinct().count())

        # -- 7b2. benchmark decontamination: audit the corpus for n-gram
        # overlap against a (broadcast) eval set — here a hash-slice of
        # the docs stands in for the benchmark suite
        from olake_spark.operators.decontaminate import (
            benchmark_grams, decontaminate,
        )

        split = curate.hash_mod_col("doc_id", 10)
        audit = decontaminate(
            docs.filter(split != 0),
            benchmark_grams(docs.filter(split == 0), "text", n=3),
            n=3, max_contam_ppm=100_000,
        )
        step("decontaminate", audited=audit.count(),
             clean=audit.filter("keep = 1").count())

        # -- 7b2b. the web-curation chain: URL dedup → paragraph dedup →
        # repetition rules → LM perplexity → ExactSubstr → real BPE
        from olake_spark.functions import repetition as REP
        from olake_spark.functions.urlnorm import dedup_by_url
        from olake_spark.operators import bpe, lm
        from olake_spark.operators.exactsubstr import dedup_exact_substrings
        from olake_spark.operators.paragraphs import dedup_paragraphs

        urls = docs.selectExpr(
            "doc_id",
            "CASE doc_id % 3 WHEN 0 THEN 'http://ex' || CAST(doc_id % 9 AS STRING) || '.com/p' "
            "WHEN 1 THEN 'https://www.ex' || CAST(doc_id % 9 AS STRING) || '.com/p/' "
            "ELSE 'ex' || CAST(doc_id % 9 AS STRING) || '.com/p?utm_source=t' END AS url",
        )
        url_keep = dedup_by_url(urls).filter("keep = 1").count()
        multi = docs.selectExpr(
            "doc_id",
            "concat_ws('\\n', transform(sequence(0, CAST((size(split(text, ' ')) + 9) DIV 10 AS INT) - 1), "
            "g -> concat_ws(' ', slice(split(text, ' '), g * 10 + 1, 10)))) AS text",
        )
        paras = dedup_paragraphs(multi)
        rep = multi.select(
            "doc_id", *REP.repetition_rules_cols("text", max_top2_ppm=60_000)
        )
        ref_bi, ref_ctx = lm.count_bigrams_py(
            [r["text"] for r in docs.limit(8).collect()]
        )
        ppl = lm.score_lm(docs, lm.fit_lm(ref_bi, ref_ctx),
                          max_nll_ppm=1_500_000)
        xs = dedup_exact_substrings(
            docs.selectExpr(
                "doc_id",
                "CASE WHEN doc_id % 2 = 0 THEN 'shared header span one two "
                "three four five' || ' ' || text ELSE text END AS text",
            ),
            width=6,
        )
        merges = bpe.train_bpe(docs, num_merges=40)
        enc = bpe.bpe_encode(docs, merges)
        from olake_spark.operators.shuffleorder import global_shuffle

        order = global_shuffle(docs.select("doc_id"), seed=11)
        n_docs = docs.count()
        assert (
            order.agg(F.min("sample_idx"), F.max("sample_idx")).first()
            == (0, n_docs - 1)
        )
        step(
            "web_curation_chain",
            shuffled=n_docs,
            url_survivors=url_keep,
            paras_removed=int(
                paras.selectExpr("sum(n_paras - n_kept)").first()[0]
            ),
            repetition_kept=rep.filter("keep = 1").count(),
            ppl_kept=ppl.filter("keep = 1").count(),
            substr_tokens_removed=int(
                xs.selectExpr("sum(n_removed)").first()[0]
            ),
            bpe_merges=len(merges),
            bpe_tokens=int(enc.selectExpr("sum(n_tokens)").first()[0]),
        )

        # -- 7b3. domain mixture + semantic dedup + pair curation ----------
        from olake_spark.operators.multimodal import pair_quality
        from olake_spark.operators.semdedup import semantic_dedup

        mixed = curate.mix_domains(
            docs, "source", "doc_id",
            {"src0": 500_000, "src1": 300_000, "src2": 150_000,
             "src3": 50_000},
            total_rows=200,
        )
        cents = ann.train_ivf_centroids_kmeans(emb, "embedding", 16)
        sem = semantic_dedup(emb, "vec_id", "embedding", cents, 990_000)
        from olake_spark.pipeline import images_from_documents

        pq = pair_quality(
            images_from_documents(spark, "/root/testdata/sf0.001"),
            min_side=24, min_caption_tokens=12, max_caption_tokens=80,
        )
        step("mix_semdedup_pairs",
             mixed_rows=mixed.count(),
             max_epoch=mixed.agg(F.max("epoch")).first()[0],
             sem_kept=sem.filter("is_kept").count(), sem_total=sem.count(),
             pairs_kept=pq.filter("keep").count(), pairs_total=pq.count())

        # -- 7b4. aspect bucketing -> batch packing -> resize -> tar shards
        #    (the SDXL multi-aspect recipe ending in WebDataset shards,
        #    the trainer-facing terminal stage)
        import numpy as np

        from olake_spark.functions.imagecodec import encode_image
        from olake_spark.operators.bucketing import (aspect_bucket_grid,
                                                     assign_aspect_buckets,
                                                     pack_batches)
        from olake_spark.operators.multimodal import resize_to_bucket
        from olake_spark.operators.shards import write_webdataset_shards

        rng = np.random.default_rng(7)
        varied = spark.createDataFrame(
            [(f"v-{i:03d}",
              encode_image(rng.integers(0, 256, (hh, ww, 3), dtype=np.uint8),
                           "png"),
              f"a varied-aspect sample number {i}", ww, hh)
             for i, (ww, hh) in enumerate(
                 [(200, 50), (50, 200), (64, 64), (512, 512), (120, 80),
                  (80, 120), (300, 100), (100, 300)])],
            "image_id string, bytes binary, caption string, w int, h int",
        )
        assigned = assign_aspect_buckets(varied, aspect_bucket_grid())
        packed = pack_batches(assigned, "image_id", 4, n_shards=1)
        fitted = resize_to_bucket(assigned)
        shard_dir = os.path.join(wd, "wds")
        man = write_webdataset_shards(packed, shard_dir).toPandas()
        step("aspect_shards",
             buckets=assigned.select("bucket_w", "bucket_h")
             .distinct().count(),
             resized_ok=fitted.filter("decode_ok").count(),
             shards=len(man),
             samples=int(man["n_samples"].sum()),
             bytes=int(man["n_bytes"].sum()))

        # -- 7c. retrieval + sessionization --------------------------------
        from olake_spark.operators.retrieval import bm25_topk
        from olake_spark.operators.sessionize import sessionize

        hits = bm25_topk(docs, "doc_id", "text", "spark table merge", k=5)
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        sess = sessionize(ev, "user_id", "ts", "event_id", 6 * 3600)
        step("retrieve_sessionize", top_doc=hits.first()["doc"],
             sessions=sess.select("user", "session_idx").distinct().count())

        # -- 8. zero-copy clone + streaming table→table pipeline ----------
        #    snapshot_table references the maintained table's files with
        #    zero bytes copied; the icelite streaming SOURCE tails it and
        #    the icelite streaming SINK appends into a fresh table with
        #    exactly-once per-batch commits
        from olake_spark.icelite import snapshot_table
        from olake_spark.streaming import read_table_stream, write_table_stream

        dev = snapshot_table(t, os.path.join(wd, "dev-clone"))
        mirror = Table.create(
            spark, os.path.join(wd, "mirror"), t.schema,
            t.spec, identifier_fields=tuple(t.identifier_fields),
        )
        q = write_table_stream(
            read_table_stream(spark, dev.root),
            mirror.root, os.path.join(wd, "pipe-ckpt"), txn_app="tour-pipe",
        )
        q.awaitTermination(300)
        mirror.refresh()
        step("clone_and_pipe", clone_rows=dev.scan().count(),
             mirrored_rows=mirror.scan().count())

        # ---- Iceberg-spec interop: export → read in place → re-import
        from olake_spark.icelite.export import (
            export_iceberg, import_iceberg, open_iceberg,
        )

        exp = export_iceberg(dev, os.path.join(wd, "iceberg-export"))
        exp_root = os.path.dirname(os.path.dirname(exp["metadata_json"]))
        in_place = open_iceberg(spark, exp_root).count()
        reimported = import_iceberg(
            spark, exp_root, os.path.join(wd, "reimported")
        ).scan().count()
        step("iceberg_interop", exported_manifests=len(exp["manifests"]),
             open_in_place_rows=in_place, reimported_rows=reimported)

        # ---- real media: baseline-JPEG images and an MJPEG-AVI video
        # through the same multimodal kernels the synthetic fixtures use
        import numpy as np

        from olake_spark.functions.avicodec import encode_mjpeg_avi
        from olake_spark.functions.jpegcodec import jpeg_encode
        from olake_spark.operators.multimodal import (
            decode_stats, sample_frames,
        )

        xx, yy = np.meshgrid(np.arange(64), np.arange(48))
        frames = np.stack([
            np.stack([(xx * 3 + f * 9) % 256, (yy * 5 + f * 5) % 256,
                      ((xx + yy) * 2 + f) % 256], axis=-1)
            for f in range(12)
        ]).astype(np.uint8)
        jpgs = spark.createDataFrame(
            [(f"jpg-{i}", bytearray(jpeg_encode(frames[i], 90)),
              64, 48, "jpeg", f"real jpeg {i}", i) for i in range(4)],
            "image_id string, bytes binary, w int, h int, fmt string, "
            "caption string, phash long",
        )
        jstats = decode_stats(jpgs).collect()
        vids = spark.createDataFrame(
            [("clip-0", bytearray(encode_mjpeg_avi(frames, 24, 1, 90)))],
            "video_id string, bytes binary",
        )
        vframes = sample_frames(vids, every_n=4).collect()
        # a decompression bomb in the same batch: tiny bytes, huge declared
        # dims — rejected per-row (decode_ok=false), batch unharmed
        import struct as _st
        import zlib as _zl

        def _chunk(tag, body):
            return (_st.pack(">I", len(body)) + tag + body
                    + _st.pack(">I", _zl.crc32(tag + body)))

        bomb = (b"\x89PNG\r\n\x1a\n"
                + _chunk(b"IHDR", _st.pack(">IIBBBBB", 40_000, 40_000,
                                           8, 2, 0, 0, 0))
                + _chunk(b"IDAT", _zl.compress(b"\x00" * 64))
                + _chunk(b"IEND", b""))
        poisoned = jpgs.union(spark.createDataFrame(
            [("bomb-0", bytearray(bomb), 40_000, 40_000, "png",
              "decompression bomb", 0)], jpgs.schema))
        pstats = {r["image_id"]: r["decode_ok"]
                  for r in decode_stats(poisoned).collect()}
        step("real_media",
             jpeg_decoded=sum(r["decode_ok"] for r in jstats),
             mjpeg_frames_sampled=len(vframes),
             frame_indexes=[r["frame_idx"] for r in vframes],
             bomb_rejected=not pstats["bomb-0"],
             batch_survived=sum(pstats.values()))

        step("done", warehouse=wd)
    finally:
        spark.stop()
        if len(sys.argv) <= 1:
            shutil.rmtree(wd, ignore_errors=True)


if __name__ == "__main__":
    main()
