"""SparkSession factory tuned for the maintenance engine.

Defaults target correctness tests on local[*]; the same knobs are what we'd
set on a 1000-executor cluster (AQE on, skew-join on, Arrow for pandas UDFs,
shuffle partitions sized to cores at test scale / to data at cluster scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _heap_gb(cpus: int) -> int:
    """4 GB per executor thread, floored at 8 GB, then capped at RAM/2 of the
    actual box — the cap is applied LAST so a small-RAM host never gets a
    default heap at or beyond physical memory."""
    ram_gb = 64
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    ram_gb = int(line.split()[1]) // (1024 * 1024)
                    break
    except OSError:
        pass
    return min(max(8, cpus * 4), max(2, ram_gb // 2))


def get_spark(
    app_name: str = "olake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    import re as _re

    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    m = _re.fullmatch(r"local\[(\d+)\]", master)
    cpus = int(m.group(1)) if m else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
        # At 10^12-row scale this is what turns a static plan into one that
        # survives hot phash prefixes (SURVEY.md §4 "Skew handling").
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF (the only Python in hot paths).
        # 16384-row batches measurably beat 4096 on the rewrite path (fewer
        # worker round-trips; compact phase −5-8% wall at BOTH 2 and 8 cores
        # on the 400k profile) and stay memory-safe: a batch can never
        # exceed its task's split, which maxPartitionBytes caps at 32 MB.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("OLAKE_ARROW_BATCH", "16384"),
        )
        # Keep scheduler chatter down in local mode.
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM hosts every executor thread — size the
        # heap PER CORE (4g/thread), or per-task execution memory shrinks
        # linearly with parallelism, allocation rate outruns a constant heap,
        # and GC time shows up as fake anti-scaling. A real N→4N executor
        # fleet carries 4× the total heap; local-mode scaling runs must
        # reproduce that per-core parity to measure the engine. Capped at
        # half of PHYSICAL RAM so smaller boxes never swap-thrash.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEM", f"{_heap_gb(cpus)}g"),
        )
        # Image `bytes` rows are fat: small parquet splits keep (a) per-task
        # memory bounded (the reference's RAM-scaled flush batches,
        # iceberg_utils.go:27-45) and (b) enough tasks per scan that
        # Python-stage phases (decode-verify, curve keys) cover every core —
        # at 128MB an 850MB table yields 8 tasks and idles half the cluster
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        # dynamic-partition writes: concurrent writers instead of the
        # sort-based fallback — the sort path re-materializes every fat row
        # (~2-3x wall on binary-heavy tables)
        .config("spark.sql.maxConcurrentOutputFileWriters", "32")
    )
    # shuffle/spill storage: this sandbox's single virtual disk (~150 MB/s)
    # is the bottleneck for every shuffle; tmpfs stands in for the NVMe
    # local disks a real executor fleet would have
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
