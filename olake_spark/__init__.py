"""olake_spark — a from-scratch PySpark-native Iceberg-style table-maintenance engine.

Replicates the post-ingest guarantees of the reference (OLake, a Go CLI + Java
sidecar that replicates OLTP databases into Apache Iceberg — see SURVEY.md):

- bin-packing small-file compaction   (olake_spark.operators.compact)
- Z-order / Hilbert clustering        (olake_spark.operators.cluster)
- manifest rewrite w/ per-file stats  (olake_spark.operators.manifests)
- snapshot expiry + orphan reaping    (olake_spark.operators.expire)
- MERGE INTO (CDC upsert/delete)      (olake_spark.operators.merge)

plus the training-data-pipeline operators a 100 TB lakehouse needs
(dedup, similarity search, text analysis, multimodal plumbing).

The storage layer (`olake_spark.icelite`) is an Iceberg-v2-shaped table format
built from scratch in Python over Parquet, because this environment ships no
iceberg-spark-runtime jar: snapshots, parquet manifests with per-file min/max
stats, equality-delete files, atomic metadata commits with optimistic
concurrency, snapshot-pinned reads. The data plane is 100% Spark DataFrames.
"""

__version__ = "0.1.0"

from olake_spark.session import get_spark  # noqa: F401
