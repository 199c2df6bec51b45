"""Deterministic global shuffle — training-order assignment at scale.

The last stage before a training run: give every sample a stable position
in a pseudorandom global order (epoch shuffling, resumable data loaders,
reproducible ablations all need the permutation to be a pure function of
``(seed, id)``, never of partitioning or cluster size).

The order is ``md5(seed || ':' || id)`` (ties broken by id — total order
even under the negligible digest-collision case). The naive implementation
is ``row_number() OVER (ORDER BY key)`` — a single-partition window that
serializes the whole corpus through one task. This module decomposes the
global rank instead, exploiting that md5 keys are uniform BY CONSTRUCTION:

1. bucket = the key's first ``prefix_chars`` hex digits (16^chars ordered,
   near-equal buckets — no sampling pass, so bucket identity is
   deterministic, unlike ``repartitionByRange``'s sampled boundaries);
2. ONE map-side-partial count per bucket (≤ 16^chars rows to the driver),
   exclusive-prefix-summed into bucket offsets;
3. within-bucket rank via a window PARTITIONED BY bucket (each window
   partition is ~corpus/16^chars rows — parallel, bounded, never global);
4. ``index = offset[bucket] + rank - 1`` through one broadcast join.

Output indices are exactly ``0 .. n-1``, a bijection (tested), identical
under any input partitioning. Everything is Catalyst; one data shuffle
(hash on the bucket) plus the tiny count aggregate.

The DuckDB oracle is the naive global ``row_number`` — a deliberately
different formulation, so gate equality proves the bucketed decomposition
against the definition itself.

``id_col`` values must be non-null and unique (the corpus primary key).

Reference parity: not present in the reference (it moves rows, it doesn't
read them) — LLM-data-pipeline layer, the step after `mix_domains` /
`pack_sequences` hand a curated corpus to the trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_PREFIX_CHARS = 2  # 256 buckets

_HEX = "0123456789abcdef"


def _key_expr(id_col: str, seed: int) -> str:
    return f"md5('{int(seed)}:' || CAST({id_col} AS STRING))"


def _bucket_expr(key: str, prefix_chars: int) -> str:
    # hex prefix → integer, digit by digit (instr over the hex alphabet —
    # the one formulation Spark and DuckDB spell identically; Spark's conv()
    # has no DuckDB twin)
    terms = [
        f"(instr('{_HEX}', substring({key}, {i + 1}, 1)) - 1) "
        f"* {16 ** (prefix_chars - 1 - i)}"
        for i in range(prefix_chars)
    ]
    return "(" + " + ".join(terms) + ")"


def global_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    prefix_chars: int = DEFAULT_PREFIX_CHARS,
    index_col: str = "sample_idx",
) -> DataFrame:
    """All input columns plus ``index_col``: the row's position in the
    deterministic pseudorandom global order for ``seed``."""
    key = _key_expr(id_col, seed)
    bucket = _bucket_expr(key, prefix_chars)
    spark = df.sparkSession

    keyed = df.withColumn("_k", F.expr(key)).withColumn(
        "_b", F.expr(bucket).cast("int")
    )
    counts = {
        r["_b"]: r["_n"]
        for r in keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    offsets, acc = [], 0
    for b in sorted(counts):
        offsets.append((b, acc))
        acc += counts[b]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_b int, _off long")
    if not offsets:
        off_df = off_df.limit(0)

    w = Window.partitionBy("_b").orderBy("_k", id_col)
    # LEFT join + loud guard: the count pass and the rank pass re-evaluate
    # the input lineage. For a deterministic source both passes see the
    # same buckets; a non-deterministic one (rand()/sample() upstream, a
    # concurrently-written table) could surface a bucket the count never
    # saw — an inner join would DROP those rows silently and corrupt every
    # offset, so instead the guard fails the job. Persist the input first
    # if its lineage is not re-evaluation-stable.
    guarded_off = F.when(
        F.col("_off").isNull(),
        F.expr(
            "raise_error('global_shuffle: bucket appeared that the count "
            "pass never saw — input lineage is not deterministic; persist "
            "the input DataFrame first')"
        ).cast("long"),
    ).otherwise(F.col("_off"))
    return (
        keyed.join(F.broadcast(off_df), "_b", "left")
        .withColumn(
            index_col,
            (guarded_off + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("_k", "_b", "_off")
    )


def global_shuffle_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    seed: int = 0,
    index_col: str = "sample_idx",
) -> str:
    """DuckDB twin: the naive global row_number over the same key — the
    definition itself, deliberately not the bucketed decomposition."""
    key = _key_expr(id_col, seed)
    return (
        f"SELECT *, CAST(row_number() OVER (ORDER BY {key}, {id_col}) - 1 "
        f"AS BIGINT) AS {index_col} FROM ({docs_sql})"
    )
