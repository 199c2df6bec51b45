"""P1/P2/P3 per-record transforms: flatten, key reformat, type coercion.

Mirrors the reference's normalization path (destination/writers.go:122-144):
flatten nested values to JSON strings (utils/typeutils/flatten.go:28-88),
canonicalize keys lowercase with non-alphanumerics → `_`
(flatten.go:77-98), then coerce values to the declared column types
(utils/typeutils/reformat.go:45-421). All three are pure Catalyst here —
column renames are metadata-only, casts/`to_json` are codegen'd expressions.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType


def reformat_key(name: str) -> str:
    """Lowercase + `[^a-z0-9]` → `_` (flatten.go:77-98)."""
    return re.sub(r"[^a-z0-9]", "_", name.lower())


def canonicalize_columns(df: DataFrame) -> DataFrame:
    """P2: rename every column to its canonical form; suffix duplicates the
    way the reference's schema map would collide them deterministically."""
    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        k = reformat_key(c)
        n = seen.get(k, 0)
        seen[k] = n + 1
        out.append(f"{k}_{n}" if n else k)
    return df.toDF(*out)


def flatten_top_level(df: DataFrame) -> DataFrame:
    """P1: keep scalars as-is; serialize struct/array/map columns to JSON
    strings (the Go parquet writer's behavior, types/data_types.go:252-254)."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (StructType, ArrayType, MapType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def cdc_stream_filter(
    df: DataFrame, streams: list[str] | set[str], stream_col: str = "_stream"
) -> DataFrame:
    """P4: keep change events only for selected streams/tables — the
    reference's per-stream CDC routing (a change feed carries events for
    every table; each configured stream consumes its own,
    types/stream_configured.go + drivers' ChangeStreamDriver filtering).
    A trivial Catalyst `isin` filter, pushed into the feed scan."""
    return df.filter(F.col(stream_col).isin(*sorted(set(streams))))


def exclude_columns(df: DataFrame, exclude: list[str] | set[str]) -> DataFrame:
    """P7: drop excluded columns before the write — the reference's
    partial-data column exclusion (`stream_configured.go:19` TODO; shipped
    here). Unknown names are ignored (exclusion is a projection contract,
    not a schema assertion)."""
    drop = {reformat_key(c) for c in exclude}
    keep = [c for c in df.columns if reformat_key(c) not in drop]
    return df.select(*keep)


def json_to_struct(
    df: DataFrame,
    col: str,
    schema,
    ts_ms_fields: tuple[str, ...] = ("_cdc_timestamp", "_olake_timestamp"),
) -> DataFrame:
    """P8: recursive JSON → typed value conversion (RecordConverter.java's
    jsonValToIcebergVal walk, :199-303): parse the JSON-string column into a
    fully typed struct/list/map tree per `schema`, recursing into nested
    types exactly as the reference does element-by-element — except here one
    `from_json` expression does the whole recursion JVM-side (Jackson under
    Catalyst), with unparseable input → null (mode PERMISSIVE, the
    error-to-null contract of the reformat path).

    The reference special-cases ms-epoch numbers for its metadata timestamp
    columns (TS_MS_FIELDS, RecordConverter.java:243-248): top-level fields
    named in `ts_ms_fields` that are declared timestamp in `schema` are
    parsed as LONG ms-epoch then converted, not as ISO text."""
    from pyspark.sql.types import LongType, StructField, TimestampType

    ms_fields = [
        f.name
        for f in schema.fields
        if f.name in ts_ms_fields and isinstance(f.dataType, TimestampType)
    ]
    # parse ms-epoch fields as long, everything else as declared
    parse_schema = StructType(
        [
            StructField(f.name, LongType(), True)
            if f.name in ms_fields
            else f
            for f in schema.fields
        ]
    )
    parsed = F.from_json(F.col(col), parse_schema)
    out = parsed
    for name in ms_fields:
        out = out.withField(name, F.timestamp_millis(parsed.getField(name)))
    return df.withColumn(col, out)


def coerce_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """P3: cast every column to the target type with try_cast semantics
    (unparseable → null, like ReformatRecord's error-to-null paths); missing
    columns become nulls, extra columns are dropped — the write-side schema
    contract of the evolving-fields path (fields.go:112-137)."""
    cols = []
    for f in target.fields:
        if f.name in df.columns:
            cols.append(
                F.expr(f"try_cast({f.name} AS {f.dataType.simpleString()})").alias(
                    f.name
                )
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
