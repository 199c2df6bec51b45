r"""Type-promotion lattice — the reference's weighted typecast tree.

The reference resolves type conflicts (heterogeneous values seen for one
field across a batch, or a re-discovered source schema that drifted) by
walking a weighted BST to the lowest common ancestor
(utils/typeutils/fields.go:18-47 `typecastTree`, fields.go:248-284
`GetCommonAncestorType`; weights types/data_types.go:45-56):

             5 String
            /        \
       3 Float64      9 TimestampNano
        /      \           /
    2 Int64   4 Float32  8 TimestampMicro
      /                    /
   1 Int32              7 TimestampMilli
     /                    /
  0 Bool               6 Timestamp

Any numeric × timestamp conflict resolves to String (the root); Bool <
Int32 < Int64 < Float64 < String; the four timestamp precisions form their
own chain. Two layers consume it here:

- **batch-level** (`merge_schemas`): Fields.Merge parity — infer one write
  schema from conflicting record schemas before a write; the full lattice
  applies (a long-vs-string conflict becomes string, matching the
  reference's ingest behavior).
- **table-level** (`Table.evolve_schema`): committed parquet files cannot be
  re-typed, so only promotions Spark's parquet reader can serve on old files
  are legal — int→long and float→double, exactly Iceberg's schema-evolution
  widening rule; anything wider raises and must be handled at ingest.
"""

from __future__ import annotations

from pyspark.sql.types import (BooleanType, DataType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType, TimestampType)

# (name, weight) per the reference's TypeWeights (data_types.go:45-56)
WEIGHTS = {
    "bool": 0,
    "int32": 1,
    "int64": 2,
    "float64": 3,
    "float32": 4,
    "string": 5,
    "timestamp": 6,
    "timestamp_milli": 7,
    "timestamp_micro": 8,
    "timestamp_nano": 9,
}

# the typecast tree: name -> (left_child, right_child), fields.go:18-47
_TREE: dict[str, tuple[str | None, str | None]] = {
    "string": ("float64", "timestamp_nano"),
    "float64": ("int64", "float32"),
    "int64": ("int32", None),
    "int32": ("bool", None),
    "bool": (None, None),
    "float32": (None, None),
    "timestamp_nano": ("timestamp_micro", None),
    "timestamp_micro": ("timestamp_milli", None),
    "timestamp_milli": ("timestamp", None),
    "timestamp": (None, None),
}

_ROOT = "string"


def promote(t1: str, t2: str) -> str:
    """Lowest common ancestor of two lattice types — the reference's
    GetCommonAncestorType (fields.go:248-284). Unknown names resolve to the
    current node (the reference returns the walk position), i.e. String."""
    node = _ROOT
    w1, w2 = WEIGHTS.get(t1), WEIGHTS.get(t2)
    while node is not None:
        if w1 is None or w2 is None:
            return node
        wn = WEIGHTS[node]
        left, right = _TREE[node]
        if w1 > wn and w2 > wn:
            node = right
        elif w1 < wn and w2 < wn:
            node = left
        else:
            return node
    return _ROOT


_SPARK_TO_LATTICE: dict[type, str] = {
    BooleanType: "bool",
    IntegerType: "int32",
    LongType: "int64",
    FloatType: "float32",
    DoubleType: "float64",
    StringType: "string",
    # Spark timestamps are micros; the reference's four precision rungs all
    # land on this physical type
    TimestampType: "timestamp_micro",
}

_LATTICE_TO_SPARK: dict[str, DataType] = {
    "bool": BooleanType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "float32": FloatType(),
    "float64": DoubleType(),
    "string": StringType(),
    "timestamp": TimestampType(),
    "timestamp_milli": TimestampType(),
    "timestamp_micro": TimestampType(),
    "timestamp_nano": TimestampType(),
}


def promote_spark(dt1: DataType, dt2: DataType) -> DataType:
    """LCA over Spark types. Types outside the lattice (binary, arrays,
    structs) promote only to themselves — a conflict there is a hard error
    at the caller (the reference's lattice covers scalars only)."""
    if dt1 == dt2:
        return dt1
    n1 = _SPARK_TO_LATTICE.get(type(dt1))
    n2 = _SPARK_TO_LATTICE.get(type(dt2))
    if n1 is None or n2 is None:
        raise TypeError(
            f"no promotion between non-scalar types {dt1.simpleString()} and "
            f"{dt2.simpleString()}"
        )
    return _LATTICE_TO_SPARK[promote(n1, n2)]


def merge_schemas(s1: StructType, s2: StructType) -> StructType:
    """Fields.Merge parity (fields.go:286-296): union-by-name; a field seen
    with two types takes their lattice LCA; every merged field is nullable
    (a field absent from one side is null there). Field order: s1's fields
    first, then s2-only fields in s2 order — deterministic."""
    by_name = {f.name: f.dataType for f in s1.fields}
    order = [f.name for f in s1.fields]
    for f in s2.fields:
        if f.name in by_name:
            by_name[f.name] = promote_spark(by_name[f.name], f.dataType)
        else:
            by_name[f.name] = f.dataType
            order.append(f.name)
    return StructType([StructField(n, by_name[n], True) for n in order])


# promotions committed parquet files can serve under Spark's reader without
# a rewrite — exactly Iceberg's legal schema-evolution widenings
LEGAL_TABLE_WIDENINGS = {
    ("int32", "int64"),
    ("float32", "float64"),
}


def is_legal_table_widening(cur: DataType, new: DataType) -> bool:
    n1 = _SPARK_TO_LATTICE.get(type(cur))
    n2 = _SPARK_TO_LATTICE.get(type(new))
    return (n1, n2) in LEGAL_TABLE_WIDENINGS
