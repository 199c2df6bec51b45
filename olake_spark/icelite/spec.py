"""Partition spec + transforms (identity/bucket/truncate/year/month/day/hour).

Same transform vocabulary as the reference's Iceberg writer
(IcebergUtil.java:154-198; regex parse destination/iceberg/iceberg_utils.go:146-167).
Transforms are Catalyst expressions (JVM-side, codegen'd) — partition values
are materialized as hidden ``_p_*`` columns encoded into directory paths by
the writer, so scans reconstitute them for free via Spark partition discovery.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PartitionField:
    source: str  # source column name
    transform: str  # identity|bucket|truncate|year|month|day|hour
    n: int = 0  # bucket count / truncate width

    @property
    def name(self) -> str:
        if self.transform == "identity":
            return f"_p_{self.source}"
        if self.transform in ("bucket", "truncate"):
            return f"_p_{self.source}_{self.transform}{self.n}"
        return f"_p_{self.source}_{self.transform}"

    def expr(self) -> Column:
        c = F.col(self.source)
        t = self.transform
        if t == "identity":
            return c
        if t == "bucket":
            # From-scratch bucketing: xxhash64 pmod n (not Iceberg's murmur3 —
            # we own both write and read sides, only consistency matters).
            return F.pmod(F.xxhash64(c), F.lit(self.n)).cast("int")
        if t == "truncate":
            return self._truncate(c)
        if t == "year":
            return F.year(c)
        if t == "month":
            return F.date_format(c, "yyyy-MM")
        if t == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if t == "hour":
            return F.date_format(c, "yyyy-MM-dd-HH")
        raise ValueError(f"unknown transform {t}")

    def _truncate(self, c: Column) -> Column:
        # integer truncate: floor-div to width; string truncate: prefix
        return F.when(
            c.cast("long").isNotNull(),
            (F.floor(c.cast("long") / self.n) * self.n).cast("long").cast("string"),
        ).otherwise(F.substring(c.cast("string"), 1, self.n))

    def to_json(self) -> dict:
        return {"source": self.source, "transform": self.transform, "n": self.n}

    @staticmethod
    def from_json(d: dict) -> "PartitionField":
        return PartitionField(d["source"], d["transform"], d.get("n", 0))


@dataclass(frozen=True)
class PartitionSpec:
    fields: tuple[PartitionField, ...] = field(default_factory=tuple)

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def apply(self, df: DataFrame) -> DataFrame:
        """Materialize hidden partition columns on a DataFrame."""
        for f in self.fields:
            df = df.withColumn(f.name, f.expr())
        return df

    def to_json(self) -> list[dict]:
        return [f.to_json() for f in self.fields]

    @staticmethod
    def from_json(lst: list[dict]) -> "PartitionSpec":
        return PartitionSpec(tuple(PartitionField.from_json(d) for d in lst))


UNPARTITIONED = PartitionSpec(())
