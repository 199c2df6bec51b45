"""`check` / `discover` equivalents (SURVEY.md §3.2-3.3).

The reference's `check` verb validates destination connectivity by writing a
test record end-to-end (destination/iceberg/iceberg.go:145-185); `discover`
emits stream schemas. Here:

- `preflight(spark, warehouse)`: create a scratch icelite table, write one
  row, scan it back, drop it — proves the session + warehouse path can
  complete a full commit cycle.
- `discover(spark, warehouse)`: list tables under a warehouse root with
  their schemas and identifier fields (spark.table(...).schema equivalent).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from olake_spark.icelite import Table

_CHECK_SCHEMA = StructType(
    [StructField("id", LongType(), False), StructField("msg", StringType())]
)


def preflight(spark: SparkSession, warehouse: str) -> dict:
    os.makedirs(warehouse, exist_ok=True)
    scratch = os.path.join(warehouse, f"_preflight_{uuid.uuid4().hex[:8]}")
    try:
        t = Table.create(spark, scratch, _CHECK_SCHEMA, identifier_fields=("id",))
        t.append(spark.createDataFrame([(1, "olake-spark check")], _CHECK_SCHEMA))
        rows = t.scan().collect()
        ok = len(rows) == 1 and rows[0]["msg"] == "olake-spark check"
        return {"ok": ok, "warehouse": warehouse}
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def discover(spark: SparkSession, warehouse: str) -> list[dict]:
    out = []
    if not os.path.isdir(warehouse):
        return out
    for name in sorted(os.listdir(warehouse)):
        root = os.path.join(warehouse, name)
        if not os.path.isdir(os.path.join(root, "metadata")):
            continue
        t = Table.load(spark, root)
        out.append(
            {
                "table": name,
                "schema": [
                    {"name": f.name, "type": f.dataType.simpleString()}
                    for f in t.schema.fields
                ],
                "identifier_fields": t.identifier_fields,
                "partition_spec": t.spec.to_json(),
                "current_snapshot_id": t.current_snapshot_id,
                "total_records": t.total_records(),
            }
        )
    return out
