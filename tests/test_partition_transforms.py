"""Partition-spec transforms: identity/bucket/truncate/year/month/day/hour —
the reference's full transform vocabulary (IcebergUtil.java:154-198,
iceberg_utils.go:146-167)."""

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField, StructType,
                               TimestampType)

from olake_spark.icelite import PartitionField, PartitionSpec, Table

EVENTS = StructType(
    [
        StructField("id", LongType(), False),
        StructField("ts", TimestampType()),
        StructField("name", StringType()),
    ]
)


def _df(spark, n=100):
    return spark.range(n).select(
        F.col("id"),
        F.expr(
            "timestampadd(HOUR, cast(id as int), TIMESTAMP '2026-03-01 00:00:00')"
        ).alias("ts"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )


class TestTransforms:
    def test_day_partitioning_routes_and_prunes(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "days"), EVENTS,
            PartitionSpec((PartitionField("ts", "day"),)),
        )
        t.append(_df(spark, 96))  # 4 days of hourly rows
        parts = {
            e.partition["_p_ts_day"] for e in t.entries() if e.content == 0
        }
        assert parts == {"2026-03-01", "2026-03-02", "2026-03-03", "2026-03-04"}
        one_day = t.scan(with_partition_cols=True).filter(
            F.col("_p_ts_day") == "2026-03-02"
        )
        assert one_day.count() == 24

    def test_hour_month_year_values(self, spark, tmp_table_dir):
        for transform, expected_first in (
            ("hour", "2026-03-01-00"),
            ("month", "2026-03"),
            ("year", "2026"),
        ):
            t = Table.create(
                spark,
                os.path.join(tmp_table_dir, f"tr-{transform}"),
                EVENTS,
                PartitionSpec((PartitionField("ts", transform),)),
            )
            t.append(_df(spark, 3))
            parts = sorted(
                str(e.partition[f"_p_ts_{transform}"])
                for e in t.entries() if e.content == 0
            )
            assert parts[0] == expected_first

    def test_truncate_string_and_int(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "trunc"), EVENTS,
            PartitionSpec((PartitionField("id", "truncate", 50),)),
        )
        t.append(_df(spark, 100))
        parts = {e.partition["_p_id_truncate50"] for e in t.entries() if e.content == 0}
        assert parts == {"0", "50"}
        assert t.scan(with_partition_cols=True).filter(
            F.col("_p_id_truncate50") == "50"
        ).count() == 50
