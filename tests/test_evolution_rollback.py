"""Schema evolution (union-by-name add) + snapshot rollback."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField

from olake_spark import datagen
from olake_spark.icelite import Table
from olake_spark.operators.compact import run_compaction


class TestSchemaEvolution:
    def test_added_column_null_for_old_files(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "evo"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 40))
        t.add_columns([StructField("license", StringType(), True)])
        # old files surface null; new writes carry the column
        assert t.scan().filter(F.col("license").isNull()).count() == 40
        t.append(
            datagen.gen_images_df(spark, 10)
            .withColumn("image_id", F.concat(F.lit("n-"), F.col("image_id")))
            .withColumn("license", F.lit("cc0"))
        )
        assert t.scan().filter(F.col("license") == "cc0").count() == 10
        assert t.scan().count() == 50
        # idempotent + rejects non-nullable
        t.add_columns([StructField("license", StringType(), True)])
        with pytest.raises(ValueError):
            t.add_columns([StructField("must", StringType(), False)])


class TestRollback:
    def test_rollback_undoes_compaction(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "rb"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        datagen.fragmented_append(t, datagen.gen_images_df(spark, 100), 100,
                                  n_files=10)
        before_files = {e.file_path for e in t.entries()}
        snap0 = t.current_snapshot_id
        run_compaction(t, "rb", fill_ratio=1.0, target_bytes=1 << 21)
        assert {e.file_path for e in t.entries()} != before_files
        t.rollback_to(snap0)
        assert {e.file_path for e in t.entries()} == before_files
        assert t.scan().count() == 100
        # once the compaction snapshot expires, its files become orphans
        t.expire_snapshots(keep_last=1)
        orphans = t.remove_orphan_files(grace_seconds=0, dry_run=True)
        assert len(orphans) > 0
        assert t.scan().count() == 100  # live data untouched by the reap plan

    def test_rollback_to_expired_snapshot_fails(self, spark, tmp_table_dir):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "rb2"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 10))
        snap0 = t.current_snapshot_id
        t.append(datagen.gen_images_df(spark, 5).withColumn(
            "image_id", F.concat(F.lit("x-"), F.col("image_id"))))
        t.expire_snapshots(keep_last=1)
        with pytest.raises(KeyError):
            t.rollback_to(snap0)
