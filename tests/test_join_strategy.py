"""The north star's 'broadcast-or-sort-merge join against equality-delete
reconciliation': small delete sets broadcast, large ones sort-merge — both
sides of the threshold proven in the physical plan."""

import os

import olake_spark.icelite.table as tablemod
from olake_spark import datagen
from olake_spark.icelite import Table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestReconciliationJoinStrategy:
    def test_threshold_switches_join(self, spark, tmp_table_dir, monkeypatch):
        t = Table.create(
            spark, os.path.join(tmp_table_dir, "join"), datagen.IMAGES_SCHEMA,
            identifier_fields=("image_id",),
        )
        t.append(datagen.gen_images_df(spark, 100))
        keys = spark.createDataFrame(
            [(f"img-{i:012d}",) for i in range(30)], ["image_id"]
        )
        t.row_delta(None, keys)

        plan_small = _plan(t.scan())
        assert "BroadcastHashJoin" in plan_small

        # force the delete set over OUR threshold (drops the broadcast hint)
        # and disable Catalyst's size-based auto-broadcast, which would still
        # fire at toy scale — at real delete-set sizes it wouldn't
        monkeypatch.setattr(tablemod, "BROADCAST_DELETE_ROWS", 10)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan_large = _plan(t.scan())
            assert (
                "SortMergeJoin" in plan_large or "ShuffledHashJoin" in plan_large
            )
            assert "BroadcastHashJoin" not in plan_large
            # both strategies produce identical results
            assert t.scan().count() == 70
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
