"""Model-based mutation fuzz: a seeded random sequence of every row-set
mutation the table supports — append, positional delete, MoR update, MERGE
upsert, dynamic partition overwrite, truncate — interleaved with rewrites
that must be invisible (compaction), checked against a plain-dict model
after every step, plus time-travel spot checks against model history.
"""

import os
import random

import pytest
from pyspark.sql import functions as F

from olake_spark import datagen
from olake_spark.icelite import PartitionField, PartitionSpec, Table
from olake_spark.operators.compact import run_compaction
from olake_spark.operators.merge import merge_into

NUM = "cast(substring(image_id, 5, 12) as bigint)"


def _key(i: int) -> str:
    return f"img-{i:012d}"


def _fmt(i: int) -> str:
    return "jpeg" if i % 4 == 0 else "png"


def _rows(spark, ids, caption):
    if not ids:
        return None
    return (
        datagen.gen_images_df(spark, max(ids) + 1)
        .filter(F.expr(NUM).isin(list(ids)))
        .withColumn("caption", F.lit(caption))
    )


@pytest.mark.parametrize("seed", [11, 23])
def test_mutation_sequence_matches_model(spark, tmp_table_dir, seed):
    rng = random.Random(seed)
    t = Table.create(
        spark, os.path.join(tmp_table_dir, f"fuzz{seed}"),
        datagen.IMAGES_SCHEMA,
        PartitionSpec((PartitionField("fmt", "identity"),)),
        identifier_fields=("image_id",),
    )
    model: dict[str, str] = {}  # image_id -> caption
    history: list[tuple[int, dict[str, str]]] = []  # (snapshot_id, model)

    def check(step):
        got = {
            r["image_id"]: r["caption"]
            for r in t.scan(columns=["image_id", "caption"]).collect()
        }
        assert got == model, (
            f"step {step}: {len(got)} rows vs model {len(model)}; "
            f"diff keys: {sorted(set(got) ^ set(model))[:5]}"
        )
        assert t.count_rows() == len(model)

    next_id = 0
    for step in range(18):
        # re-roll inapplicable ops so every step mutates or rewrites —
        # delete/update/truncate need rows to act on
        while True:
            op = rng.choice(
                ["append", "append", "delete", "update", "upsert",
                 "overwrite", "compact", "truncate"]
            )
            if op in ("delete", "update", "truncate") and not model:
                continue
            break
        cap = f"s{step}"
        if op == "append":
            ids = list(range(next_id, next_id + rng.randint(3, 12)))
            next_id = ids[-1] + 1
            t.append(_rows(spark, ids, cap), max_records_per_file=4)
            model.update({_key(i): cap for i in ids})
        elif op == "delete":
            victims = rng.sample(sorted(model), min(len(model),
                                                    rng.randint(1, 6)))
            nums = [int(v[4:]) for v in victims]
            t.delete_where(F.expr(NUM).isin(nums))
            for v in victims:
                model.pop(v)
        elif op == "update":
            pick = rng.sample(sorted(model), min(len(model),
                                                 rng.randint(1, 5)))
            nums = [int(v[4:]) for v in pick]
            t.update_where(
                F.expr(NUM).isin(nums), {"caption": f"'{cap}'"}
            )
            for v in pick:
                model[v] = cap
        elif op == "upsert":
            # half existing keys, half fresh — MERGE latest-wins
            old = rng.sample(sorted(model), min(len(model), 3))
            fresh = list(range(next_id, next_id + 3))
            next_id = fresh[-1] + 1
            ids = sorted({int(v[4:]) for v in old} | set(fresh))
            ch = _rows(spark, ids, cap).withColumn(
                "_op_type", F.lit("u")
            ).withColumn(
                "_cdc_timestamp", F.expr("current_timestamp()")
            ).withColumn("_olake_timestamp", F.expr("current_timestamp()"))
            merge_into(t, ch, keep_deletes=False)
            model.update({_key(i): cap for i in ids})
        elif op == "overwrite":
            fmt = rng.choice(["jpeg", "png"])
            ids = list(range(next_id, next_id + 8))
            next_id = ids[-1] + 1
            repl_ids = [i for i in ids if _fmt(i) == fmt]
            t.overwrite_partitions(_rows(spark, repl_ids, cap))
            model = {
                k: v for k, v in model.items()
                if _fmt(int(k[4:])) != fmt
            }
            model.update({_key(i): cap for i in repl_ids})
        elif op == "compact":
            run_compaction(t, f"fz{step}", fill_ratio=1.0)
        elif op == "truncate":
            t.truncate()
            model = {}
        check(step)
        if t.current_snapshot_id is not None:
            # scan(snapshot_id=None) would read CURRENT state — recording
            # pre-first-commit steps would make the check vacuous
            history.append((t.current_snapshot_id, dict(model)))

    # time-travel spot checks: three random historical snapshots must
    # reproduce the model AS OF that commit
    assert len(history) >= 3
    for snap_id, past in rng.sample(history, 3):
        got = {
            r["image_id"]: r["caption"]
            for r in t.scan(
                columns=["image_id", "caption"], snapshot_id=snap_id
            ).collect()
        }
        assert got == past, f"time travel to {snap_id} diverged"
