"""Domain-mixture sampling (functions/curate.py mix_domains): exact
epoch/tail arithmetic on a planted corpus, upsampling + downsampling in
one call, determinism across partitionings, DuckDB twin equality, the
validation contract, and the no-shuffle plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from olake_spark.functions.curate import (hash_bucket_col, mix_domains,
                                          mix_domains_sql)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def corpus(spark):
    # web: 80 rows, books: 10, code: 10 — mixing to 50/30/20 of 100 rows
    # forces web DOWN (50 of 80), books UP (30 of 10 = 3 epochs exactly),
    # code UP with a tail (20 of 10 = 2 epochs, no tail)
    rows = [(f"w{i}", "web") for i in range(80)]
    rows += [(f"b{i}", "books") for i in range(10)]
    rows += [(f"c{i}", "code") for i in range(10)]
    return spark.createDataFrame(rows, ["key", "domain"])


WEIGHTS = {"web": 500_000, "books": 300_000, "code": 200_000}


class TestMixDomains:
    def test_epoch_arithmetic_exact(self, spark, corpus):
        out = mix_domains(corpus, "domain", "key", WEIGHTS, total_rows=100)
        per = {r["domain"]: r["n"] for r in
               out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
        # books/code upsample by whole epochs → EXACT counts; web's 50/80
        # tail is a hash draw at rate 625000 ppm → binomially near 50
        assert per["books"] == 30 and per["code"] == 20
        assert 30 <= per["web"] <= 70
        epochs = {r["domain"]: r["m"] for r in
                  out.groupBy("domain").agg(F.max("epoch").alias("m"))
                  .collect()}
        assert epochs == {"web": 0, "books": 2, "code": 1}
        # every key of an upsampled domain appears in every epoch
        b = out.filter("domain = 'books'").groupBy("key").count().collect()
        assert all(r["count"] == 3 for r in b)

    def test_deterministic_across_partitionings(self, spark, corpus):
        a = sorted((r["key"], r["epoch"]) for r in
                   mix_domains(corpus, "domain", "key", WEIGHTS,
                               total_rows=100).collect())
        b = sorted((r["key"], r["epoch"]) for r in
                   mix_domains(corpus.repartition(13, "key"), "domain",
                               "key", WEIGHTS, total_rows=100).collect())
        assert a == b and len(a) > 0

    def test_unlisted_domain_dropped_and_validation(self, spark, corpus):
        extra = corpus.union(
            spark.createDataFrame([("x1", "junk")], ["key", "domain"])
        )
        out = mix_domains(extra, "domain", "key", WEIGHTS, total_rows=100)
        assert out.filter("domain = 'junk'").count() == 0
        with pytest.raises(ValueError, match="sum"):
            mix_domains(corpus, "domain", "key", {"web": 1}, total_rows=10)
        with pytest.raises(ValueError, match="no rows"):
            mix_domains(corpus, "domain", "key",
                        {"web": 500_000, "absent": 500_000}, total_rows=10)

    def test_duckdb_twin_bit_equal(self, spark, corpus, tmp_path):
        pq = str(tmp_path / "corpus.parquet")
        corpus.coalesce(1).write.parquet(pq)
        got = (mix_domains(corpus, "domain", "key", WEIGHTS, total_rows=100)
               .orderBy("key", "epoch").toPandas())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW corpus AS SELECT * "
                    f"FROM read_parquet('{pq}/*.parquet')")
        want = con.execute(
            mix_domains_sql("corpus", "domain", "key", WEIGHTS,
                            total_rows=100)
        ).df().sort_values(["key", "epoch"]).reset_index(drop=True)
        assert list(got.columns) == list(want.columns)
        assert len(got) == len(want)
        for c in got.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all()

    def test_default_total_is_listed_domains_size(self, spark, corpus):
        out = mix_domains(corpus, "domain", "key", WEIGHTS)
        n = out.count()
        assert 85 <= n <= 102  # target 100 (=80+10+10), hash-tail jitter

    def test_corpus_is_never_shuffled(self, spark, corpus):
        plan = plan_of(
            mix_domains(corpus, "domain", "key", WEIGHTS, total_rows=100)
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Generate" in plan  # the epoch explode
        # the only exchange feeds the broadcast of the tiny rates side
        assert "Exchange hashpartitioning" not in plan
