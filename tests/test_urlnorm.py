"""URL canonicalization + URL dedup (functions/urlnorm.py): planted variant
groups, the exact canonical strings, DuckDB twin equality, and the
single-exchange plan shape."""

import duckdb
import pandas as pd
import pytest

from olake_spark.functions.urlnorm import (
    canonical_url_col,
    canonical_url_sql,
    dedup_by_url,
    dedup_by_url_sql,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


VARIANTS = [
    # one page, eight spellings → one canonical form
    (0, "http://Example.com/a/b"),
    (1, "https://example.com/a/b"),
    (2, "HTTPS://www.example.com/a/b"),
    (3, "http://example.com:80/a/b/"),
    (4, "https://example.com:443/a/b"),
    (5, "  http://example.com/a/b#section-2  "),
    (6, "http://example.com/a/b?utm_source=x&utm_campaign=y"),
    (7, "http://example.com/a/b?fbclid=123&gclid=9"),
    # same page with real params in either order → one canonical form
    (8, "http://example.com/a/b?b=2&a=1"),
    (9, "https://www.example.com/a/b?a=1&utm_medium=z&b=2#x"),
    # different pages
    (10, "http://example.com/a/B"),       # path case matters
    (11, "http://example.org/a/b"),
    (12, "http://example.com:8080/a/b"),  # non-default port kept
    (13, None),
    (14, ""),
    # bare ref carries content (e.g. ?ref=<branch>) — NOT stripped
    (15, "http://example.com/tree?ref=main"),
    (16, "http://example.com/tree?ref=dev"),
]


class TestCanonical:
    def test_planted_variants(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        got = {
            r["doc_id"]: r["c"]
            for r in df.select(
                "doc_id", canonical_url_col("url").alias("c")
            ).collect()
        }
        for d in range(8):
            assert got[d] == "example.com/a/b", (d, got[d])
        assert got[8] == got[9] == "example.com/a/b?a=1&b=2"
        assert got[10] == "example.com/a/B"
        assert got[11] == "example.org/a/b"
        assert got[12] == "example.com:8080/a/b"
        assert got[13] is None
        assert got[14] == ""
        # ref is content, not tracking: distinct pages stay distinct
        assert got[15] == "example.com/tree?ref=main"
        assert got[16] == "example.com/tree?ref=dev"
        assert got[15] != got[16]

    def test_matches_duckdb(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        got = {
            r["doc_id"]: r["c"]
            for r in df.select(
                "doc_id", canonical_url_col("url").alias("c")
            ).collect()
        }
        con = duckdb.connect()
        con.register(
            "src", pd.DataFrame(VARIANTS, columns=["doc_id", "url"])
        )
        want = dict(
            con.execute(
                f"SELECT doc_id, {canonical_url_sql('url')} FROM src"
            ).fetchall()
        )
        assert got == want

    def test_map_only(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        out = df.select(canonical_url_col("url"))
        plan = plan_of(out)
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


class TestDedup:
    def test_owner_election(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        rows = {r["doc_id"]: r for r in dedup_by_url(df).collect()}
        # the eight-spelling group keeps only doc 0
        for d in range(8):
            assert rows[d]["keep"] == (1 if d == 0 else 0), d
        assert rows[8]["keep"] == 1 and rows[9]["keep"] == 0
        # singletons, NULL/empty, and ref-distinct pages all kept
        for d in (10, 11, 12, 13, 14, 15, 16):
            assert rows[d]["keep"] == 1, d

    def test_matches_duckdb(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        got = {tuple(r) for r in dedup_by_url(df).collect()}
        con = duckdb.connect()
        con.register(
            "src", pd.DataFrame(VARIANTS, columns=["doc_id", "url"])
        )
        want = {
            tuple(r)
            for r in con.execute(
                dedup_by_url_sql("SELECT doc_id, url FROM src")
            ).fetchall()
        }
        assert got == want

    def test_single_exchange_window(self, spark):
        df = spark.createDataFrame(VARIANTS, "doc_id long, url string")
        out = dedup_by_url(df)
        out.collect()
        plan = plan_of(out)
        assert "Join" not in plan, plan
        import re

        keys = set(
            re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
        )
        assert keys == {"canonical_url"}, plan


class TestBlocklist:
    BLOCK = ["evil.com", "Tracker.NET"]

    CASES = [
        (1, "http://evil.com/a"),            # exact
        (2, "https://www.evil.com/b"),       # subdomain via www
        (3, "http://deep.sub.evil.com/c"),   # deep subdomain
        (4, "http://notevil.com/d"),         # NOT a label suffix
        (5, "http://evil.com.safe.org/e"),   # suffix labels differ
        (6, "HTTP://TRACKER.net:8080/f"),    # case + port
        (7, "http://fine.org/g"),
        (8, None),
    ]

    def test_planted(self, spark):
        from olake_spark.functions.urlnorm import flag_blocked_hosts

        df = spark.createDataFrame(self.CASES, "doc_id long, url string")
        rows = {
            r["doc_id"]: r
            for r in flag_blocked_hosts(df, self.BLOCK).collect()
        }
        assert [rows[d]["blocked"] for d in range(1, 9)] == [
            1, 1, 1, 0, 0, 1, 0, 0,
        ]
        assert rows[3]["host"] == "deep.sub.evil.com"
        assert rows[8]["host"] is None

    def test_matches_duckdb(self, spark):
        from olake_spark.functions.urlnorm import (
            flag_blocked_hosts, flag_blocked_hosts_sql,
        )

        df = spark.createDataFrame(self.CASES, "doc_id long, url string")
        got = {tuple(r) for r in flag_blocked_hosts(df, self.BLOCK).collect()}
        con = duckdb.connect()
        con.register(
            "src", pd.DataFrame(self.CASES, columns=["doc_id", "url"])
        )
        want = {
            tuple(r)
            for r in con.execute(
                flag_blocked_hosts_sql(
                    "SELECT doc_id, url FROM src", self.BLOCK
                )
            ).fetchall()
        }
        assert got == want

    def test_map_only(self, spark):
        from olake_spark.functions.urlnorm import flag_blocked_hosts

        df = spark.createDataFrame(self.CASES, "doc_id long, url string")
        plan = plan_of(flag_blocked_hosts(df, self.BLOCK))
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan

    def test_empty_blocklist_blocks_nothing(self, spark):
        # regression: the old literal-array placeholder matched the
        # empty-host row's [''] suffix set
        from olake_spark.functions.urlnorm import (
            flag_blocked_hosts, flag_blocked_hosts_sql,
        )

        cases = self.CASES + [(9, ""), (10, "?q=1")]
        df = spark.createDataFrame(cases, "doc_id long, url string")
        for bl in ([], ["", "  "]):
            out = flag_blocked_hosts(df, bl)
            assert [r["blocked"] for r in out.collect()] == [0] * len(cases)
            con = duckdb.connect()
            con.register(
                "src", pd.DataFrame(cases, columns=["doc_id", "url"])
            )
            rows = con.execute(
                flag_blocked_hosts_sql("SELECT doc_id, url FROM src", bl)
            ).fetchall()
            assert [int(r[2]) for r in rows] == [0] * len(cases)
