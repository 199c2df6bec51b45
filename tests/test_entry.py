"""Local replica of the driver's correctness gate: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet fixtures,
compare row count + schema (column names) + order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("OLAKE_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _duck(sql: str):
    con = duckdb.connect()
    for t in entrymod.ALL_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    rel = con.sql(sql)
    # fetch through pandas like the driver's typed-value hash does — this is
    # what exposes e.g. DuckDB HUGEINT widening (sum(BIGINT)→int128→float64)
    # that plain fetchall() hides by returning Python ints
    pdf = rel.fetchdf()
    cols = list(pdf.columns)
    rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    con.close()
    return cols, rows


def _norm(v):
    import numpy as np

    if isinstance(v, (np.integer,)):
        v = int(v)
    elif isinstance(v, (np.floating,)):
        v = float(v)
    elif isinstance(v, np.bool_):
        v = bool(v)
    # tag the python type: the driver hashes TYPED values, so an int column
    # that comes back float (or vice versa) must fail locally too
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    return ("o", v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    got_df = QUERIES[name](spark, SF_DIR)
    got_cols = got_df.columns
    got_rows = [tuple(r) for r in got_df.collect()]

    exp_cols, exp_rows = _duck(ORACLES[name])

    assert sorted(got_cols) == sorted(exp_cols), f"{name}: column names differ"
    assert len(got_rows) == len(exp_rows), (
        f"{name}: row count {len(got_rows)} != oracle {len(exp_rows)}"
    )
    g, e = _rowset(got_cols, got_rows), _rowset(exp_cols, exp_rows)
    mismatches = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
    assert not mismatches, (
        f"{name}: first mismatch at {mismatches[0]}: "
        f"got {g[mismatches[0]]} want {e[mismatches[0]]}"
    )


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) - set(ORACLES))
)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == entrymod.pipeline.SCAN_COLS
