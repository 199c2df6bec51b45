"""CCNet-shape text normalization (functions/textnorm.py): semantics,
accent-map alignment, cross-engine twin equality, map-only plan."""

import unicodedata

import duckdb
import pandas as pd

from olake_spark.functions.textnorm import (
    _ACC_DST,
    _ACC_SRC,
    normalize_documents,
    normalize_documents_sql,
    normalize_text_col,
)

ROWS = [
    (1, "Thé QUICK Brown Fox — born in 1987…"),
    (2, "“Curly” ‘quotes’ and — dashes – here"),
    (3, "zero​width﻿chars and\x07control\x1fchars"),
    (4, None),
    (5, ""),
    (6, "çàfé ñoño ÄÖÜ ŠKODA žůžo"),
    (7, "  runs   of   spaces  "),
    (8, "don’t « guillemets » stay? ―yes"),
    (9, "Digits 2026-08-21 12:34 and №№ stay-weird chars untouched"),
]


def test_accent_map_is_nfd_aligned():
    assert len(_ACC_SRC) == len(_ACC_DST)
    special = {"ß": "s", "þ": "t", "ð": "d", "ø": "o"}
    for s, d in zip(_ACC_SRC, _ACC_DST):
        want = special.get(s) or unicodedata.normalize("NFD", s)[0]
        assert d == want, (s, d, want)


def test_semantics(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_documents(df).collect()}
    assert got[1]["normalized_text"] == "the quick brown fox - born in 0000."
    assert got[2]["normalized_text"] == '"curly" \'quotes\' and - dashes - here'
    assert got[3]["normalized_text"] == "zerowidthchars andcontrolchars"
    assert got[4]["normalized_text"] is None
    assert got[4]["norm_fingerprint"] is None
    assert got[6]["normalized_text"] == "cafe nono aou skoda zuzo"
    assert got[7]["normalized_text"] == "runs of spaces"
    assert got[8]["normalized_text"] == "don't \" guillemets \" stay? -yes"
    # normalization-insensitive dedup: case/accents/digits variants share
    # one fingerprint
    v = spark.createDataFrame(
        [(1, "The Quick Fox 1987"), (2, "thé quick fox 2024"),
         (3, "THE QUICK FOX 0000"), (4, "the slow fox 0000")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["norm_fingerprint"]
           for r in normalize_documents(v).collect()}
    assert fps[1] == fps[2] == fps[3] != fps[4]


def test_cross_engine_twin(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = (
        normalize_documents(df)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    want = (
        con.sql(normalize_documents_sql("SELECT * FROM d"))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.astype(str).equals(want.astype(str)), got.compare(want)


def test_map_only_plan(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = (
        df.select(normalize_text_col("text"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_all_whitespace_folds_to_one_fingerprint(spark):
    # REGRESSION (review finding): tab/newline/CR variants previously kept
    # their characters and fingerprinted apart from the space variant
    import duckdb as _dd
    import pandas as _pd

    rows = [(1, "a b c"), (2, "a\tb c"), (3, "a\nb c"),
            (4, "a\r\nb  c"), (5, "a\x0bb\x0cc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_documents(df).collect()}
    assert len({r["norm_fingerprint"] for r in got.values()}) == 1
    assert got[3]["normalized_text"] == "a b c"
    con = _dd.connect()
    con.register("d", _pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = con.sql(normalize_documents_sql("SELECT * FROM d")).df()
    assert set(want["norm_fingerprint"]) == {got[1]["norm_fingerprint"]}
