"""Gopher repetition rules — the second half of the Gopher document filter
(Rae et al. 2021, appendix A1.1, "repetition removal"): documents whose
content is dominated by repeated lines, paragraphs, or n-grams are low-value
scrape artifacts (nav bars, keyword stuffing, templated pages) and are
removed before training. The quality half (word counts, symbol ratios,
bullet/ellipsis lines) lives in :mod:`olake_spark.functions.text`
(``gopher_rules_cols``); this module adds the 13 repetition signals of
Table A1:

- duplicate line / paragraph fraction (instances beyond the first, over all
  instances), and the character-weighted variants (characters inside those
  duplicate instances, over all line/paragraph characters);
- top n-gram character fraction for n = 2, 3, 4: characters covered by the
  single most frequent word n-gram (count x n-gram length, over document
  length), ties broken to the lexicographically smallest n-gram;
- duplicate n-gram character fraction for n = 5..10: characters inside
  n-gram instances beyond the first occurrence (count-weighted, the
  non-overlap-aware variant — overlapping instances each contribute their
  full length, so the ratio is capped at 100%).

Everything is pure Catalyst (whole-stage codegen, map-only: the duplicate
metrics sort the per-document array and charge adjacent equal pairs — an
``O(n log n)`` ``array_sort`` plus one ``zip_with`` per document; the top
n-gram is one ``aggregate`` fold over the sorted array, so a 100k-word
document costs a sort, never a quadratic scan or a shuffle). Each builder
has a DuckDB SQL twin generated from the same integer-ppm definition; the
twin's mode search is the O(n^2) distinct-count formulation — fine for an
oracle, identical arithmetic.

Ratios are parts-per-million BIGINTs capped at 1e6; a zero denominator
yields 0; NULL text propagates NULL. Reference parity: not present in the
reference (it moves rows, it doesn't read them) — this is the repo's
LLM-data-pipeline layer, same contract as ``text.gopher_rules_cols``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PPM = 1_000_000

# published Gopher appendix-A1.1 thresholds (real corpora); test fixtures
# and the gate pass tighter overrides that discriminate on their short
# synthetic documents
REPETITION_DEFAULTS = dict(
    max_dup_line_ppm=300_000,        # ≤30% duplicate lines
    max_dup_para_ppm=300_000,        # ≤30% duplicate paragraphs
    max_dup_line_char_ppm=200_000,   # ≤20% characters in duplicate lines
    max_dup_para_char_ppm=200_000,   # ≤20% characters in duplicate paras
    max_top2_ppm=200_000,            # top 2-gram ≤20% of characters
    max_top3_ppm=180_000,
    max_top4_ppm=160_000,
    max_dup5_ppm=150_000,            # duplicate 5-grams ≤15% of characters
    max_dup6_ppm=140_000,
    max_dup7_ppm=130_000,
    max_dup8_ppm=120_000,
    max_dup9_ppm=110_000,
    max_dup10_ppm=100_000,
)

LINE_SEP = "\\n"          # Spark split() regex for a newline
PARA_SEP = "\\n\\n"       # blank-line paragraph separator


# ------------------------------------------------------------ fragments
#
# Both engines consume the SAME arithmetic; the Spark side is emitted as
# expression strings (the HOF folds read far better as SQL than as nested
# python lambdas) and the DuckDB side as its list-function dialect.


def _lines_expr(text: str, sep: str) -> str:
    return f"split({text}, '{sep}')"


def _lines_sql(text: str, n_newlines: int) -> str:
    sep = " || ".join(["chr(10)"] * n_newlines)
    return f"string_split({text}, {sep})"


def _ngrams_expr(text: str, k: int) -> str:
    """ALL word k-grams (with multiplicity — unlike text.shingles_col)."""
    toks = f"split({text}, ' ')"
    parts = ", ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def _ngrams_sql(text: str, k: int) -> str:
    toks = f"string_split({text}, ' ')"
    join = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE [{join} FOR i IN range(1, len({toks}) - {k} + 2)] END"
    )


def _dup_chars_expr(arr: str) -> str:
    """Characters inside instances beyond the first: sort, then charge every
    adjacent equal pair its element length. O(n log n), map-only."""
    n1 = f"greatest(size({arr}) - 1, 0)"
    return (
        f"aggregate(zip_with("
        f"slice(array_sort({arr}), 2, {n1}), "
        f"slice(array_sort({arr}), 1, {n1}), "
        f"(a, b) -> IF(a = b, CAST(length(a) AS BIGINT), CAST(0 AS BIGINT))), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _dup_chars_sql(arr: str) -> str:
    return (
        f"coalesce(CAST(list_sum(list_transform(list_zip("
        f"list_slice(list_sort({arr}), 2, len({arr})), "
        f"list_slice(list_sort({arr}), 1, len({arr}) - 1)), "
        f"z -> CASE WHEN z[1] = z[2] THEN length(z[1]) ELSE 0 END)) "
        f"AS BIGINT), 0)"
    )


def _top_chars_expr(arr: str) -> str:
    """count(most frequent element) x its length — one fold over the sorted
    array; `best` advances only on a strictly longer run, so the FIRST
    (= lexicographically smallest) maximal element wins ties."""
    newrun = "IF(x = s.prev, s.run + 1, CAST(1 AS BIGINT))"
    return (
        f"aggregate(array_sort({arr}), "
        f"named_struct('prev', '', 'run', CAST(0 AS BIGINT), "
        f"'best', CAST(0 AS BIGINT), 'bg', ''), "
        f"(s, x) -> named_struct("
        f"'prev', x, "
        f"'run', {newrun}, "
        f"'best', IF({newrun} > s.best, {newrun}, s.best), "
        f"'bg', IF({newrun} > s.best, x, s.bg)), "
        f"s -> s.best * CAST(length(s.bg) AS BIGINT))"
    )


def _top_chars_sql(arr: str) -> str:
    """Oracle twin: a correlated scalar subquery grouping the unnested
    array — (count DESC, gram ASC) LIMIT 1 is exactly the Spark fold's
    (count, lexicographically-smallest) semantics. (A pure list-lambda
    formulation re-evaluates the inlined max per element — O(n^3) — which
    made the 500-doc gate oracle minutes-slow; the subquery is O(n log n).)"""
    return (
        f"coalesce((SELECT CAST(cnt * length(g) AS BIGINT) FROM ("
        f"SELECT g, count(*) AS cnt FROM unnest({arr}) AS _u(g) "
        f"GROUP BY g ORDER BY cnt DESC, g ASC LIMIT 1)), 0)"
    )


def _total_chars_expr(arr: str) -> str:
    return (
        f"aggregate(transform({arr}, x -> CAST(length(x) AS BIGINT)), "
        f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def _total_chars_sql(arr: str) -> str:
    return (
        f"coalesce(CAST(list_sum(list_transform({arr}, x -> length(x))) "
        f"AS BIGINT), 0)"
    )


def _ppm_expr(num: str, den: str, text: str) -> str:
    """least(floor(num * 1e6 / den), 1e6), 0 on a zero denominator, NULL on
    NULL text (explicitly: both engines' least() IGNORES NULLs, so without
    the guard a NULL document would read as 100% repeated) — the shared
    shape of every ratio; identical text works on both engines."""
    return (
        f"CASE WHEN {text} IS NULL THEN CAST(NULL AS BIGINT) "
        f"WHEN {den} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(least(floor({num} * {PPM}.0 / {den}), {PPM}.0) AS BIGINT) END"
    )


# ------------------------------------------------------------- metrics


def dup_unit_ppm_col(text: str, sep: str = LINE_SEP) -> Column:
    """Fraction of line (or paragraph) instances beyond the first."""
    arr = _lines_expr(text, sep)
    num = f"CAST(size({arr}) - size(array_distinct({arr})) AS BIGINT)"
    return F.expr(_ppm_expr(num, f"size({arr})", text))


def dup_unit_ppm_sql(text: str, n_newlines: int = 1) -> str:
    arr = _lines_sql(text, n_newlines)
    num = f"CAST(len({arr}) - len(list_distinct({arr})) AS BIGINT)"
    return _ppm_expr(num, f"len({arr})", text)


def dup_unit_char_ppm_col(text: str, sep: str = LINE_SEP) -> Column:
    """Fraction of line (or paragraph) characters inside duplicate
    instances (occurrences beyond the first)."""
    arr = _lines_expr(text, sep)
    return F.expr(_ppm_expr(_dup_chars_expr(arr), _total_chars_expr(arr), text))


def dup_unit_char_ppm_sql(text: str, n_newlines: int = 1) -> str:
    arr = _lines_sql(text, n_newlines)
    return _ppm_expr(_dup_chars_sql(arr), _total_chars_sql(arr), text)


def top_ngram_char_ppm_col(text: str, k: int) -> Column:
    """Characters covered by the most frequent word k-gram, over document
    length (the Gopher top-n-gram signal; can exceed 1 for overlapping
    instances, capped at 1e6 ppm)."""
    arr = _ngrams_expr(text, k)
    return F.expr(_ppm_expr(_top_chars_expr(arr), f"length({text})", text))


def top_ngram_char_ppm_sql(text: str, k: int) -> str:
    arr = _ngrams_sql(text, k)
    return _ppm_expr(_top_chars_sql(arr), f"length({text})", text)


def dup_ngram_char_ppm_col(text: str, k: int) -> Column:
    """Characters inside duplicate word k-gram instances (beyond each
    first occurrence), over document length; capped at 1e6 ppm."""
    arr = _ngrams_expr(text, k)
    return F.expr(_ppm_expr(_dup_chars_expr(arr), f"length({text})", text))


def dup_ngram_char_ppm_sql(text: str, k: int) -> str:
    arr = _ngrams_sql(text, k)
    return _ppm_expr(_dup_chars_sql(arr), f"length({text})", text)


# ----------------------------------------------- composite rule projection


def _metric_pairs(text: str):
    """(name, spark-Column thunk, duckdb sql, threshold key) for all 13
    signals. The Column side is lazy so the SQL twin can be generated
    without an active SparkContext (the oracle runs Spark-free)."""
    out = [
        ("dup_line_ppm", lambda: dup_unit_ppm_col(text, LINE_SEP),
         dup_unit_ppm_sql(text, 1), "max_dup_line_ppm"),
        ("dup_para_ppm", lambda: dup_unit_ppm_col(text, PARA_SEP),
         dup_unit_ppm_sql(text, 2), "max_dup_para_ppm"),
        ("dup_line_char_ppm", lambda: dup_unit_char_ppm_col(text, LINE_SEP),
         dup_unit_char_ppm_sql(text, 1), "max_dup_line_char_ppm"),
        ("dup_para_char_ppm", lambda: dup_unit_char_ppm_col(text, PARA_SEP),
         dup_unit_char_ppm_sql(text, 2), "max_dup_para_char_ppm"),
    ]
    for k in (2, 3, 4):
        out.append((f"top{k}gram_ppm",
                    lambda k=k: top_ngram_char_ppm_col(text, k),
                    top_ngram_char_ppm_sql(text, k), f"max_top{k}_ppm"))
    for k in range(5, 11):
        out.append((f"dup{k}gram_ppm",
                    lambda k=k: dup_ngram_char_ppm_col(text, k),
                    dup_ngram_char_ppm_sql(text, k), f"max_dup{k}_ppm"))
    return out


def repetition_rules_cols(text: str, **overrides) -> list[Column]:
    """Metric + per-rule-flag + `keep` columns (call with
    df.select(id, *these)) — the Table-A1 repetition gate, same contract as
    ``text.gopher_rules_cols``. Unknown overrides are rejected."""
    bad = set(overrides) - set(REPETITION_DEFAULTS)
    if bad:
        raise ValueError(f"unknown repetition thresholds: {sorted(bad)}")
    p = {**REPETITION_DEFAULTS, **overrides}
    cols, keep = [], None
    flags = []
    for name, col_fn, _, key in _metric_pairs(text):
        col = col_fn()
        cols.append(col.alias(name))
        flags.append((f"ok_{name[:-4]}", col <= p[key]))
    for fname, c in flags:
        cols.append(c.cast("long").alias(fname))
        keep = c if keep is None else (keep & c)
    cols.append(keep.cast("long").alias("keep"))
    return cols


def repetition_rules_sql(text: str, **overrides) -> list[str]:
    """DuckDB twin of :func:`repetition_rules_cols` (same names/order)."""
    bad = set(overrides) - set(REPETITION_DEFAULTS)
    if bad:
        raise ValueError(f"unknown repetition thresholds: {sorted(bad)}")
    p = {**REPETITION_DEFAULTS, **overrides}
    cols, flags = [], []
    for name, _, sql, key in _metric_pairs(text):
        cols.append(f"{sql} AS {name}")
        flags.append((f"ok_{name[:-4]}", f"({sql} <= {p[key]})"))
    for fname, c in flags:
        cols.append(f"CAST({c} AS BIGINT) AS {fname}")
    cols.append(
        "CAST((" + " AND ".join(c for _, c in flags) + ") AS BIGINT) AS keep"
    )
    return cols
