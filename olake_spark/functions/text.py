"""Text-analysis kernels for training-data pipelines: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Not present in the reference (it moves rows, it doesn't read them) — these are
the operations a 100 TB lakehouse of documents needs on top of the
maintenance engine. Everything here is pure Catalyst (whole-stage codegen,
no Python in the hot path); each builder has a twin emitting the equivalent
ANSI-SQL text so the DuckDB correctness oracle is generated from the SAME
definition (no drift between engine and oracle).

Ratios are returned as parts-per-million BIGINTs — cross-engine float
formatting never enters the comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a")
PPM = 1_000_000

# ---------------------------------------------------------------- tokens


def tokens_col(text: str) -> Column:
    return F.split(F.col(text), " ")


def token_count_col(text: str) -> Column:
    return F.size(tokens_col(text)).cast("long")


def token_count_sql(text: str) -> str:
    return f"CAST(len(string_split({text}, ' ')) AS BIGINT)"


_BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def bpe_token_count_col(text: str) -> Column:
    """BPE-ish subword proxy: runs of letters, runs of digits, and individual
    punctuation each count as one token (the pre-tokenization split every
    BPE vocabulary starts from)."""
    return F.expr(f"regexp_count({text}, '{_BPE_RE}')").cast("long")


def bpe_token_count_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{_BPE_RE}')) AS BIGINT)"


# ----------------------------------------------------------- quality score


def stopword_count_col(text: str) -> Column:
    preds = " OR ".join(f"t = '{s}'" for s in STOPWORDS)
    return F.expr(f"size(filter(split({text}, ' '), t -> {preds}))").cast("long")


def stopword_count_sql(text: str) -> str:
    preds = " OR ".join(f"t = '{s}'" for s in STOPWORDS)
    return f"CAST(len(list_filter(string_split({text}, ' '), t -> {preds})) AS BIGINT)"


def avg_token_len_ppm_col(text: str) -> Column:
    # tokens are single-space joined: total token chars = len - (n-1)
    n = token_count_col(text)
    return F.floor(
        (F.length(F.col(text)) - (n - F.lit(1))) * PPM / n
    ).cast("long")


def avg_token_len_ppm_sql(text: str) -> str:
    n = token_count_sql(text)
    return (
        f"CAST(floor((length({text}) - ({n} - 1)) * {PPM}.0 / {n}) AS BIGINT)"
    )


def stopword_ratio_ppm_col(text: str) -> Column:
    return F.floor(stopword_count_col(text) * PPM / token_count_col(text)).cast("long")


def stopword_ratio_ppm_sql(text: str) -> str:
    return (
        f"CAST(floor({stopword_count_sql(text)} * {PPM}.0 / "
        f"{token_count_sql(text)}) AS BIGINT)"
    )


def quality_score_ppm_col(text: str) -> Column:
    """Composite [0, 1e6] quality: rewards mid-length tokens + stopword
    presence, penalizes very short docs — the standard shape of C4/Gopher-
    style quality filters, reduced to deterministic integer arithmetic."""
    n = token_count_col(text)
    len_term = F.least(n * F.lit(PPM) / F.lit(50), F.lit(PPM))  # saturates at 50 tokens
    stop_term = F.least(stopword_ratio_ppm_col(text) * 10, F.lit(PPM))
    return F.floor((len_term + stop_term) / 2).cast("long")


def quality_score_ppm_sql(text: str) -> str:
    n = token_count_sql(text)
    return (
        f"CAST(floor((least({n} * {PPM}.0 / 50, {PPM}) + "
        f"least({stopword_ratio_ppm_sql(text)} * 10, {PPM})) / 2) AS BIGINT)"
    )


# ------------------------------------------------------------ language ID

LANG_STOP_PPM = 20_000  # ≥2% stopwords → English-like


def lang_id_col(text: str) -> Column:
    return F.when(stopword_ratio_ppm_col(text) >= LANG_STOP_PPM, F.lit("en")).otherwise(
        F.lit("und")
    )


def lang_id_sql(text: str) -> str:
    return (
        f"CASE WHEN {stopword_ratio_ppm_sql(text)} >= {LANG_STOP_PPM} "
        f"THEN 'en' ELSE 'und' END"
    )


# ---------------------------------------------------------- fingerprinting

_FP_MOD = 2_147_483_647  # 2^31-1: keeps the rolling product in int64 range


def fingerprint_col(text: str) -> Column:
    """Order-sensitive rolling hash over tokens:
    h := (h*31 + ascii(tok[0])*64 + len(tok)) mod (2^31-1)."""
    return F.expr(
        f"aggregate(split({text}, ' '), CAST(0 AS BIGINT), "
        f"(h, t) -> pmod(h * 31 + ascii(substring(t, 1, 1)) * 64 + length(t), "
        f"CAST({_FP_MOD} AS BIGINT)))"
    )


def fingerprint_sql(text: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(t[1]) * 64 + length(t) AS BIGINT) "
        f"FOR t IN string_split({text}, ' ')]), "
        f"(h, v) -> (h * 31 + v) % {_FP_MOD})"
    )


# -------------------------------------------------------------- shingles


def shingles_col(toks: str, k: int = 3) -> Column:
    """Distinct k-token shingles over a token-array column; empty when < k
    tokens. 0-based Spark array indexing."""
    parts = ", ".join(f"{toks}[i + {j}]" for j in range(k))
    return F.expr(
        f"CASE WHEN size({toks}) < {k} THEN array() "
        f"ELSE array_distinct(transform(sequence(0, size({toks}) - {k}), "
        f"i -> concat_ws(' ', {parts}))) END"
    )


def shingles_sql(toks: str, k: int = 3) -> str:
    """DuckDB twin of :func:`shingles_col` (1-based list indexing)."""
    join = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN len({toks}) < {k} THEN [] "
        f"ELSE list_distinct([{join} FOR i IN "
        f"range(1, len({toks}) - {k} + 2)]) END"
    )


# ------------------------------------------------- Gopher-style rule filter
#
# Composite document-quality gate in the shape of the Gopher paper's
# repetition/format rules (Rae et al. 2021, appendix A1.1) and C4's
# heuristics, reduced to deterministic integer-ppm arithmetic so the Spark
# plan and the DuckDB oracle agree bit-for-bit. Every rule is emitted as its
# own metric column plus a 0/1 flag; `keep` is the conjunction. Pure
# Catalyst — no Python in the plan.

# library defaults = the published Gopher appendix-A1.1 thresholds (real
# corpora); test fixtures pass tighter overrides that discriminate on their
# short synthetic documents
GOPHER_DEFAULTS = dict(
    min_words=50,
    max_words=100_000,
    min_word_len_ppm=3_000_000,   # mean word length in [3, 10] chars
    max_word_len_ppm=10_000_000,
    min_alpha_ppm=800_000,        # ≥80% of words contain a letter
    max_symbol_ppm=100_000,       # ≤0.1 '#'/'...' marks per word
    max_bullet_ppm=900_000,       # ≤90% of lines start with a bullet
    max_ellipsis_ppm=300_000,     # ≤30% of lines end with '...'
    min_stop_hits=2,              # ≥2 stopword occurrences
)

_SYMBOL_RE = r"#|\.\.\."
_BULLETS = ("-", "*", "•")  # literal prefixes (checked with startswith)


def alpha_word_ratio_ppm_col(text: str) -> Column:
    n = token_count_col(text)
    return F.floor(
        F.expr(
            f"size(filter(split({text}, ' '), t -> t rlike '[a-zA-Z]'))"
        ).cast("long") * PPM / n
    ).cast("long")


def alpha_word_ratio_ppm_sql(text: str) -> str:
    return (
        f"CAST(floor(len(list_filter(string_split({text}, ' '), "
        f"t -> regexp_matches(t, '[a-zA-Z]'))) * {PPM}.0 / "
        f"{token_count_sql(text)}) AS BIGINT)"
    )


def symbol_ratio_ppm_col(text: str) -> Column:
    """'#' and '...' marks per word, in ppm (Gopher symbol-to-word rule).

    Spark SQL string literals eat single backslashes, so the regex is
    double-escaped here; the DuckDB twin keeps them literal."""
    pat = _SYMBOL_RE.replace("\\", "\\\\")
    return F.floor(
        F.expr(f"regexp_count({text}, '{pat}')").cast("long")
        * PPM / token_count_col(text)
    ).cast("long")


def symbol_ratio_ppm_sql(text: str) -> str:
    return (
        f"CAST(floor(len(regexp_extract_all({text}, '{_SYMBOL_RE}')) * "
        f"{PPM}.0 / {token_count_sql(text)}) AS BIGINT)"
    )


def _lines_col(text: str) -> str:
    return f"split({text}, '\\n')"


def bullet_line_ratio_ppm_col(text: str) -> Column:
    starts = " OR ".join(f"startswith(ltrim(t), '{b}')" for b in _BULLETS)
    return F.floor(
        F.expr(
            f"size(filter({_lines_col(text)}, t -> {starts})) * CAST({PPM} AS BIGINT) "
            f"/ size({_lines_col(text)})"
        )
    ).cast("long")


def bullet_line_ratio_ppm_sql(text: str) -> str:
    starts = " OR ".join(f"starts_with(ltrim(t), '{b}')" for b in _BULLETS)
    lines = f"string_split({text}, chr(10))"
    return (
        f"CAST(floor(len(list_filter({lines}, t -> {starts})) * {PPM}.0 / "
        f"len({lines})) AS BIGINT)"
    )


def ellipsis_line_ratio_ppm_col(text: str) -> Column:
    return F.floor(
        F.expr(
            f"size(filter({_lines_col(text)}, t -> endswith(rtrim(t), '...'))) "
            f"* CAST({PPM} AS BIGINT) / size({_lines_col(text)})"
        )
    ).cast("long")


def ellipsis_line_ratio_ppm_sql(text: str) -> str:
    lines = f"string_split({text}, chr(10))"
    return (
        f"CAST(floor(len(list_filter({lines}, t -> ends_with(rtrim(t), '...'))) "
        f"* {PPM}.0 / len({lines})) AS BIGINT)"
    )


def gopher_rules_cols(text: str, **overrides) -> list[Column]:
    """Metric + per-rule-flag + `keep` columns (call with df.select(id, *these))."""
    p = {**GOPHER_DEFAULTS, **overrides}
    n = token_count_col(text)
    wlen = avg_token_len_ppm_col(text)
    alpha = alpha_word_ratio_ppm_col(text)
    sym = symbol_ratio_ppm_col(text)
    bullet = bullet_line_ratio_ppm_col(text)
    ell = ellipsis_line_ratio_ppm_col(text)
    stop = stopword_count_col(text)
    flags = {
        "ok_words": (n >= p["min_words"]) & (n <= p["max_words"]),
        "ok_word_len": (wlen >= p["min_word_len_ppm"]) & (wlen <= p["max_word_len_ppm"]),
        "ok_alpha": alpha >= p["min_alpha_ppm"],
        "ok_symbols": sym <= p["max_symbol_ppm"],
        "ok_bullets": bullet <= p["max_bullet_ppm"],
        "ok_ellipsis": ell <= p["max_ellipsis_ppm"],
        "ok_stopwords": stop >= p["min_stop_hits"],
    }
    cols = [
        n.alias("n_words"),
        wlen.alias("word_len_ppm"),
        alpha.alias("alpha_ppm"),
        sym.alias("symbol_ppm"),
        bullet.alias("bullet_ppm"),
        ell.alias("ellipsis_ppm"),
        stop.alias("stop_hits"),
    ]
    keep = None
    for name, c in flags.items():
        cols.append(c.cast("long").alias(name))
        keep = c if keep is None else (keep & c)
    cols.append(keep.cast("long").alias("keep"))
    return cols


def gopher_rules_sql(text: str, **overrides) -> list[str]:
    """DuckDB twin of :func:`gopher_rules_cols` (same column names/order)."""
    p = {**GOPHER_DEFAULTS, **overrides}
    n = token_count_sql(text)
    wlen = avg_token_len_ppm_sql(text)
    alpha = alpha_word_ratio_ppm_sql(text)
    sym = symbol_ratio_ppm_sql(text)
    bullet = bullet_line_ratio_ppm_sql(text)
    ell = ellipsis_line_ratio_ppm_sql(text)
    stop = stopword_count_sql(text)
    flags = {
        "ok_words": f"({n} >= {p['min_words']} AND {n} <= {p['max_words']})",
        "ok_word_len": (
            f"({wlen} >= {p['min_word_len_ppm']} AND {wlen} <= {p['max_word_len_ppm']})"
        ),
        "ok_alpha": f"({alpha} >= {p['min_alpha_ppm']})",
        "ok_symbols": f"({sym} <= {p['max_symbol_ppm']})",
        "ok_bullets": f"({bullet} <= {p['max_bullet_ppm']})",
        "ok_ellipsis": f"({ell} <= {p['max_ellipsis_ppm']})",
        "ok_stopwords": f"({stop} >= {p['min_stop_hits']})",
    }
    cols = [
        f"{n} AS n_words",
        f"{wlen} AS word_len_ppm",
        f"{alpha} AS alpha_ppm",
        f"{sym} AS symbol_ppm",
        f"{bullet} AS bullet_ppm",
        f"{ell} AS ellipsis_ppm",
        f"{stop} AS stop_hits",
    ]
    for name, c in flags.items():
        cols.append(f"CAST({c} AS BIGINT) AS {name}")
    cols.append(
        "CAST((" + " AND ".join(flags.values()) + ") AS BIGINT) AS keep"
    )
    return cols
