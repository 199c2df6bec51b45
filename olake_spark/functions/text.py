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
