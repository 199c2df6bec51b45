"""Deterministic text normalization — the CCNet pre-dedup/pre-LM transform.

CCNet (Wenzek et al. 2020, `cc_net/text_normalizer.py`) deduplicates and
LM-scores over a NORMALIZED view of each paragraph — lowercased, accents
folded, digits collapsed to ``0``, unicode punctuation/whitespace tamed —
while the kept corpus text stays raw. This module is that transform as
pure Catalyst string expressions with a DuckDB twin from the same tables:

1. lowercase (both engines lowercase Unicode identically for the Latin
   range this targets);
2. accent folding for the Latin-1/Latin-Extended letters crawl text
   actually carries, via per-codepoint ``translate`` (both engines
   implement Postgres ``translate`` per-codepoint — no regex, no UDF;
   full ICU/NFD folding is out of scope and documented so);
3. every digit → ``0`` (CCNet's numeral collapse: "born in 1987" and
   "born in 1412" normalize identically);
4. curly quotes/dashes/ellipsis → ASCII equivalents;
5. ALL whitespace — tab/LF/VT/FF/CR and the unicode space family (NBSP,
   en/em/thin spaces, ideographic space) — → plain space; zero-widths and
   the remaining C0/C1 control characters removed ("a\\tb", "a\\nb" and
   "a b" share one fingerprint: the dedup view is line-structure-blind by
   design, raw text keeps its lines);
6. whitespace runs collapsed to one space, ends trimmed.

``norm_fingerprint`` (md5 of the normalized text) is the dedup key CCNet
actually groups by — feed it to ``dedup_exact``-style grouping or the
cross-corpus flags for normalization-insensitive dedup ("The Quick Fox"
== "the quick fox" == "thé quick fox").

Map-only, zero shuffles, zero Python (plan-pinned in tests); NULL
propagates. Reference parity: LLM-data-pipeline layer (the reference
moves rows, it does not read them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# per-codepoint accent fold (lowercase side only — runs after lower())
_ACC_SRC = "àáâãäåāăąçćčďèéêëēĕėęěìíîïĩīĭįñńňòóôõöøōŏőšśùúûüũūŭůýÿžźżþðß"
_ACC_DST = "aaaaaaaaacccdeeeeeeeeeiiiiiiiinnnooooooooossuuuuuuuuyyzzztds"

_DIGIT_SRC = "123456789"
_DIGIT_DST = "000000000"

# curly punctuation → ASCII (chr codes to dodge quote escaping):
# ’(8217) ‘(8216) ‚(8218) → ' ; “(8220) ”(8221) „(8222) «(171) »(187) → " ;
# –(8211) —(8212) ―(8213) → - ; …(8230) → .
_PUNCT_MAP = [
    (8217, 39), (8216, 39), (8218, 39),
    (8220, 34), (8221, 34), (8222, 34), (171, 34), (187, 34),
    (8211, 45), (8212, 45), (8213, 45), (8230, 46),
]

# unicode space family → plain space (NBSP, ogham, en..hair, narrow NBSP,
# math space, ideographic); zero-widths + BOM and C0/C1 controls removed.
# Two regex dialects for the SAME code points: Java reads \uXXXX, RE2
# reads \x{XXXX} — generated from one table so they cannot drift.
_SPACE_POINTS = "0009-000D 00A0 1680 2000-200A 202F 205F 3000"
_DROP_POINTS = "200B-200D FEFF 0000-0008 000E-001F 007F-009F"


def _cls(points: str, flavor: str) -> str:
    parts = []
    for p in points.split():
        lo, _, hi = p.partition("-")
        if flavor == "spark":
            parts.append(f"\\\\u{lo}" + (f"-\\\\u{hi}" if hi else ""))
        else:
            parts.append(f"\\x{{{lo}}}" + (f"-\\x{{{hi}}}" if hi else ""))
    return "[" + "".join(parts) + "]"


def _chain(flavor: str, e: str) -> str:
    e = f"lower({e})"
    e = f"translate({e}, '{_ACC_SRC}', '{_ACC_DST}')"
    e = f"translate({e}, '{_DIGIT_SRC}', '{_DIGIT_DST}')"
    if flavor == "spark":
        # Spark's chr() is ASCII-mod-256, so the curly map must ride as
        # real unicode literals; the ASCII side escapes its quote chars
        # through Spark's backslash string syntax
        src = "".join(chr(a) for a, _ in _PUNCT_MAP)
        dst = (
            "".join(chr(b) for _, b in _PUNCT_MAP)
            .replace("\\", "\\\\")
            .replace("'", "\\'")
        )
        e = f"translate({e}, '{src}', '{dst}')"
        e = f"regexp_replace({e}, '{_cls(_SPACE_POINTS, 'spark')}', ' ')"
        e = f"regexp_replace({e}, '{_cls(_DROP_POINTS, 'spark')}', '')"
        e = f"regexp_replace({e}, ' +', ' ')"
    else:
        # DuckDB strings don't process backslashes, so chr() concat keeps
        # the quote characters out of the literal entirely
        src_sql = " || ".join(f"chr({a})" for a, _ in _PUNCT_MAP)
        dst_sql = " || ".join(f"chr({b})" for _, b in _PUNCT_MAP)
        e = f"translate({e}, {src_sql}, {dst_sql})"
        e = f"regexp_replace({e}, '{_cls(_SPACE_POINTS, 'duck')}', ' ', 'g')"
        e = f"regexp_replace({e}, '{_cls(_DROP_POINTS, 'duck')}', '', 'g')"
        e = f"regexp_replace({e}, ' +', ' ', 'g')"
    return f"trim({e})"


def normalize_text_col(text: str) -> Column:
    """The CCNet-shape normalized view as a Column (NULL → NULL)."""
    return F.expr(_chain("spark", text))


def normalize_text_sql(text: str) -> str:
    """DuckDB twin of :func:`normalize_text_col`."""
    return _chain("duckdb", text)


def normalize_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per input: (id, normalized_text, norm_fingerprint) — the
    md5 over the normalized view is the normalization-insensitive dedup
    key (CCNet groups on exactly this)."""
    norm = normalize_text_col(text_col)
    return docs.select(
        F.col(id_col),
        norm.alias("normalized_text"),
        F.md5(norm).alias("norm_fingerprint"),
    )


def normalize_documents_sql(
    docs_sql: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    norm = normalize_text_sql(text_col)
    return f"""
SELECT {id_col},
       {norm} AS normalized_text,
       md5({norm}) AS norm_fingerprint
FROM ({docs_sql})
"""
