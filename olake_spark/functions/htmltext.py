"""HTML → text extraction — the opening stage of the web-curation chain.

Every web-scale corpus starts as fetched HTML; the curation ladder this
engine already ships (URL dedup → paragraph/exact dedup → Gopher/C4 rules →
LM perplexity → …) operates on extracted TEXT. This module supplies that
first conversion, the shape of CCNet/RefinedWeb's extraction stage (WET-file
generation / trafilatura's core loop), as pure Catalyst string expressions:

1. container elements whose content is never prose — ``script``, ``style``,
   ``noscript``, ``template`` — are removed wholesale (their body, including
   any ``<`` characters inside JavaScript, never leaks into text);
2. HTML comments removed;
3. block-level boundaries (``p``, ``div``, headings, list items, table
   cells, ``br``, …) become newlines — downstream line-oriented filters
   (C4's line rules, Gopher repetition) see real line structure;
4. every remaining (inline) tag drops, joining its text per HTML semantics
   (``foo<b>bar</b>`` → ``foobar``);
5. one round of entity decoding for the named entities crawl text actually
   contains (``&lt; &gt; &quot; &#39; &apos; &nbsp;`` then ``&amp;`` LAST —
   decoding ``&amp;`` first would double-decode ``&amp;lt;``);
6. whitespace normalization: non-newline runs → one space, newline runs
   (with surrounding spaces) → one newline, ends trimmed.

Alongside the text, ``link_density_ppm`` — anchor-text length over total
text length, in exact integer ppm — the classic boilerplate signal
(navigation/footer pages score high; trafilatura and jusText both gate on
it). Anchors are matched as real ``<a …>…</a>`` pairs (``<abbr>`` is not an
anchor) on the script/comment-stripped document.

Everything is map-only whole-stage-codegen Catalyst (regexp/replace/array
folds; zero shuffles, zero Python), with a DuckDB twin built from the SAME
pattern table — the regexes stay in the Java-regex ∩ RE2 subset (no
backreferences: the per-container strips are expanded per tag name), Spark
spells global replacement by default where DuckDB takes the ``g`` flag, and
ppm math is integer division in both engines. NULL html propagates to NULL
outputs.

Declared scope (documented, deterministic): one decode round, the named
entities above (numeric ``&#xx;`` beyond 39 and exotic named entities pass
through literally — both engines identically); malformed markup degrades
gracefully (a bare ``<`` with no closing ``>`` survives as text).

Reference parity: not present in the reference (it moves rows, it does not
read pages) — LLM-data-pipeline layer, same placement as urlnorm.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRIP_WHOLESALE = ("script", "style", "noscript", "template")

_BLOCK_TAGS = (
    "p|div|h[1-6]|ul|ol|li|table|tr|td|th|blockquote|pre|br|hr|section"
    "|article|aside|header|footer|nav|form|fieldset|figure|figcaption"
    "|dl|dt|dd|select|option|textarea|main|address"
)

# (entity, replacement SQL expression) — &amp; must stay LAST (one decode
# round: '&amp;lt;' → '&lt;', never '<')
_ENTITIES = (
    ("&lt;", "'<'"),
    ("&gt;", "'>'"),
    ("&quot;", "chr(34)"),
    ("&#39;", "chr(39)"),
    ("&apos;", "chr(39)"),
    ("&nbsp;", "' '"),
    ("&amp;", "'&'"),
)


def _rr(flavor: str, e: str, pat: str, rep: str, flags: str = "") -> str:
    """One global regexp_replace, per dialect: Spark replaces globally with
    inline-flag patterns (backslashes doubled through the SQL string
    parser); DuckDB takes flags — including the mandatory ``g`` — as the
    options argument and leaves backslashes alone."""
    if flavor == "spark":
        # escape ONLY the pattern through the SQL string parser — `e` may
        # already hold escaped inner expressions
        p = ((f"(?{flags})" if flags else "") + pat).replace("\\", "\\\\")
        return f"regexp_replace({e}, '{p}', {rep})"
    return f"regexp_replace({e}, '{pat}', {rep}, '{flags}g')"


def _pre_chain(flavor: str, e: str) -> str:
    """Script/style/noscript/template + comment removal (the document both
    the text chain and the anchor extractor start from)."""
    for t in _STRIP_WHOLESALE:
        e = _rr(flavor, e, f"<{t}(\\s[^>]*)?>.*?</{t}\\s*>", "' '", "is")
    return _rr(flavor, e, "<!--.*?-->", "' '", "s")


def _text_chain(flavor: str, e: str, pre_done: bool = False) -> str:
    """The full HTML→text expression over `e` (a string SQL expression)."""
    if not pre_done:
        e = _pre_chain(flavor, e)
    e = _rr(flavor, e, f"</?({_BLOCK_TAGS})(\\s[^>]*)?/?>", "chr(10)", "i")
    e = _rr(flavor, e, "<[^>]*>", "''")
    for ent, rep in _ENTITIES:
        e = f"replace({e}, '{ent}', {rep})"
    e = _rr(flavor, e, "[^\\S\\n]+", "' '")
    e = _rr(flavor, e, "\\s*\\n\\s*", "chr(10)", "s")
    return _rr(flavor, e, "^\\s+|\\s+$", "''")


_ANCHOR_PAT = "<a(\\s[^>]*)?>(.*?)</a\\s*>"


def _anchor_len(flavor: str, pre: str) -> str:
    """Total extracted-text length of all real anchors in the pre-stripped
    document `pre` — an integer, exact in both engines."""
    inner = _text_chain(flavor, "x", pre_done=True)
    if flavor == "spark":
        pat = f"(?is){_ANCHOR_PAT}".replace("\\", "\\\\")
        arr = f"regexp_extract_all({pre}, '{pat}', 2)"
        return (
            f"aggregate(transform({arr}, x -> length({inner})), "
            f"CAST(0 AS BIGINT), (a, b) -> a + CAST(b AS BIGINT))"
        )
    arr = f"regexp_extract_all({pre}, '(?is){_ANCHOR_PAT}', 2)"
    return (
        f"CAST(coalesce(list_sum(list_transform({arr}, "
        f"x -> length({inner}))), 0) AS BIGINT)"
    )


def html_text_col(html: str) -> Column:
    """Extracted text as a Column expression (NULL html → NULL)."""
    return F.expr(_text_chain("spark", html))


def html_text_sql(html: str) -> str:
    """DuckDB twin of `html_text_col`."""
    return _text_chain("duckdb", html)


def link_density_col(html: str) -> Column:
    """Anchor-text share of total text in exact integer ppm (0 for a doc
    with no extractable text; NULL html → NULL)."""
    pre = _pre_chain("spark", html)
    alen = _anchor_len("spark", pre)
    tlen = f"length({_text_chain('spark', pre, pre_done=True)})"
    return F.expr(
        f"CASE WHEN {html} IS NULL THEN CAST(NULL AS BIGINT) ELSE "
        f"CAST((1000000 * {alen}) DIV greatest(1, {tlen}) AS BIGINT) END"
    )


def link_density_sql(html: str) -> str:
    pre = _pre_chain("duckdb", html)
    alen = _anchor_len("duckdb", pre)
    tlen = f"length({_text_chain('duckdb', pre, pre_done=True)})"
    return (
        f"CASE WHEN {html} IS NULL THEN CAST(NULL AS BIGINT) ELSE "
        f"CAST((1000000 * {alen}) // greatest(1, {tlen}) AS BIGINT) END"
    )


def extract_html_text(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Map-only extraction: one row per input — ``id_col``, ``text``
    (extracted, newline-structured), ``n_chars``, ``link_density_ppm``.
    Feed ``text`` straight into the existing ladder (paragraph dedup,
    Gopher/C4, perplexity); gate on ``link_density_ppm`` for boilerplate
    (trafilatura/jusText convention: pages past ~500000 are navigation)."""
    text = html_text_col(html_col)
    return docs.select(
        F.col(id_col),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
        link_density_col(html_col).alias("link_density_ppm"),
    )


def extract_html_text_sql(
    docs_sql: str, id_col: str = "doc_id", html_col: str = "html"
) -> str:
    """DuckDB twin of `extract_html_text` over a subquery string."""
    text = html_text_sql(html_col)
    return f"""
SELECT {id_col},
       {text} AS text,
       CAST(length({text}) AS BIGINT) AS n_chars,
       {link_density_sql(html_col)} AS link_density_ppm
FROM ({docs_sql})
"""
