"""URL canonicalization + URL-keyed deduplication — the first stage of every
web-scrape curation pipeline (RefinedWeb §3.1 and CCNet both dedup fetches
by normalized URL before any content-level stage; a crawl sees the same
page under http/https, www/apex, tracking-parameter and fragment variants).

Canonical form (documented, deterministic; RFC 3986-informed plus the
dedup-key conventions crawlers actually use):

1. trim surrounding whitespace, drop the ``#fragment``;
2. drop the scheme entirely (http vs https never distinguishes a page for
   dedup purposes);
3. hostname lowercased, leading ``www.`` stripped, default ``:80``/``:443``
   ports stripped (the path keeps its case — paths are case-sensitive);
4. trailing slashes stripped from the path;
5. query string: parameters split on ``&``, known tracking parameters
   removed (``utm_*``, ``fbclid``, ``gclid``, ``ref``), empties dropped,
   the rest SORTED and rejoined — parameter order never distinguishes a
   page.

Everything is pure Catalyst (regexp + array functions, whole-stage codegen,
map-only) with a DuckDB twin generated from the same steps; the regexes stay
in the syntax subset Java regex and RE2 share. NULL propagates.

``dedup_by_url`` elects the smallest ``id`` per canonical URL with ONE
min-over-partition window (a single hash exchange on the canonical key, no
sort — min is order-free) — the id-ordered owner rule shared with
``dedup_paragraphs``.

Reference parity: not present in the reference (it moves rows, it doesn't
read them) — LLM-data-pipeline layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# bare `ref` is deliberately NOT in the default set: unlike utm_*/
# fbclid/gclid it frequently carries content (?ref=<git branch>, doc
# anchors), and stripping it would silently merge distinct pages
TRACKING_PARAM_RE = "(utm_[a-zA-Z0-9_]*|fbclid|gclid)="

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def canonical_url_col(url: str) -> Column:
    # fragment + scheme off, then split host[:port] from path?query
    rest = (
        f"regexp_replace(regexp_replace(trim({url}), '#.*$', ''), "
        f"'{_SCHEME_RE}', '')"
    )
    host = (
        f"regexp_replace(regexp_replace("
        f"lower(regexp_extract({rest}, '^[^/?]*', 0)), "
        f"'^www\\\\.', ''), ':(80|443)$', '')"
    )
    tail = f"substring({rest}, length(regexp_extract({rest}, '^[^/?]*', 0)) + 1)"
    path = f"regexp_replace(regexp_extract({tail}, '^[^?]*', 0), '/+$', '')"
    query = (
        f"array_join(array_sort(filter(split("
        f"regexp_extract({tail}, '\\\\?(.*)$', 1), '&'), "
        f"p -> p != '' AND NOT p RLIKE '^{TRACKING_PARAM_RE}')), '&')"
    )
    return F.expr(
        f"CASE WHEN {url} IS NULL THEN CAST(NULL AS STRING) ELSE "
        f"concat({host}, {path}, "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END) END"
    )


def canonical_url_sql(url: str) -> str:
    rest = (
        f"regexp_replace(regexp_replace(trim({url}), '#.*$', ''), "
        f"'{_SCHEME_RE}', '')"
    )
    host = (
        f"regexp_replace(regexp_replace("
        f"lower(regexp_extract({rest}, '^[^/?]*', 0)), "
        f"'^www\\.', ''), ':(80|443)$', '')"
    )
    tail = f"substring({rest}, length(regexp_extract({rest}, '^[^/?]*', 0)) + 1)"
    path = f"regexp_replace(regexp_extract({tail}, '^[^?]*', 0), '/+$', '')"
    # coalesce: DuckDB array_to_string([]) is NULL where Spark's
    # array_join([]) is ''
    query = (
        f"coalesce(array_to_string(list_sort(list_filter(string_split("
        f"regexp_extract({tail}, '\\?(.*)$', 1), '&'), "
        f"p -> p != '' AND NOT regexp_matches(p, '^{TRACKING_PARAM_RE}'))), "
        f"'&'), '')"
    )
    return (
        f"CASE WHEN {url} IS NULL THEN CAST(NULL AS VARCHAR) ELSE "
        f"{host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END END"
    )


def host_col(url: str) -> Column:
    """Lowercased hostname with any explicit port stripped — the raw host
    (``www.`` intact: blocklists match real hosts, and the suffix expansion
    below makes ``www.evil.com`` hit a blocklisted ``evil.com`` anyway)."""
    rest = (
        f"regexp_replace(regexp_replace(trim({url}), '#.*$', ''), "
        f"'{_SCHEME_RE}', '')"
    )
    return F.expr(
        f"regexp_replace(lower(regexp_extract({rest}, '^[^/?]*', 0)), "
        f"':[0-9]+$', '')"
    )


def host_sql(url: str) -> str:
    rest = (
        f"regexp_replace(regexp_replace(trim({url}), '#.*$', ''), "
        f"'{_SCHEME_RE}', '')"
    )
    return (
        f"regexp_replace(lower(regexp_extract({rest}, '^[^/?]*', 0)), "
        f"':[0-9]+$', '')"
    )


def flag_blocked_hosts(
    docs: DataFrame,
    blocklist: list[str],
    id_col: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Domain blocklist filtering (the UT1-blocklist stage every crawl
    pipeline runs before content filters): a URL is blocked iff ANY dot
    suffix of its host — ``a.b.evil.com`` → {a.b.evil.com, b.evil.com,
    evil.com, com} — appears in the blocklist, so blocking a registrable
    domain blocks every subdomain. Map-only: the host's suffix set is
    built per row and checked with ``arrays_overlap`` against the
    blocklist riding the plan as a literal array (UT1-scale lists are
    fine; beyond ~100k entries switch to an explode + broadcast-join
    variant). Returns ``id_col``, ``host``, ``blocked`` (0/1; NULL URL →
    host NULL, blocked 0)."""
    cleaned = sorted({b.strip().lower() for b in blocklist} - {""})
    items = ", ".join(
        "'" + b.replace("'", "''") + "'" for b in cleaned
    )
    host = host_col(url_col)
    labels = "split(_host, '\\\\.')"
    sufs = (
        f"transform(sequence(0, size({labels}) - 1), "
        f"i -> concat_ws('.', slice({labels}, i + 1, size({labels}) - i)))"
    )
    return docs.select(F.col(id_col), host.alias("_host")).select(
        id_col,
        F.col("_host").alias("host"),
        F.expr(
            # an empty blocklist blocks nothing (a literal array('') would
            # match the empty-host row's suffix set)
            f"CAST(CASE WHEN _host IS NULL THEN 0 "
            + (
                f"WHEN arrays_overlap({sufs}, array({items})) THEN 1 "
                if cleaned
                else ""
            )
            + "ELSE 0 END AS BIGINT)"
        ).alias("blocked"),
    )


def flag_blocked_hosts_sql(
    docs_sql: str,
    blocklist: list[str],
    id_col: str = "doc_id",
    url_col: str = "url",
) -> str:
    cleaned = sorted({b.strip().lower() for b in blocklist} - {""})
    items = ", ".join(
        "'" + b.replace("'", "''") + "'" for b in cleaned
    )
    host = host_sql(url_col)
    labels = "string_split(h, '.')"
    sufs = (
        f"list_transform(range(1, len({labels}) + 1), "
        f"i -> array_to_string(list_slice({labels}, i, len({labels})), '.'))"
    )
    block_arm = (
        f"WHEN list_has_any({sufs}, [{items}]) THEN 1" if cleaned else ""
    )
    return f"""
WITH h AS (SELECT {id_col}, {host} AS h FROM ({docs_sql}))
SELECT {id_col}, h AS host,
       CAST(CASE WHEN h IS NULL THEN 0
                 {block_arm}
                 ELSE 0 END AS BIGINT) AS blocked
FROM h
"""


def dedup_by_url(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """One row per input row: ``id_col``, ``canonical_url``, ``keep`` (1 on
    the smallest ``id_col`` of each canonical group; NULL URLs are all
    kept — no URL is not the same URL). Single min-window exchange on the
    canonical key."""
    canon = canonical_url_col(url_col).alias("canonical_url")
    with_canon = docs.select(F.col(id_col), canon)
    # NULL-URL rows are kept unconditionally — route them AROUND the
    # window, or a corpus with a large missing-URL fraction funnels every
    # NULL through one window partition (the hot-key serialization this
    # module otherwise avoids)
    nulls = with_canon.filter(F.col("canonical_url").isNull()).select(
        id_col, "canonical_url", F.lit(1).cast("long").alias("keep")
    )
    w = Window.partitionBy("canonical_url")
    owner = F.min(F.col(id_col)).over(w)
    elected = with_canon.filter(F.col("canonical_url").isNotNull()).select(
        id_col,
        "canonical_url",
        (F.col(id_col) == owner).cast("long").alias("keep"),
    )
    return elected.unionByName(nulls)


def dedup_by_url_sql(
    docs_sql: str, id_col: str = "doc_id", url_col: str = "url"
) -> str:
    canon = canonical_url_sql(url_col)
    return f"""
WITH c AS (SELECT {id_col}, {canon} AS canonical_url FROM ({docs_sql}))
SELECT {id_col}, canonical_url,
       CAST(CASE WHEN canonical_url IS NULL THEN 1
                 WHEN {id_col} = min({id_col})
                      OVER (PARTITION BY canonical_url) THEN 1
                 ELSE 0 END AS BIGINT) AS keep
FROM c
"""
