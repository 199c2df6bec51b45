"""Corpus-curation operators: deterministic sampling, stratified caps, PII
scrubbing — the selection/cleaning layer a training-data pipeline runs
between dedup and export.

Everything here is pure Catalyst (no Python anywhere), deterministic given
the input, and carries a DuckDB oracle twin built from the same expression
fragments, like the rest of the pipeline layer. The sampling primitive is a
content hash, not `rand()`: a row's keep/drop decision depends only on its
key, so re-runs, retries, and different partitionings all select the SAME
sample — the property that makes a 100 TB sampling job resumable and its
output reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from olake_spark.functions.text import PPM  # one source of truth


def hash_mod_col(key_col: str, modulus: int) -> F.Column:
    """Uniform [0, modulus) bucket from a 60-bit md5 prefix of the key —
    the ONE cross-engine-exact hash pair (Spark `conv(hex,16,10)` ≡ DuckDB
    `CAST('0x'||hex AS BIGINT)`); every bucketing op shares this helper so
    the exactness contract lives in exactly one place."""
    return (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint") % modulus
    )


def hash_mod_sql(key_col: str, modulus: int) -> str:
    return (
        f"(CAST(('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {modulus})"
    )


def hash_bucket_col(key_col: str) -> F.Column:
    """Uniform [0, 1e6) ppm bucket (sampling / quota draws)."""
    return hash_mod_col(key_col, PPM)


def hash_bucket_sql(key_col: str) -> str:
    return hash_mod_sql(key_col, PPM)


def hash_sample(df: DataFrame, key_col: str, rate_ppm: int) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its key's hash bucket
    < rate_ppm. One narrow filter — no shuffle, no RNG state, pushed to the
    scan; the sampled set is a pure function of the keys."""
    return df.filter(hash_bucket_col(key_col) < rate_ppm)


def hash_sample_sql(table: str, key_col: str, rate_ppm: int) -> str:
    return f"SELECT * FROM {table} WHERE {hash_bucket_sql(key_col)} < {rate_ppm}"


def stratified_cap(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    quota: int,
) -> DataFrame:
    """At most `quota` rows per group, picked deterministically by the key's
    hash bucket (an unbiased 'random' draw that every re-run repeats),
    ties broken by the key itself. The window shuffles once on the group
    columns — per-group state is a counter, so skewed groups cost sort time
    but never memory. This is the per-language / per-source balancing cap a
    corpus-mixing recipe needs."""
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket_col(key_col).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= quota)
        .drop("_rn")
    )


def stratified_cap_sql(
    table: str, group_cols: list[str], key_col: str, quota: int
) -> str:
    groups = ", ".join(group_cols)
    return f"""
SELECT * EXCLUDE (_rn) FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {groups}
    ORDER BY {hash_bucket_sql(key_col)} ASC, {key_col} ASC
  ) AS _rn
  FROM {table}
)
WHERE _rn <= {quota}
"""


# PII patterns chosen to parse identically under Java regex (Spark) and RE2
# (DuckDB): no backrefs, no lookaround, explicit character classes.
_PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def scrub_pii_col(text_col) -> F.Column:
    """Redact emails, IPv4 addresses and US-shaped phone numbers with typed
    placeholder tokens — rule order matters (emails first, so user@host
    never half-matches as a phone). Pure regexp_replace chain: whole-stage
    codegen, streams at scan speed. Accepts a column name or a Column."""
    from pyspark.sql import Column

    c = text_col if isinstance(text_col, Column) else F.col(text_col)
    for pat, repl in _PII_RULES:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_pii_sql(text_col: str) -> str:
    expr = text_col
    for pat, repl in _PII_RULES:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    return expr


def split_by_hash(
    df: DataFrame, key_col: str, weights_ppm: dict[str, int]
) -> DataFrame:
    """Deterministic train/val/test assignment: each row gets the split
    whose cumulative ppm band its key's hash bucket falls in — a pure
    function of the key (stable across runs, machines, and re-shuffles;
    adding rows never moves existing ones between splits). `weights_ppm`
    must sum to 1e6. Narrow projection — no shuffle, no RNG state."""
    if sum(weights_ppm.values()) != PPM:
        raise ValueError(f"weights must sum to {PPM}: {weights_ppm}")
    bucket = hash_bucket_col(key_col)
    expr, lo = None, 0
    for name, w in weights_ppm.items():
        lo += w
        cond = bucket < lo
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def split_by_hash_sql(
    table: str, key_col: str, weights_ppm: dict[str, int]
) -> str:
    """DuckDB twin of :func:`split_by_hash`."""
    if sum(weights_ppm.values()) != PPM:
        raise ValueError(f"weights must sum to {PPM}: {weights_ppm}")
    cases, lo = [], 0
    for name, w in weights_ppm.items():
        lo += w
        cases.append(f"WHEN {hash_bucket_sql(key_col)} < {lo} THEN '{name}'")
    return (
        f"SELECT *, CASE {' '.join(cases)} END AS split FROM {table}"
    )


def mix_domains(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_ppm: dict[str, int],
    total_rows: int | None = None,
) -> DataFrame:
    """Deterministic domain-mixture sampling (the Pile / LLaMA recipe
    shape): re-weight a multi-source corpus to the declared per-domain
    proportions, upsampling by whole epochs where a domain is too small
    (LLaMA trains Wikipedia for ~2.45 epochs) and hash-downsampling where
    it is too large.

    ``target_ppm`` maps domain → proportion (must sum to exactly 1e6);
    ``total_rows`` is the target corpus size (default: the listed
    domains' combined count, i.e. re-mix at the same size). For each
    domain with count c and requirement r = total·w/1e6: every row is
    emitted ``r // c`` times (epochs 0..), and the fractional tail keeps
    a row iff its hash bucket < ``((r % c)·1e6) // c`` — all integer
    arithmetic, so the DuckDB twin re-derives the identical plan and the
    output multiset is a pure function of the keys (resumable,
    partitioning-independent). Domains not in ``target_ppm`` are
    dropped; a listed domain with zero rows raises.

    Output = input columns + ``epoch`` (BIGINT, which copy this is).
    Scale shape: ONE count aggregate (map-side combined, #domains rows
    to the driver), then a broadcast join + a generator + a narrow
    filter — the corpus itself is never shuffled. Exact-count variants
    need a per-domain rank (a full sort of each domain); at 10^9+ rows
    the hash tail's binomial deviation is negligible and this stays
    shuffle-free."""
    if sum(target_ppm.values()) != PPM:
        raise ValueError(
            f"target_ppm must sum to {PPM}, got {sum(target_ppm.values())}"
        )
    counts = {
        r["d"]: r["c"]
        for r in df.groupBy(F.col(domain_col).alias("d"))
        .agg(F.count("*").alias("c")).collect()
        if r["d"] in target_ppm
    }
    missing = sorted(d for d in target_ppm if counts.get(d, 0) == 0)
    if missing:
        raise ValueError(f"target domains with no rows: {missing}")
    total = int(total_rows) if total_rows is not None else sum(counts.values())
    plan_rows = []
    for d, w in target_ppm.items():
        c = counts[d]
        required = total * int(w) // PPM
        plan_rows.append((d, required // c, (required % c) * PPM // c))
    rates = df.sparkSession.createDataFrame(
        plan_rows, "_mix_domain string, _full_epochs bigint, _tail_ppm bigint"
    )
    return (
        df.join(F.broadcast(rates),
                F.col(domain_col) == F.col("_mix_domain"))
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0).cast("bigint"),
                                 F.col("_full_epochs"))),
        )
        .filter(
            (F.col("epoch") < F.col("_full_epochs"))
            | (hash_bucket_col(key_col) < F.col("_tail_ppm"))
        )
        .drop("_mix_domain", "_full_epochs", "_tail_ppm")
    )


def mix_domains_sql(
    table: str,
    domain_col: str,
    key_col: str,
    target_ppm: dict[str, int],
    total_rows: int | None = None,
) -> str:
    """DuckDB oracle twin of :func:`mix_domains`: re-derives the counts,
    the integer epoch/tail plan, and the hash tail from the same table."""
    doms = ", ".join(f"'{d}'" for d in target_ppm)
    case_w = (
        "CASE d "
        + " ".join(f"WHEN '{d}' THEN {int(w)}" for d, w in target_ppm.items())
        + " END"
    )
    total = (
        str(int(total_rows)) if total_rows is not None
        else "(SELECT SUM(c) FROM counts)"
    )
    return f"""
WITH counts AS (
  SELECT {domain_col} AS d, COUNT(*) AS c FROM {table}
  WHERE {domain_col} IN ({doms}) GROUP BY 1
),
plan AS (
  SELECT d, c, ({total} * {case_w}) // 1000000 AS required FROM counts
),
rates AS (
  SELECT d, required // c AS full_epochs,
         ((required % c) * 1000000) // c AS tail_ppm
  FROM plan
),
epochs AS (
  SELECT unnest(range(CAST(
    (SELECT MAX(full_epochs) FROM rates) + 1 AS BIGINT))) AS epoch
)
SELECT t.*, e.epoch
FROM {table} t
JOIN rates r ON t.{domain_col} = r.d
JOIN epochs e ON e.epoch <= r.full_epochs
WHERE e.epoch < r.full_epochs
   OR {hash_bucket_sql(f"t.{key_col}")} < r.tail_ppm
"""
