"""Exact-substring deduplication — the Lee et al. shape, word-level.

"Deduplicating Training Data Makes Language Models Better" (Lee et al.
2021, ExactSubstr) removes every duplicated ~50-token span from a corpus,
keeping one occurrence — the stage that catches licence headers, quoted
reposts and templated spans that document- and paragraph-level dedup both
miss. The paper builds one giant suffix array; this module is the
distributed re-expression over the repo's `documents` shape:

Semantics (deterministic, partitioning-independent; divergences from the
paper documented below):

- tokens are the single-space split of ``text_col``; a *window* is the
  ``width``-token span starting at each position ``0 .. n - width``;
- a window instance is a DUPLICATE iff the same ``width``-token sequence
  occurs anywhere in the corpus at a lexicographically smaller
  ``(doc_id, position)`` — the earliest instance (the *owner*) is kept;
- every token covered by at least one duplicate window of its document is
  removed; the document's text is rebuilt from the surviving tokens
  (single-space joined — whitespace is normalized by reconstruction);
- documents shorter than ``width`` tokens pass through (rejoined); NULL
  stays NULL with zero counts.

Divergences from the paper: word windows instead of 50 BPE tokens (this
repo's BPE lives in `operators/bpe.py`; compose if byte-exact parity is
wanted), and duplicate-window coverage instead of maximal-match extension —
a span duplicated at length ≥ width is removed in full either way, the
difference is only the treatment of the sub-``width`` fringe.

Scale shape (plan-pinned in ``tests/test_exactsubstr.py``):

1. window explode — map-side; each window is carried as its 32-hex md5, so
   shuffle width is independent of ``width``;
2. owner election — ONE ``groupBy(hash)`` with a map-side-partial
   ``min(struct(doc, pos))``;
3. duplicate marking — hash-keyed join of the window instances against the
   one-row-per-hash election (1-to-N, co-partitioned with the election
   shuffle); never a window function, so a boilerplate span repeated a
   billion times costs a partial-aggregated min plus a fan-out join, not a
   partition sort or buffer;
4. per-document rebuild — ``groupBy(doc)`` collecting duplicate START
   POSITIONS only (bounded by document length), then pure array math:
   because all windows share one width, interval merging reduces to an
   ADJACENT-PAIR rule on the sorted starts (``start_j`` opens a merged
   interval iff ``start_j > start_{j-1} + width``) — zip_with over shifted
   copies, O(m); surviving token indices are the flattened gap sequences,
   O(n). One final doc-keyed join brings the (smaller) duplicate-start sets
   back to the corpus — the full text never rides the window pipeline.

Reference parity: not present in the reference (it moves rows, it doesn't
read them) — LLM-data-pipeline layer, completing the dedup ladder
(document exact → paragraph → MinHash/SimHash → semantic → exact
substring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 50


def dedup_exact_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """One row per input document: ``id_col``, ``n_tokens``,
    ``n_dup_windows``, ``n_removed``, and ``text_col`` rebuilt from the
    surviving tokens."""
    w = int(width)
    toks = f"split({text_col}, ' ')"
    win = ", ".join(f"{toks}[i + {j}]" for j in range(w))
    wins = docs.select(
        F.col(id_col).alias("_i"),
        F.explode(
            F.expr(
                f"CASE WHEN {text_col} IS NULL OR size({toks}) < {w} "
                f"THEN array() "
                f"ELSE transform(sequence(0, size({toks}) - {w}), "
                f"i -> named_struct('p', i, 'h', md5(concat_ws(' ', {win})))) "
                f"END"
            )
        ).alias("g"),
    ).select("_i", F.col("g.p").alias("_p"), F.col("g.h").alias("_h"))

    owners = wins.groupBy("_h").agg(
        F.min(F.struct("_i", "_p")).alias("_o")
    )
    dup_pos = (
        wins.join(owners, "_h")
        .filter(
            (F.col("_i") != F.col("_o._i")) | (F.col("_p") != F.col("_o._p"))
        )
        .groupBy("_i")
        .agg(F.array_sort(F.collect_list("_p")).alias("_s"))
    )

    # equal-width interval union in pure array math over the sorted starts
    # S: start_j heads a merged interval iff it clears the previous start
    # by more than `width`; ends close where the next head begins.
    heads = (
        f"filter(transform(sequence(0, size(_s) - 1), "
        f"j -> IF(j = 0 OR _s[j] > _s[j - 1] + {w}, _s[j], -1)), x -> x >= 0)"
    )
    tails = (
        f"filter(transform(sequence(0, size(_s) - 1), "
        f"j -> IF(j = size(_s) - 1 OR _s[j + 1] > _s[j] + {w}, "
        f"_s[j] + {w}, -1)), x -> x >= 0)"
    )
    joined = docs.join(
        dup_pos.withColumnRenamed("_i", id_col), id_col, "left"
    )
    n = f"CASE WHEN {text_col} IS NULL THEN 0 ELSE size({toks}) END"
    kept_idx = (
        f"CASE WHEN _s IS NULL THEN "
        f"IF({text_col} IS NULL, array(), sequence(0, {n} - 1)) "
        f"ELSE flatten(zip_with("
        f"concat(array(0), {tails}), concat({heads}, array({n})), "
        f"(a, b) -> IF(b > a, sequence(a, b - 1), array()))) END"
    )
    return joined.select(
        F.col(id_col),
        F.expr(n).cast("long").alias("n_tokens"),
        F.coalesce(F.expr("size(_s)"), F.lit(0))
        .cast("long")
        .alias("n_dup_windows"),
        F.expr(f"{n} - size({kept_idx})").cast("long").alias("n_removed"),
        F.expr(
            f"CASE WHEN {text_col} IS NULL THEN CAST(NULL AS STRING) "
            f"ELSE concat_ws(' ', transform({kept_idx}, i -> {toks}[i])) END"
        ).alias(text_col),
    )


def dedup_exact_substrings_sql(
    docs_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = DEFAULT_WIDTH,
) -> str:
    """DuckDB twin: row_number owner election, lag-based islands for the
    equal-width interval union, range-join coverage, string_agg rebuild —
    an entirely different formulation, same defined output."""
    w = int(width)
    return f"""
WITH base AS (
  SELECT {id_col} AS i, {text_col} AS t,
         string_split({text_col}, ' ') AS tk
  FROM ({docs_sql})
),
wins AS (
  SELECT i, x - 1 AS p,
         md5(array_to_string(list_slice(tk, x, x + {w} - 1), ' ')) AS h
  FROM (SELECT i, tk, unnest(range(1, len(tk) - {w} + 2)) AS x
        FROM base WHERE len(tk) >= {w})
),
marked AS (
  SELECT i, p,
         row_number() OVER (PARTITION BY h ORDER BY i, p) AS rn
  FROM wins
),
dups AS (SELECT i, p FROM marked WHERE rn > 1),
islands AS (
  SELECT i, p,
         CASE WHEN p > lag(p, 1, -{w} - 1) OVER (PARTITION BY i ORDER BY p)
                   + {w} THEN 1 ELSE 0 END AS head
  FROM dups
),
ivals AS (
  SELECT i, min(p) AS s, max(p) + {w} AS e
  FROM (SELECT i, p,
               sum(head) OVER (PARTITION BY i ORDER BY p) AS grp
        FROM islands)
  GROUP BY i, grp
),
toks AS (
  SELECT i, x - 1 AS idx, tk[x] AS tok
  FROM (SELECT i, tk, unnest(range(1, len(tk) + 1)) AS x FROM base)
),
kept AS (
  SELECT tx.i, tx.idx, tx.tok
  FROM toks tx
  WHERE NOT EXISTS (SELECT 1 FROM ivals v
                    WHERE v.i = tx.i AND tx.idx >= v.s AND tx.idx < v.e)
),
agg AS (
  SELECT i,
         count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY idx) AS t2
  FROM kept GROUP BY i
),
dcount AS (SELECT i, count(*) AS nd FROM dups GROUP BY i)
SELECT b.i AS {id_col},
       CAST(CASE WHEN b.t IS NULL THEN 0 ELSE len(b.tk) END
            AS BIGINT) AS n_tokens,
       CAST(coalesce(d.nd, 0) AS BIGINT) AS n_dup_windows,
       CAST(CASE WHEN b.t IS NULL THEN 0
                 ELSE len(b.tk) - coalesce(a.n_kept, 0) END
            AS BIGINT) AS n_removed,
       CASE WHEN b.t IS NULL THEN NULL
            ELSE coalesce(a.t2, '') END AS {text_col}
FROM base b
LEFT JOIN agg a ON a.i = b.i
LEFT JOIN dcount d ON d.i = b.i
"""
