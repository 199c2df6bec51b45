"""Gap-based event sessionization — the standard clickstream/telemetry
operator: group a user's events into sessions, starting a new session when
MORE than `gap_s` seconds separate consecutive events (a delta of exactly
`gap_s` stays in-session), and assign (user, session index) identity plus
within-session ordinals and session aggregates.

Spark shape (one shuffle total): both windows — the lag/gap flag and the
running session index — partition by the SAME key (`user_id`), so Catalyst
plans a single hash exchange and sorts once; the per-session ordinal and the
session rollup reuse that partitioning. Pure Catalyst, no Python. At 10^12
events the job is one shuffle on user_id; skewed power-users are bounded by
per-user history length, not corpus size (and a monthly ts prefilter keeps
the window state small — sessionization is always run over a bounded time
slice in practice).

Oracle: identical window algebra in DuckDB (`sessionize_sql`) — lag/flag/
cumulative-sum over the same deterministic (ts, event_id) order, integer
epoch arithmetic only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_s: int,
) -> DataFrame:
    """Returns (event id, user, ts_epoch, session_idx, event_seq, session
    length metadata) — one row per event, sessions numbered 0.. per user in
    time order. Ordering ties on ts break by `id_col` (deterministic)."""
    epoch = F.floor(F.unix_timestamp(F.col(ts_col))).cast("long")
    wu = Window.partitionBy("user").orderBy("ts_epoch", "event")
    flagged = df.select(
        F.col(id_col).cast("long").alias("event"),
        F.col(user_col).cast("long").alias("user"),
        epoch.alias("ts_epoch"),
    ).withColumn(
        "new_session",
        F.when(
            F.col("ts_epoch") - F.lag("ts_epoch").over(wu) > gap_s,
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    )
    out = (
        flagged
        .withColumn("session_idx", F.sum("new_session").over(wu))
        .withColumn(
            "event_seq",
            F.row_number().over(
                Window.partitionBy("user", "session_idx")
                .orderBy("ts_epoch", "event")
            ).cast("long") - 1,
        )
        .drop("new_session")
    )
    sess = Window.partitionBy("user", "session_idx")
    return out.select(
        "event", "user", "ts_epoch", "session_idx", "event_seq",
        F.count("*").over(sess).cast("long").alias("session_events"),
        (F.max("ts_epoch").over(sess) - F.min("ts_epoch").over(sess))
        .cast("long").alias("session_span_s"),
    )


def sessionize_sql(
    table: str, user_col: str, ts_col: str, id_col: str, gap_s: int
) -> str:
    """DuckDB twin of :func:`sessionize` (same column names and order)."""
    return f"""
WITH flagged AS (
  SELECT CAST({id_col} AS BIGINT) AS event,
         CAST({user_col} AS BIGINT) AS "user",
         CAST(floor(epoch({ts_col})) AS BIGINT) AS ts_epoch,
         CASE WHEN CAST(floor(epoch({ts_col})) AS BIGINT)
                   - lag(CAST(floor(epoch({ts_col})) AS BIGINT)) OVER w
                   > {gap_s}
              THEN 1 ELSE 0 END AS new_session
  FROM {table}
  WINDOW w AS (
    PARTITION BY CAST({user_col} AS BIGINT)
    ORDER BY CAST(floor(epoch({ts_col})) AS BIGINT), CAST({id_col} AS BIGINT)
  )
), indexed AS (
  SELECT event, "user", ts_epoch,
         CAST(sum(new_session) OVER (
           PARTITION BY "user" ORDER BY ts_epoch, event
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT event, "user", ts_epoch, session_idx,
       CAST(row_number() OVER (
         PARTITION BY "user", session_idx ORDER BY ts_epoch, event
       ) - 1 AS BIGINT) AS event_seq,
       CAST(count(*) OVER s AS BIGINT) AS session_events,
       CAST(max(ts_epoch) OVER s - min(ts_epoch) OVER s AS BIGINT)
         AS session_span_s
FROM indexed
WINDOW s AS (PARTITION BY "user", session_idx)
""".strip()
