"""Streaming gap-based sessionization — the stateful-streaming twin of
:mod:`olake_spark.operators.sessionize`: maintain one open session per user
in `applyInPandasWithState`, extend it while events keep arriving within
`gap_s` of the session's end, and EMIT a session row when silence exceeds
the gap — either observed in-stream (a later event arrives past the gap) or
declared by a processing-time state timeout when the user goes quiet.

Semantics match the batch operator exactly where they can: a new session
starts only when the delta is STRICTLY greater than `gap_s`; within a
micro-batch, events sort by (ts, event_id) so replayed/out-of-order batches
fold deterministically. What streaming adds is the timeout path: a closed
session is emitted at most once, and the state per user is O(1) — three
integers — regardless of history length, which is what lets 10^9 users
tail on a bounded state store.

Late data: an event older than the open session's start (beyond in-gap
extension) re-opens nothing — it folds into the current session if within
the gap of its END, else it closes the open session and starts the next,
exactly the fold the batch recurrence performs on sorted input. Events
later than an already-EMITTED session are a new session (stream state
cannot be un-emitted — the documented at-most-once-per-session contract).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

STATE_SCHEMA = StructType(
    [
        StructField("start_ts", LongType()),
        StructField("end_ts", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("user", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("span_s", LongType()),
    ]
)


def _make_fn(gap_s: int, idle_emit_ms: int):
    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        cur = state.get if state.exists else None  # (start, end, n)

        if state.hasTimedOut:
            if cur is not None:
                closed.append(cur)
            state.remove()
        else:
            rows = pd.concat(list(batches), ignore_index=True)
            if len(rows):
                rows = rows.sort_values(["ts_epoch", "event"])
                for ts in rows["ts_epoch"].astype("int64"):
                    ts = int(ts)
                    if cur is None:
                        cur = (ts, ts, 1)
                    elif ts - cur[1] > gap_s:
                        closed.append(cur)
                        cur = (ts, ts, 1)
                    else:
                        cur = (cur[0], max(cur[1], ts), cur[2] + 1)
            if cur is not None:
                state.update(cur)
                # silence budget: emit the open session if no new event
                # arrives within the processing-time window
                state.setTimeoutDuration(idle_emit_ms)

        if closed:
            yield pd.DataFrame(
                [
                    {
                        "user": int(key[0]),
                        "session_start": s,
                        "session_end": e,
                        "n_events": n,
                        "span_s": e - s,
                    }
                    for s, e, n in closed
                ]
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_s: int,
    idle_emit_ms: int = 30_000,
) -> DataFrame:
    """Closed-session feed over a streaming event source. Each output row is
    one finished session; the open session per user lives in O(1) state and
    is flushed by a processing-time timeout after `idle_emit_ms` of source
    silence (the streaming stand-in for "the gap elapsed on the wall")."""
    prepared = events.select(
        F.col(user_col).cast("long").alias("user"),
        F.floor(F.unix_timestamp(F.col(ts_col))).cast("long").alias("ts_epoch"),
        F.col(id_col).cast("long").alias("event"),
    )
    return prepared.groupBy("user").applyInPandasWithState(
        _make_fn(gap_s, idle_emit_ms),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
