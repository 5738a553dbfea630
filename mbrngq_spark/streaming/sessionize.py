"""Streaming sessionization — the stream twin of the batch sessionize query
(__spark_entry__._q_events_sessionize: per-user sessions split at >gap_sec
event-time gaps).

Two implementations, both watermark-driven:

- ``sessionize_session_window`` — declarative built-in
  ``F.session_window``: state, merging and eviction are Spark's. Boundary
  semantics differ from the batch query on EXACT-gap ties (session_window
  treats an event at exactly start+gap as a NEW session; the batch lag
  comparison ``te - lag > gap`` keeps it) — fine for analytics rollups.

- ``sessionize_stateful`` — custom stateful operator via
  ``applyInPandasWithState`` reproducing the batch semantics EXACTLY
  (>gap splits, ≤gap merges): per-user state (start, last, n), sessions
  emitted when a later event proves the gap or when the event-time timeout
  (last + gap) passes the watermark. This is the engine's template for
  custom stateful operators (brief: "applyInPandasWithState for custom
  stateful operators").

Exactness caveat (inherent to streaming): a closed session is final only
once the watermark passes its end + gap; events later than the watermark
are dropped by Spark before reaching the operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

GAP_SEC = 1800


def sessionize_session_window(events: DataFrame, gap: str = "30 minutes",
                              watermark: str = "1 hour",
                              ts_col: str = "ts") -> DataFrame:
    """(user_id, n_events, start_epoch, end_epoch) per closed session,
    built-in session window (append mode emits watermark-closed sessions)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy("user_id", F.session_window(F.col(ts_col), gap))
            .agg(F.count("*").alias("n_events"),
                 F.min(F.unix_timestamp(ts_col)).alias("start_epoch"),
                 F.max(F.unix_timestamp(ts_col)).alias("end_epoch"))
            .select("user_id", "n_events", "start_epoch", "end_epoch"))


_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("start_epoch", T.LongType()),
    T.StructField("end_epoch", T.LongType()),
])
_STATE_SCHEMA = T.StructType([
    T.StructField("start", T.LongType()),
    T.StructField("last", T.LongType()),
    T.StructField("n", T.LongType()),
])


def sessionize_stateful(events: DataFrame, gap_sec: int = GAP_SEC,
                        watermark: str = "1 hour",
                        ts_col: str = "ts") -> DataFrame:
    """Exact batch-twin sessionization as a custom stateful operator.

    State per user: the open session (start, last, n). A new event with
    te - last > gap_sec closes it (same strict ``>`` as the batch lag
    comparison); the event-time timeout last+gap_sec flushes sessions whose
    user went quiet once the watermark passes."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = (events.withWatermark(ts_col, watermark)
          .select("user_id", F.col(ts_col),
                  F.unix_timestamp(ts_col).alias("te")))

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            s, last, n = state.get
            closed.append((uid, n, s, last))
            state.remove()
        else:
            batches = [pdf for pdf in pdfs if len(pdf)]
            tes = (np.sort(np.concatenate(
                [b["te"].to_numpy(np.int64) for b in batches]))
                if batches else np.empty(0, np.int64))
            cur = list(state.get) if state.exists else None
            for te in tes.tolist():
                if cur is None:
                    cur = [te, te, 1]
                elif te - cur[1] > gap_sec:
                    closed.append((uid, cur[2], cur[0], cur[1]))
                    cur = [te, te, 1]
                else:
                    cur[1] = te
                    cur[2] += 1
            if cur is not None:
                state.update(tuple(cur))
                # flush when the watermark passes the session's close time
                state.setTimeoutTimestamp(
                    max((cur[1] + gap_sec) * 1000,
                        state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "n_events",
                                                "start_epoch", "end_epoch"])

    return ev.groupBy("user_id").applyInPandasWithState(
        fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.EventTimeTimeout)
