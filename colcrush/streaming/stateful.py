"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState`` — the engine's example of state beyond what
the reference offers (parquet4s rotates on processing time only,
SURVEY.md §2.8; Structured Streaming gives us keyed state + timeouts).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("start_ts", T.DoubleType()),
        T.StructField("last_ts", T.DoubleType()),
    ]
)


def _session_fn(key, pdf_iter, state: GroupState):
    """Accumulate per-user session state; emit when the processing-time
    timeout fires (inactivity gap)."""
    if state.hasTimedOut:
        n, start, last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "session_start": [start],
                "session_end": [last],
            }
        )
        return
    n, start, last = state.get if state.exists else (0, None, None)
    for pdf in pdf_iter:
        ts = pdf["ts_sec"]
        n += len(pdf)
        start = float(ts.min()) if start is None else min(start, float(ts.min()))
        last = float(ts.max()) if last is None else max(last, float(ts.max()))
    state.update((n, start, last))
    state.setTimeoutDuration(2000)  # 2 s inactivity closes the session
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "n_events": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="float64"),
            "session_end": pd.Series([], dtype="float64"),
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id long, ts_sec double) stream -> closed sessions."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
