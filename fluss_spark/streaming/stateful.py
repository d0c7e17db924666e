"""Custom stateful streaming operators via applyInPandasWithState.

The reference pushes all stateful computation to the host engine
(SURVEY T5: watermark pushdown only); this module supplies the engine
side: a gap-session operator maintaining per-key open-session state
across micro-batches — the pattern to copy for any custom stateful
operator (counters, CEP-ish detectors, dedup-within-horizon).

Used with the native file stream (streaming/reader.read_stream) or any
streaming DataFrame keyed by an entity column.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int, sum_value double"
)
STATE_SCHEMA = "start long, last long, n int, s double"


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, key_col: str = "user_id"
) -> DataFrame:
    """Emit CLOSED sessions per key; open sessions ride in GroupState
    across micro-batches and time out after the gap (processing-time
    timeout — with event-time watermarks Spark's native
    session_window is preferred; this operator exists for semantics the
    built-in can't express, e.g. value-conditional session breaks)."""
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        closed = []
        if state.exists:
            start, last, n, s = state.get
        else:
            start = last = None
            n, s = 0, 0.0
        # pandas datetime64[ns] int view -> microseconds
        for ts_us, value in zip(rows["ts"].astype("int64") // 1000, rows["value"].fillna(0.0)):
            if start is None:
                start = last = ts_us
                n, s = 1, float(value)
            elif ts_us - last > gap_us:
                closed.append((start, last, n, s))
                start = last = ts_us
                n, s = 1, float(value)
            else:
                last = ts_us
                n += 1
                s += float(value)
        state.update((int(start), int(last), int(n), float(s)))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(c[0], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedupe_stream(
    sdf: DataFrame,
    key_cols: list[str],
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming first-occurrence dedup: emit each key once, drop every
    later arrival (the continuous-ingest form of dd_exact). Spark-first:
    dropDuplicates on a streaming DataFrame IS the stateful dedup
    operator (per-key state in the state store); the watermark bounds
    how long a key's state is retained — the dedup horizon — so state
    does not grow unboundedly at 100 TB/day ingest. Without an
    event-time column the horizon is unbounded (exact global dedup,
    state grows with distinct keys)."""
    if event_time_col is not None:
        sdf = sdf.withWatermark(event_time_col, watermark)
        return sdf.dropDuplicatesWithinWatermark(key_cols)
    return sdf.dropDuplicates(key_cols)
