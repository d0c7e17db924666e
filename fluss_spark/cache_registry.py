"""Session-scoped registry for operator-level persisted DataFrames.

Every operator-level `persist()` that outlives its invocation routes
through `cache_df`, which gives the repo ONE place that:

  - deduplicates repeat builds of the same logical frame per session
    (the load_spread / shingle_base pattern, generalized);
  - tracks the bytes each entry actually occupies (storage-info delta
    measured at materialization) against an explicit budget
    (`$FLUSS_CACHE_BUDGET_BYTES`, default 4 GiB) and LRU-unpersists
    past it — so session-lifetime caches can no longer accumulate
    without bound at 100 TB (they rely on rebuild-on-next-use instead
    of Spark's implicit storage-memory eviction);
  - dies with the session (keys carry the applicationId; nothing
    persists across processes — these are plan/stage caches, never
    result caches: every entry is rebuilt from the parquet inputs on
    first use in a session).

Entries are registered AFTER eager materialization so concurrent first
consumers never race a cold cache (the shingle_base rule)."""

from __future__ import annotations

import os
import threading
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_LOCK = threading.RLock()
# app_id -> key -> [df, nbytes, on_evict]
_REG: dict[str, OrderedDict] = {}

_DEFAULT_BUDGET = 4 << 30


def _budget() -> int:
    return int(os.environ.get("FLUSS_CACHE_BUDGET_BYTES", _DEFAULT_BUDGET))


def _app(spark: SparkSession) -> str:
    return spark.sparkContext.applicationId


def _stored_bytes(spark: SparkSession) -> int:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def cache_df(
    spark: SparkSession,
    key: tuple,
    builder: Callable[[], DataFrame],
    on_evict: Callable[[], None] | None = None,
    eager: bool = True,
) -> DataFrame:
    """Return the session-cached persisted frame for `key`, building
    and persisting it on first use. `eager=True` (default) also
    materializes it immediately — required when multiple JOBS consume
    the frame and must not race a cold cache — and sizes the entry
    from the measured storage delta. `eager=False` keeps the old lazy
    `persist()` behavior (the first consuming job materializes as a
    side effect — one pass, no separate count job; right for frames
    consumed inside one job or whose first consumer runs immediately)
    and sizes the entry from the plan-stats estimate. `on_evict` runs
    when the entry is LRU-evicted or released (for side caches holding
    references to the frame)."""
    app = _app(spark)
    with _LOCK:
        entries = _REG.setdefault(app, OrderedDict())
        hit = entries.get(key)
        if hit is not None:
            entries.move_to_end(key)
            return hit[0]
        before = _stored_bytes(spark)
        df = builder().persist()
        if eager:
            df.count()  # materialize before anyone else can race the cache
            nbytes = max(_stored_bytes(spark) - before, 1)
        else:
            try:
                est = int(
                    df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
            except Exception:
                est = 1
            nbytes = max(1, min(est, 64 << 30))  # clamp nonsense estimates
        entries[key] = [df, nbytes, on_evict]
        _evict_over_budget(entries, keep=key)
        return df


def _evict_over_budget(entries: OrderedDict, keep) -> None:
    total = sum(e[1] for e in entries.values())
    budget = _budget()
    while total > budget and len(entries) > 1:
        old_key = next(k for k in entries if k != keep)
        df, nbytes, on_evict = entries.pop(old_key)
        total -= nbytes
        try:
            df.unpersist()
        except Exception:
            pass  # session may be gone; the entry is dropped either way
        if on_evict is not None:
            on_evict()


def release(spark: SparkSession, key: tuple) -> None:
    """Explicitly unpersist and drop one entry (no-op if absent)."""
    with _LOCK:
        entries = _REG.get(_app(spark))
        if not entries or key not in entries:
            return
        df, _nbytes, on_evict = entries.pop(key)
        try:
            df.unpersist()
        except Exception:
            pass
        if on_evict is not None:
            on_evict()


def stats(spark: SparkSession) -> dict:
    """Inspection helper: {key: bytes} for the live session."""
    with _LOCK:
        entries = _REG.get(_app(spark), OrderedDict())
        return {k: e[1] for k, e in entries.items()}
