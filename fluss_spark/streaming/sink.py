"""Streaming write path: engine tables as exactly-once streaming sinks.

foreachBatch-style idempotent writers (T7): the engine commit records
the last applied (sink_id, batch_id); a replayed micro-batch (failure
recovery re-runs the epoch) is recognized and skipped — the same
guarantee the reference gets from writer-id + batch-sequence dedup
(client/write/IdempotenceManager.java, server/log/WriterStateManager.java).

Use with Structured Streaming:

    q = (stream_df.writeStream
         .foreachBatch(append_sink(table, "mysink"))
         .trigger(availableNow=True).start())

or with streaming/reader.py's process_available loop.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame

from fluss_spark.table import FlussTable


def _marker_path(table: FlussTable, sink_id: str) -> str:
    return os.path.join(
        table.catalog.table_dir(table.db, table.name), "meta", f"sink-{sink_id}.json"
    )


def _last_batch(table: FlussTable, sink_id: str) -> int:
    p = _marker_path(table, sink_id)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)["batch_id"]
    return -1


def _record_batch(table: FlussTable, sink_id: str, batch_id: int) -> None:
    from fluss_spark.catalog import Catalog

    Catalog._write_atomic(_marker_path(table, sink_id), json.dumps({"batch_id": batch_id}))


def append_sink(
    table: FlussTable, sink_id: str, ordering: list[str] | None = None
) -> Callable[[DataFrame, int], None]:
    """Idempotent append sink for a log table."""

    def write(df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch(table, sink_id):
            return  # replayed epoch: already committed
        table.append(df, ordering=ordering)
        _record_batch(table, sink_id, batch_id)

    return write


def upsert_sink(
    table: FlussTable,
    sink_id: str,
    ordering: list[str] | None = None,
    partial_update_cols: list[str] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Idempotent upsert sink for a PK table (rows may carry __op)."""

    def write(df: DataFrame, batch_id: int) -> None:
        if batch_id <= _last_batch(table, sink_id):
            return
        table.upsert(df, ordering=ordering, partial_update_cols=partial_update_cols)
        _record_batch(table, sink_id, batch_id)

    return write


def to_upsert_view(changelog: DataFrame, pk: list[str]) -> DataFrame:
    """Collapse a changelog DataFrame (+I/-U/+U/-D with _log_offset) to
    its upsert view — latest surviving row per key. The consumer-side
    companion of the engine's own snapshot derivation (T4 retract
    handling for downstream batch aggregation)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from fluss_spark.types import DELETE, LOG_OFFSET_COL

    w = Window.partitionBy(*pk).orderBy(F.col(LOG_OFFSET_COL).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("_change_type") != DELETE))
        .drop("__rn")
    )
