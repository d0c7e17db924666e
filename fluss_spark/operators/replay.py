"""Changelog replay — the engine's core fold.

Reproduces the semantics of the reference's KV write path
(server/kv/KvTablet.java:514-792: read-old → merge → emit
+I/-U/+U/-D into the WAL) and its row mergers
(server/kv/rowmerger/{Default,FirstRow,Versioned,Aggregate}RowMerger.java)
— but as ONE declarative Spark plan instead of a per-record RocksDB
loop: rows are hash-distributed by primary key, running merged state is
computed with window aggregates over (pk, __seq), the changelog is
derived by lag() comparison, and the snapshot is the final state per
key. Everything stays in whole-stage codegen; no Python in the path.

Input contract (prepared by sources/kv.py):
    pk cols + data cols
    __op      'U' (upsert) | 'D' (delete)
    __seq     long, per-pk fold order; seed (existing snapshot) rows = 0
    __is_seed 1 for snapshot seed rows, else 0

Output: changelog rows (data cols + _change_type + __seq + __sub) and
snapshot rows (data cols), as two DataFrames derived from one plan.

A sequential pandas fold (`replay_exact`) covers the one combination the
window path does not: partial updates interleaved with deletes, where a
key's death must reset column state (PartialUpdater.deleteRow semantics,
server/kv/partialupdate/PartialUpdater.java:104-138).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.types import (
    CHANGE_TYPE_COL,
    DELETE,
    INSERT,
    UPDATE_AFTER,
    UPDATE_BEFORE,
    TableSchema,
)

OP_COL = "__op"
SEQ_COL = "__seq"
SEED_COL = "__is_seed"
SUB_COL = "__sub"

_LONG_MIN = -(2**63)


def _w_run(pk: list[str]) -> Window:
    return (
        Window.partitionBy(*pk)
        .orderBy(SEQ_COL)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _w_lag(pk: list[str]) -> Window:
    return Window.partitionBy(*pk).orderBy(SEQ_COL)


def _struct(cols: list[str]) -> Column:
    return F.struct(*[F.col(c).alias(c) for c in cols])


def _emit(
    df: DataFrame,
    cols: list[str],
    cur_state: Column,
    prev_state: Column,
    prev_present: Column,
    cur_present: Column,
    emit_cond: Column,
) -> DataFrame:
    """Assemble changelog rows: per input record an array of 0-2 change
    events, exploded JVM-side.

    +I when the key appears, -U/+U pair on update, -D on delete —
    exactly KvTablet.applyInsert/applyUpdate/applyDelete
    (KvTablet.java:755-792)."""

    def mk(ct: str, row: Column, sub: int) -> Column:
        return F.struct(F.lit(ct).alias("ct"), row.alias("row"), F.lit(sub).alias("sub"))

    is_u = (F.col(OP_COL) == "U") & emit_cond
    slot1 = (
        F.when(is_u & prev_present, mk(UPDATE_BEFORE, prev_state, 0))
        .when(is_u & ~prev_present, mk(INSERT, cur_state, 0))
        .when((F.col(OP_COL) == "D") & prev_present, mk(DELETE, prev_state, 0))
    )
    slot2 = F.when(is_u & prev_present, mk(UPDATE_AFTER, cur_state, 1))
    events = F.array_compact(F.array(slot1, slot2))
    out = (
        df.filter(F.col(SEED_COL) == 0)
        .withColumn("__events", events)
        .select(SEQ_COL, F.explode("__events").alias("__e"))
        .select(
            F.col(SEQ_COL),
            F.col("__e.sub").alias(SUB_COL),
            F.col("__e.ct").alias(CHANGE_TYPE_COL),
            *[F.col(f"__e.row.{c}").alias(c) for c in cols],
        )
    )
    return out


def replay(
    df: DataFrame,
    schema: TableSchema,
    partial_update_cols: list[str] | None = None,
    merge_mode: str | None = None,
    may_have_deletes: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Fold a change stream into (changelog_df, snapshot_df).

    Dispatches on the table's merge engine (MergeEngineType.java:23-64).
    `merge_mode='overwrite'` bypasses the merge engine and applies plain
    last-write-wins — the undo/recovery path (M8, Upsert.mergeMode,
    client/table/writer/Upsert.java:61-98).

    `may_have_deletes=False` is a caller hint (the batch carried no __op
    column, so every op is 'U') that skips the delete-probe jobs.
    """
    engine = "default" if merge_mode == "overwrite" else schema.merge_engine
    pk = schema.primary_key
    cols = schema.data_columns()
    if not pk:
        raise ValueError("replay requires a primary-key table")

    if schema.delete_behavior == "disable" and may_have_deletes:
        # DeleteBehavior.DISABLE (metadata/DeleteBehavior.java:28-47)
        if df.filter(F.col(OP_COL) == "D").limit(1).count() > 0:
            raise ValueError("DELETE disabled for this table (table.delete.behavior=disable)")
    if schema.delete_behavior == "ignore" and may_have_deletes:
        df = df.filter((F.col(OP_COL) != "D") | (F.col(SEED_COL) == 1))

    if engine == "default":
        if partial_update_cols:
            has_deletes = may_have_deletes and df.filter(
                (F.col(OP_COL) == "D") & (F.col(SEED_COL) == 0)
            ).limit(1).count() > 0
            if has_deletes:
                out = replay_exact(df, schema, partial_update_cols)
            else:
                out = _replay_partial(df, schema, partial_update_cols)
        else:
            out = _replay_default(df, schema)
        return _apply_changelog_image(out, schema, full_row=not partial_update_cols)
    if engine == "first_row":
        return _replay_first_row(df, schema)
    if engine == "versioned":
        return _apply_changelog_image(_replay_versioned(df, schema), schema, full_row=False)
    if engine == "aggregation":
        return _apply_changelog_image(
            _replay_aggregation(df, schema, partial_update_cols), schema, full_row=False
        )
    raise ValueError(f"unknown merge engine: {engine}")


def _apply_changelog_image(
    out: tuple[DataFrame, DataFrame], schema: TableSchema, full_row: bool
) -> tuple[DataFrame, DataFrame]:
    """M9 changelog image (metadata/ChangelogImage.java): FULL keeps
    -U/+U pairs; WAL drops UPDATE_BEFORE, and — for default merge with
    full-row updates — converts +I to +U (the skip-old-lookup
    optimization, 'similar to database WAL behavior')."""
    if schema.changelog_image != "wal":
        return out
    changelog, snapshot = out
    changelog = changelog.filter(F.col(CHANGE_TYPE_COL) != UPDATE_BEFORE)
    if schema.merge_engine == "default" and full_row:
        changelog = changelog.withColumn(
            CHANGE_TYPE_COL,
            F.when(F.col(CHANGE_TYPE_COL) == INSERT, F.lit(UPDATE_AFTER)).otherwise(
                F.col(CHANGE_TYPE_COL)
            ),
        )
    return changelog, snapshot


# ---------------------------------------------------------------------- #
# default merge (last write wins) — DefaultRowMerger.java
# ---------------------------------------------------------------------- #


def _replay_default(df: DataFrame, schema: TableSchema) -> tuple[DataFrame, DataFrame]:
    pk, cols = schema.primary_key, schema.data_columns()
    w_lag = _w_lag(pk)

    present = F.col(OP_COL) == "U"  # state presence after each record
    state = F.when(present, _struct(cols))
    d = (
        df.withColumn("__cur", state)
        .withColumn("__cur_present", present)
        .withColumn("__prev", F.lag("__cur").over(w_lag))
        .withColumn("__prev_present", F.coalesce(F.lag("__cur_present").over(w_lag), F.lit(False)))
    )
    changelog = _emit(
        d,
        cols,
        cur_state=F.col("__cur"),
        prev_state=F.col("__prev"),
        prev_present=F.col("__prev_present"),
        cur_present=F.col("__cur_present"),
        emit_cond=F.lit(True),
    )
    snapshot = _final_state(d, pk, cols)
    return changelog, snapshot


def _final_state(d: DataFrame, pk: list[str], cols: list[str]) -> DataFrame:
    w = Window.partitionBy(*pk).orderBy(F.col(SEQ_COL).desc())
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & F.col("__cur_present"))
        .select(*[F.col(f"__cur.{c}").alias(c) for c in cols])
    )


# ---------------------------------------------------------------------- #
# partial update (no deletes) — PartialUpdater.java:35-103
# ---------------------------------------------------------------------- #


def _replay_partial(
    df: DataFrame, schema: TableSchema, target_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Running per-column state: target columns take the incoming value
    (explicit nulls overwrite — hence the struct wrapper that makes
    'set to null' distinguishable from 'not set'); untouched columns keep
    their last state (null before first write)."""
    pk, cols = schema.primary_key, schema.data_columns()
    non_target = [c for c in cols if c not in target_cols and c not in pk]
    w_run, w_lag = _w_run(pk), _w_lag(pk)

    running = []
    for c in cols:
        if c in pk:
            running.append(F.col(c).alias(c))
        elif c in target_cols:
            # seed rows set every column; batch rows set target columns
            wrapped = F.struct(F.col(c).alias("v"))
            running.append(F.last(wrapped, ignorenulls=True).over(w_run)["v"].alias(c))
        else:
            wrapped = F.when(F.col(SEED_COL) == 1, F.struct(F.col(c).alias("v")))
            running.append(F.last(wrapped, ignorenulls=True).over(w_run)["v"].alias(c))

    d = df.withColumn("__cur", F.struct(*running)).withColumn("__cur_present", F.lit(True))
    d = (
        d.withColumn("__prev", F.lag("__cur").over(w_lag))
        .withColumn("__prev_present", F.lag("__cur_present").over(w_lag).isNotNull())
    )
    changelog = _emit(
        d,
        cols,
        cur_state=F.col("__cur"),
        prev_state=F.col("__prev"),
        prev_present=F.col("__prev_present"),
        cur_present=F.col("__cur_present"),
        emit_cond=F.lit(True),
    )
    snapshot = _final_state(d, pk, cols)
    return changelog, snapshot


# ---------------------------------------------------------------------- #
# FIRST_ROW — FirstRowRowMerger.java (insert-only changelog)
# ---------------------------------------------------------------------- #


def _replay_first_row(df: DataFrame, schema: TableSchema) -> tuple[DataFrame, DataFrame]:
    pk, cols = schema.primary_key, schema.data_columns()
    d = df.filter(F.col(OP_COL) == "U")
    w = Window.partitionBy(*pk).orderBy(SEQ_COL)
    d = d.withColumn("__rn", F.row_number().over(w))
    winners = d.filter(F.col("__rn") == 1)
    changelog = (
        winners.filter(F.col(SEED_COL) == 0)
        .select(
            F.col(SEQ_COL),
            F.lit(0).alias(SUB_COL),
            F.lit(INSERT).alias(CHANGE_TYPE_COL),
            *cols,
        )
    )
    snapshot = winners.select(*cols)
    return changelog, snapshot


# ---------------------------------------------------------------------- #
# VERSIONED — VersionedRowMerger.java:68-110 (null ver = -inf, tie -> new)
# ---------------------------------------------------------------------- #


def _replay_versioned(df: DataFrame, schema: TableSchema) -> tuple[DataFrame, DataFrame]:
    pk, cols = schema.primary_key, schema.data_columns()
    ver = schema.version_column
    if not ver:
        raise ValueError("versioned merge engine requires table.merge-engine.versioned.ver-column")
    w_run, w_lag = _w_run(pk), _w_lag(pk)

    # ranking key: (version with null -> -inf, then arrival order so the
    # newer write wins ties) — exactly createVersionComparator + new-wins
    ver_num = F.coalesce(F.col(ver).cast("long"), F.lit(_LONG_MIN))
    rank = F.struct(ver_num.alias("v"), F.col(SEQ_COL).alias("s"))
    payload = F.struct(rank.alias("k"), _struct(cols).alias("row"))
    winner = F.max(payload).over(w_run)  # struct compare = lexicographic (v, s)

    d = (
        df.filter(F.col(OP_COL) == "U")
        .withColumn("__w", winner)
        .withColumn("__cur", F.col("__w.row"))
        .withColumn("__cur_present", F.lit(True))
        .withColumn("__prev_w", F.lag("__w").over(w_lag))
        .withColumn("__prev", F.col("__prev_w.row"))
        .withColumn("__prev_present", F.col("__prev_w").isNotNull())
    )
    # emit only when this record became the winner (its seq is the winner seq)
    changed = F.col("__w.k.s") == F.col(SEQ_COL)
    changelog = _emit(
        d,
        cols,
        cur_state=F.col("__cur"),
        prev_state=F.col("__prev"),
        prev_present=F.col("__prev_present"),
        cur_present=F.col("__cur_present"),
        emit_cond=changed,
    )
    snapshot = _final_state(d, pk, cols)
    return changelog, snapshot


# ---------------------------------------------------------------------- #
# AGGREGATION — AggregateRowMerger.java:57-271 + field aggregators
# (server/kv/rowmerger/aggregate/functions/*.java)
# ---------------------------------------------------------------------- #


def _agg_running(c: str, agg: str, w_run: Window, delim: str = ",", dtype: str = "double") -> Column:
    col = F.col(c)
    n_set = F.count(col).over(w_run)
    if agg == "sum":
        return F.when(n_set > 0, F.sum(col).over(w_run)).cast(dtype)
    if agg == "product":
        lst = F.collect_list(col).over(w_run)
        prod = F.aggregate(lst, F.lit(1.0).cast("double"), lambda a, x: a * x.cast("double"))
        return F.when(n_set > 0, prod.cast(dtype))
    if agg == "max":
        return F.max(col).over(w_run)
    if agg == "min":
        return F.min(col).over(w_run)
    if agg == "last_value":
        return F.last(F.struct(col.alias("v"))).over(w_run)["v"]
    if agg == "last_value_ignore_nulls":
        return F.last(col, ignorenulls=True).over(w_run)
    if agg == "first_value":
        return F.first(F.struct(col.alias("v"))).over(w_run)["v"]
    if agg == "first_value_ignore_nulls":
        return F.first(col, ignorenulls=True).over(w_run)
    if agg in ("listagg", "string_agg"):
        lst = F.collect_list(col).over(w_run)  # skips nulls, offset order
        return F.when(F.size(lst) > 0, F.array_join(lst, delim))
    if agg == "bool_and":
        return F.min(col).over(w_run)
    if agg == "bool_or":
        return F.max(col).over(w_run)
    if agg in ("rbm32", "rbm64"):
        # roaring bitmap union (FieldRoaringBitmap32/64Agg): the column
        # is the bitmap value itself (array<long> here, BYTES blob in the
        # reference); each record contributes a bitmap, fold = union
        return F.array_sort(F.array_distinct(F.flatten(F.collect_list(col).over(w_run))))
    raise ValueError(f"unknown aggregate function: {agg}")


def _replay_aggregation(
    df: DataFrame, schema: TableSchema, partial_update_cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """AGGREGATION merge; with `partial_update_cols` only target columns
    take the batch's contributions, untouched columns carry the seed's
    accumulated value (PartialAggregateRowMerger,
    AggregateRowMerger.java:224-271). Null-skipping aggregates behave
    identically either way; last_value/first_value need the explicit
    carry so a partial batch's nulls don't overwrite."""
    pk, cols = schema.primary_key, schema.data_columns()
    agg_spec = schema.agg_spec
    delim = schema.properties.get("table.merge-engine.aggregation.listagg-delimiter", ",")
    w_run, w_lag = _w_run(pk), _w_lag(pk)
    dtypes = dict(df.dtypes)
    target = set(partial_update_cols) if partial_update_cols else None

    running = []
    for c in cols:
        if c in pk:
            running.append(F.col(c).alias(c))
        elif target is not None and c not in target:
            # untouched column: carry the accumulated (seed) value
            wrapped = F.when(F.col(SEED_COL) == 1, F.struct(F.col(c).alias("v")))
            running.append(F.last(wrapped, ignorenulls=True).over(w_run)["v"].alias(c))
        elif c in agg_spec:
            running.append(
                _agg_running(c, agg_spec[c], w_run, delim, dtypes.get(c, "double")).alias(c)
            )
        else:
            # non-aggregated column: last value wins (AggregateRowMerger
            # falls back to replace for unconfigured columns)
            running.append(F.last(F.struct(F.col(c).alias("v"))).over(w_run)["v"].alias(c))

    d = (
        df.filter(F.col(OP_COL) == "U")
        .withColumn("__cur", F.struct(*running))
        .withColumn("__cur_present", F.lit(True))
    )
    d = (
        d.withColumn("__prev", F.lag("__cur").over(w_lag))
        .withColumn("__prev_present", F.lag("__cur_present").over(w_lag).isNotNull())
    )
    changelog = _emit(
        d,
        cols,
        cur_state=F.col("__cur"),
        prev_state=F.col("__prev"),
        prev_present=F.col("__prev_present"),
        cur_present=F.col("__cur_present"),
        emit_cond=F.lit(True),
    )
    snapshot = _final_state(d, pk, cols)
    return changelog, snapshot


# ---------------------------------------------------------------------- #
# exact sequential fold (pandas) — partial update ⨯ delete interplay
# ---------------------------------------------------------------------- #


def replay_exact(
    df: DataFrame, schema: TableSchema, partial_update_cols: list[str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Per-key sequential fold via applyInPandas (Arrow-batched, grouped
    by pk — distributed, but row-at-a-time inside each key). Used only
    for partial-update+delete mixtures; semantics from
    PartialUpdater.updateRow/deleteRow (PartialUpdater.java:35-138):
    delete retracts target columns, the row dies when every non-pk
    column is null."""
    import pandas as pd

    pk, cols = schema.primary_key, schema.data_columns()
    non_pk = [c for c in cols if c not in pk]
    target = [c for c in (partial_update_cols or cols) if c not in pk]

    out_schema = ", ".join(
        [f"`{SEQ_COL}` long", f"`{SUB_COL}` int", f"`{CHANGE_TYPE_COL}` string"]
        + [f"`{f.name}` {f.to_struct_field().dataType.simpleString()}" for f in schema.fields]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(SEQ_COL)
        state: dict | None = None
        rows = []
        for rec in pdf.to_dict("records"):
            is_seed = rec[SEED_COL] == 1
            if is_seed:
                state = {c: rec[c] for c in cols}
                continue
            seq = rec[SEQ_COL]
            if rec[OP_COL] == "U":
                if state is None:
                    state = {c: None for c in cols}
                    for c in pk:
                        state[c] = rec[c]
                    for c in target:
                        state[c] = rec[c]
                    rows.append({SEQ_COL: seq, SUB_COL: 0, CHANGE_TYPE_COL: INSERT, **state})
                else:
                    prev = dict(state)
                    for c in target:
                        state[c] = rec[c]
                    rows.append({SEQ_COL: seq, SUB_COL: 0, CHANGE_TYPE_COL: UPDATE_BEFORE, **prev})
                    rows.append({SEQ_COL: seq, SUB_COL: 1, CHANGE_TYPE_COL: UPDATE_AFTER, **state})
            else:  # delete
                if state is None:
                    continue
                prev = dict(state)
                for c in target:
                    state[c] = None
                if all(state[c] is None or pd.isna(state[c]) for c in non_pk):
                    rows.append({SEQ_COL: seq, SUB_COL: 0, CHANGE_TYPE_COL: DELETE, **prev})
                    state = None
                else:
                    rows.append({SEQ_COL: seq, SUB_COL: 0, CHANGE_TYPE_COL: UPDATE_BEFORE, **prev})
                    rows.append({SEQ_COL: seq, SUB_COL: 1, CHANGE_TYPE_COL: UPDATE_AFTER, **state})
        return pd.DataFrame(rows, columns=[SEQ_COL, SUB_COL, CHANGE_TYPE_COL, *cols])

    changelog = df.groupBy(*pk).applyInPandas(fold, schema=out_schema)
    snapshot = _snapshot_from_changelog(changelog, schema)
    return changelog, snapshot


def _snapshot_from_changelog(changelog: DataFrame, schema: TableSchema) -> DataFrame:
    """Replay invariant: applying a changelog reproduces the snapshot —
    last event per key wins; keys whose last event is -D are gone
    (SortMergeReader.java:30-55 'change log wins over the snapshot')."""
    pk, cols = schema.primary_key, schema.data_columns()
    w = Window.partitionBy(*pk).orderBy(F.col(SEQ_COL).desc(), F.col(SUB_COL).desc())
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(CHANGE_TYPE_COL) != DELETE))
        .select(*cols)
    )
