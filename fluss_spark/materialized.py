"""Materialized tables — the reference's CREATE MATERIALIZED TABLE
surface (website/docs/engine-flink/ddl.md "Materialized Table";
property names mirror FlinkConnectorOptions.java:241-294, which stores
materialized tables as REGULAR Fluss tables with `materialized-table.*`
metadata).

Spark-native model: a materialized table is a log table whose live
contents are the latest refresh of its definition query.

  - schema is INFERRED from the query (never declared), like the
    reference (ddl.md "Schema Definition");
  - each refresh recomputes the query, commits the result, then trims
    every older refresh commit exactly the way TTL retention trims aged
    segments (physical dir removal + log_start rebase), so the table
    always scans as "the current result" and storage stays one-refresh
    sized;
  - refresh cadence: the declared FRESHNESS interval. `refresh_due` /
    `refresh_all_due` are the maintenance hooks (the same model as
    auto-partitioning), and `continuous_refresh` is the reference's
    CONTINUOUS mode realized at micro-batch granularity — re-run when a
    SOURCE table's commit version advances, sleep the freshness
    interval otherwise (the T6 stance: long-poll becomes a trigger
    interval);
  - SUSPEND/RESUME flip `materialized-table.refresh-status` between
    ACTIVATED and SUSPENDED (CatalogMaterializedTable.RefreshStatus).

The refresh handler description/bytes options exist in the reference to
rehydrate a Flink refresh JOB; here the handler is the engine itself,
so only the description is stored.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from fluss_spark.catalog import Catalog, CommitState
from fluss_spark.table import FlussTable, create_table
from fluss_spark.types import Field, TableSchema, parse_type, type_name

MT_PREFIX = "materialized-table."
Q_PROP = MT_PREFIX + "definition-query"
FRESH_PROP = MT_PREFIX + "interval-freshness"
UNIT_PROP = MT_PREFIX + "interval-freshness.time-unit"
MODE_PROP = MT_PREFIX + "refresh-mode"
STATUS_PROP = MT_PREFIX + "refresh-status"
HANDLER_PROP = MT_PREFIX + "refresh-handler-description"
# engine-specific bookkeeping (no Flink job handle to serialize)
SOURCES_PROP = MT_PREFIX + "source-tables"
LAST_TS_PROP = MT_PREFIX + "last-refresh-ts-ms"
SOURCE_VERSIONS_PROP = MT_PREFIX + "source-versions"

_UNIT_MS = {"SECOND": 1_000, "MINUTE": 60_000, "HOUR": 3_600_000, "DAY": 86_400_000}


def is_materialized(schema: TableSchema) -> bool:
    return Q_PROP in schema.properties


def freshness_ms(schema: TableSchema) -> int:
    props = schema.properties
    return int(props.get(FRESH_PROP, "1")) * _UNIT_MS[props.get(UNIT_PROP, "MINUTE")]


def _referenced_tables(fsql, query: str) -> list[str]:
    """Engine tables the query text names (same superset match the view
    refresh uses) — recorded so continuous refresh can probe their
    commit versions instead of recomputing blindly."""
    low = query.lower()
    out = []
    for db in fsql.admin.list_databases():
        for t in fsql.catalog.list_tables(db):
            if f"{db}_{t}".lower() in low:
                out.append(f"{db}.{t}")
    return sorted(out)


def _source_versions(catalog: Catalog, sources: list[str]) -> str:
    parts = []
    for s in sources:
        db, t = s.split(".", 1)
        parts.append(f"{s}={catalog.current_commit(db, t).version}")
    return ",".join(parts)


def _set_props(catalog: Catalog, db: str, name: str, updates: dict[str, str]) -> None:
    """Internal bookkeeping writes bypass Admin.alter_table validation
    (these keys are engine-owned, like schema.evolution)."""
    with catalog.write_lock(db, name):
        sch = catalog.get_schema(db, name)
        sch.properties.update(updates)
        catalog.set_schema(db, name, sch)


def create_materialized_table(
    fsql,
    db: str,
    name: str,
    query: str,
    freshness: int = 1,
    freshness_unit: str = "MINUTE",
    options: dict[str, str] | None = None,
    if_not_exists: bool = False,
) -> FlussTable:
    """CREATE MATERIALIZED TABLE <name> FRESHNESS = INTERVAL '<n>'
    <unit> AS <query>: infer the schema by PLANNING the query (no
    execution), create the backing log table with the reference's
    materialized-table.* properties, and run the first refresh."""
    if freshness_unit.upper() not in _UNIT_MS:
        raise ValueError(f"freshness unit must be one of {sorted(_UNIT_MS)}")
    if if_not_exists and fsql.admin.table_exists(db, name):
        return FlussTable(fsql.catalog, db, name)
    fsql._register_referenced_views(query)
    df = fsql.spark.sql(query)  # planning only — infers the schema
    fields = [Field(f.name, type_name(f.dataType)) for f in df.schema.fields]
    sources = _referenced_tables(fsql, query)
    opts = dict(options or {})
    num_buckets = int(opts.pop("bucket.num", "4"))
    props = {
        Q_PROP: query,
        FRESH_PROP: str(int(freshness)),
        UNIT_PROP: freshness_unit.upper(),
        MODE_PROP: "CONTINUOUS",
        STATUS_PROP: "ACTIVATED",
        HANDLER_PROP: "fluss_spark micro-batch refresh (refresh_materialized_table)",
        SOURCES_PROP: ",".join(sources),
        **opts,
    }
    schema = TableSchema(fields=fields, num_buckets=num_buckets, properties=props)
    fsql.admin.create_database(db)
    create_table(fsql.catalog, db, name, schema)
    refresh_materialized_table(fsql, db, name)
    return FlussTable(fsql.catalog, db, name)


def refresh_materialized_table(fsql, db: str, name: str, force: bool = False) -> int:
    """One refresh: recompute the definition query, commit the result,
    trim all older refresh commits (physical removal + log_start rebase,
    the TTL-retention mechanics), and stamp the bookkeeping props.
    Returns the refresh's commit version."""
    t = FlussTable(fsql.catalog, db, name)
    props = t.schema.properties
    if Q_PROP not in props:
        raise ValueError(f"{db}.{name} is not a materialized table")
    if props.get(STATUS_PROP) == "SUSPENDED" and not force:
        raise ValueError(
            f"{db}.{name} is SUSPENDED — ALTER MATERIALIZED TABLE ... RESUME "
            "it (or refresh with force=True)"
        )
    fsql._register_referenced_views(props[Q_PROP])
    # record source versions BEFORE executing the query: a source commit
    # landing mid-refresh then re-triggers the next continuous tick
    # (recording after would absorb it and serve stale data forever)
    sources = [s for s in props.get(SOURCES_PROP, "").split(",") if s]
    versions_at_start = _source_versions(t.catalog, sources)
    df = fsql.spark.sql(props[Q_PROP])
    df = df.select(
        *[F.col(f.name).cast(parse_type(f.type)).alias(f.name) for f in t.schema.fields]
    )
    t.append(df)
    state = t.catalog.current_commit(db, name)
    _truncate_commits_before(t, state.version)
    _set_props(
        t.catalog,
        db,
        name,
        {
            LAST_TS_PROP: str(int(time.time() * 1000)),
            SOURCE_VERSIONS_PROP: versions_at_start,
        },
    )
    return state.version


def _truncate_commits_before(t: FlussTable, keep_version: int) -> int:
    """Remove every commit dir older than `keep_version` in both tiers
    and rebase log_start to the newest trimmed commit's high watermarks
    — identical semantics to TTL expiry (maintenance._expire_log_ttl),
    keyed by version instead of age. A crash between deletion and the
    rebase commit leaves only already-shadowed garbage."""
    from fluss_spark.sources.log import COMMIT_DIR_COL

    with t.catalog.write_lock(t.db, t.name):
        history = {s.version: s for s in t.catalog.commit_history(t.db, t.name)}
        state = t.catalog.current_commit(t.db, t.name)
        deleted, newest_deleted = 0, None
        for tier_dir in (t.log.remote_dir, t.log.log_dir):
            if not os.path.isdir(tier_dir):
                continue
            for e in sorted(os.scandir(tier_dir), key=lambda e: e.name):
                if not e.name.startswith(f"{COMMIT_DIR_COL}="):
                    continue
                v = int(e.name.split("=")[1])
                cs = history.get(v)
                if cs is None or v >= keep_version:
                    continue
                shutil.rmtree(e.path, ignore_errors=True)
                deleted += 1
                if newest_deleted is None or v > newest_deleted.version:
                    newest_deleted = cs
        if newest_deleted is not None:
            starts = dict(state.log_start)
            for b, off in newest_deleted.log_hwm.items():
                starts[b] = max(starts.get(b, 0), off)
            t.catalog.commit(
                t.db,
                t.name,
                CommitState(
                    version=state.version + 1,
                    log_hwm=state.log_hwm,
                    snapshot_version=state.snapshot_version,
                    auto_increment=state.auto_increment,
                    ts_ms=int(time.time() * 1000),
                    log_start=starts,
                    log_floor=state.log_floor,
                ),
            )
        return deleted


def set_refresh_status(catalog: Catalog, db: str, name: str, status: str) -> None:
    """ALTER MATERIALIZED TABLE ... SUSPEND / RESUME."""
    sch = catalog.get_schema(db, name)
    if Q_PROP not in sch.properties:
        raise ValueError(f"{db}.{name} is not a materialized table")
    assert status in ("ACTIVATED", "SUSPENDED")
    _set_props(catalog, db, name, {STATUS_PROP: status})


def refresh_due(schema: TableSchema, now_ms: int | None = None) -> bool:
    """Freshness check: never refreshed, or last refresh older than the
    declared interval. Suspended tables are never due."""
    if schema.properties.get(STATUS_PROP) == "SUSPENDED":
        return False
    last = schema.properties.get(LAST_TS_PROP)
    if last is None:
        return True
    now = now_ms if now_ms is not None else int(time.time() * 1000)
    return now - int(last) >= freshness_ms(schema)


def refresh_all_due(fsql, now_ms: int | None = None) -> list[str]:
    """Maintenance entry point (the auto-partition model): refresh every
    ACTIVATED materialized table whose freshness interval has lapsed.
    Returns the qualified names refreshed."""
    refreshed = []
    for db in fsql.admin.list_databases():
        for name in fsql.catalog.list_tables(db):
            sch = fsql.catalog.get_schema(db, name)
            if is_materialized(sch) and refresh_due(sch, now_ms):
                refresh_materialized_table(fsql, db, name)
                refreshed.append(f"{db}.{name}")
    return refreshed


def sources_changed(catalog: Catalog, schema: TableSchema) -> bool:
    """Cheap continuous-mode probe: has any source table committed past
    the versions recorded at the last refresh? (One metadata read per
    source — no query execution.)"""
    recorded = dict(
        kv.split("=", 1)
        for kv in schema.properties.get(SOURCE_VERSIONS_PROP, "").split(",")
        if kv
    )
    for s in (x for x in schema.properties.get(SOURCES_PROP, "").split(",") if x):
        db, t = s.split(".", 1)
        if str(catalog.current_commit(db, t).version) != recorded.get(s):
            return True
    return False


def continuous_refresh(
    fsql, db: str, name: str, rounds: int, sleep_s: float | None = None
) -> int:
    """CONTINUOUS refresh mode at micro-batch granularity: for `rounds`
    ticks, refresh iff a source table's commit version advanced since
    the last refresh, else sleep the freshness interval (or `sleep_s`).
    Returns the number of refreshes performed. The reference runs this
    as a Flink streaming job; here it is the driver-side poll loop every
    other streaming surface uses (LogStreamReader.run)."""
    done = 0
    for i in range(rounds):
        sch = fsql.catalog.get_schema(db, name)
        if sch.properties.get(STATUS_PROP) != "SUSPENDED" and sources_changed(
            fsql.catalog, sch
        ):
            refresh_materialized_table(fsql, db, name)
            done += 1
        elif i < rounds - 1:
            time.sleep(sleep_s if sleep_s is not None else freshness_ms(sch) / 1000.0)
    return done
