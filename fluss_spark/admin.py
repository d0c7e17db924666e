"""Admin facade — 1:1 surface of the reference's admin client
(fluss-client/src/main/java/org/apache/fluss/client/admin/Admin.java:140-552):
database/table DDL, table info, offsets, snapshot listing. A user of the
reference's Admin maps each call directly onto this class.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from fluss_spark.catalog import Catalog, TableNotFoundError
from fluss_spark.table import FlussTable, create_table
from fluss_spark.types import Field, TableSchema


@dataclass
class KvSnapshotInfo:
    snapshot_id: int
    log_offsets: dict[int, int]  # changelog position the snapshot covers


# -- ALTER TABLE change kinds (metadata/TableChange.java:28-131) ----------


@dataclass
class AddColumn:
    """TableChange.addColumn (TableChange.java:41-60): appended LAST;
    always nullable (pre-existing rows read as NULL). `agg` = per-column
    aggregation function for AGGREGATION merge-engine tables."""

    name: str
    type: str
    agg: str | None = None


@dataclass
class DropColumn:
    """TableChange.dropColumn (TableChange.java:123): key columns
    (pk/bucket/partition) cannot be dropped."""

    name: str


@dataclass
class SetOption:
    """TableChange.set (TableChange.java:127)."""

    key: str
    value: str


@dataclass
class ResetOption:
    """TableChange.reset (TableChange.java:131)."""

    key: str


class InvalidAlterTableException(ValueError):
    """Mirror of common/exception/InvalidAlterTableException: the change
    is structurally unsupported (immutable option, key column drop, …)."""


# options that define the table's physical/merge identity — immutable
# after creation (the reference validates the same set server-side)
_IMMUTABLE_OPTIONS = (
    "table.merge-engine",
    "table.merge-engine.versioned.ver-column",
    "table.changelog.image",
)


class Admin:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    # -- databases (Admin.createDatabase/listDatabases/dropDatabase) ------
    def create_database(self, db: str, ignore_if_exists: bool = True) -> None:
        self.catalog.create_database(db, ignore_if_exists)

    def list_databases(self) -> list[str]:
        return self.catalog.list_databases()

    def database_exists(self, db: str) -> bool:
        return db in self.catalog.list_databases()

    def drop_database(self, db: str) -> None:
        self.catalog.drop_database(db)

    # -- tables (Admin.createTable/getTableInfo/listTables/dropTable) -----
    def create_table(self, db: str, name: str, schema: TableSchema, ignore_if_exists: bool = False) -> FlussTable:
        return create_table(self.catalog, db, name, schema, if_not_exists=ignore_if_exists)

    def get_table_info(self, db: str, name: str) -> TableSchema:
        return self.catalog.get_schema(db, name)

    def list_tables(self, db: str) -> list[str]:
        return self.catalog.list_tables(db)

    def table_exists(self, db: str, name: str) -> bool:
        return self.catalog.table_exists(db, name)

    def drop_table(self, db: str, name: str) -> None:
        self.catalog.drop_table(db, name)

    def alter_table(
        self,
        db: str,
        name: str,
        changes: list[AddColumn | DropColumn | SetOption | ResetOption],
        ignore_if_not_exists: bool = False,
    ) -> TableSchema | None:
        """Admin.alterTable (Admin.java:310): apply schema/option changes
        atomically under the table write lock.

        Evolution is NAME-based over Parquet, which makes add/drop free:
        files written before an AddColumn simply lack the column (the
        explicit read schema surfaces NULLs), and files written before a
        DropColumn carry an extra column every later read ignores. No
        file rewrite, ever — the same property the reference gets from
        field-ID indirection (Schema.java:223; field IDs are kept in our
        schema JSON too and pin identity across the change history).
        Rename/retype need ID-based column resolution in the reader and
        are rejected (InvalidAlterTableException), matching the subset
        the reference validates server-side.

        Open Table/FlussTable handles keep their creation-time schema
        (exactly like the reference's clients, which cache SchemaInfo);
        re-open the table to observe the new schema."""
        if not self.catalog.table_exists(db, name):
            if ignore_if_not_exists:
                return None
            raise TableNotFoundError(f"{db}.{name}")
        with self.catalog.write_lock(db, name):
            schema = self.catalog.get_schema(db, name)
            fields = list(schema.fields)
            props = dict(schema.properties)
            protected = set(
                schema.primary_key + schema.bucket_keys + schema.partition_keys
            )
            retired = set(
                n for n in props.get("schema.retired-columns", "").split(",") if n
            )
            for ch in changes:
                if isinstance(ch, AddColumn):
                    if any(f.name == ch.name for f in fields):
                        raise InvalidAlterTableException(f"column exists: {ch.name}")
                    if ch.name in retired:
                        # reads are NAME-based over Parquet: re-adding a
                        # dropped name would resurrect the old column's
                        # values from pre-drop files (or fail the scan on
                        # a type change) instead of reading NULL. The
                        # reference disambiguates via field IDs; until
                        # reads resolve by ID, the name stays retired.
                        raise InvalidAlterTableException(
                            f"column name was previously dropped and old data "
                            f"files still carry it: {ch.name} (use a new name)"
                        )
                    fields.append(Field(ch.name, ch.type, nullable=True, agg=ch.agg))
                elif isinstance(ch, DropColumn):
                    if not any(f.name == ch.name for f in fields):
                        raise InvalidAlterTableException(f"no such column: {ch.name}")
                    if ch.name in protected:
                        raise InvalidAlterTableException(
                            f"cannot drop key column: {ch.name}"
                        )
                    if props.get("table.merge-engine.versioned.ver-column") == ch.name:
                        raise InvalidAlterTableException(
                            f"cannot drop the versioned merge column: {ch.name}"
                        )
                    fields = [f for f in fields if f.name != ch.name]
                    retired.add(ch.name)
                    props["schema.retired-columns"] = ",".join(sorted(retired))
                elif isinstance(ch, SetOption):
                    if ch.key in _IMMUTABLE_OPTIONS:
                        raise InvalidAlterTableException(
                            f"option is immutable after creation: {ch.key}"
                        )
                    if ch.key == "table.log.tiered.local-segments":
                        # validated HERE so the append path never raises
                        # AFTER its commit succeeded (auto-tiering runs
                        # post-publish)
                        try:
                            ok = int(ch.value) >= 1
                        except ValueError:
                            ok = False
                        if not ok:
                            raise InvalidAlterTableException(
                                "table.log.tiered.local-segments must be an "
                                f"integer >= 1, got {ch.value!r}"
                            )
                    props[ch.key] = ch.value
                elif isinstance(ch, ResetOption):
                    if ch.key in _IMMUTABLE_OPTIONS:
                        raise InvalidAlterTableException(
                            f"option is immutable after creation: {ch.key}"
                        )
                    props.pop(ch.key, None)
                else:
                    raise InvalidAlterTableException(f"unsupported change: {ch!r}")
            new_schema = TableSchema(
                fields=fields,
                primary_key=list(schema.primary_key),
                bucket_keys=list(schema.bucket_keys),
                num_buckets=schema.num_buckets,
                partition_keys=list(schema.partition_keys),
                properties=props,
            )
            self.catalog.set_schema(db, name, new_schema)
            return new_schema

    # -- offsets (Admin.listOffsets, OffsetSpec EARLIEST/LATEST/TIMESTAMP)
    def list_offsets(
        self,
        db: str,
        name: str,
        spec: str = "latest",
        spark: SparkSession | None = None,
        timestamp_ms: int | None = None,
    ) -> dict[int, int]:
        t = FlussTable(self.catalog, db, name)
        if spec == "latest":
            return t.latest_offsets()
        if spec == "earliest":
            return t.earliest_offsets()
        if spec == "timestamp":
            if spark is None or timestamp_ms is None:
                raise ValueError("timestamp spec requires spark + timestamp_ms")
            return t.offsets_for_timestamp(spark, timestamp_ms)
        raise ValueError(f"unknown offset spec: {spec}")

    # -- snapshots (Admin.getLatestKvSnapshots, :411-450) -----------------
    def get_latest_kv_snapshot(self, db: str, name: str) -> KvSnapshotInfo | None:
        t = FlussTable(self.catalog, db, name)
        if t.kv is None:
            raise ValueError("KV snapshots exist only for Primary Key Tables")
        state = self.catalog.current_commit(db, name)
        if state.snapshot_version < 0:
            return None
        history = {s.version: s for s in self.catalog.commit_history(db, name)}
        cs = history[state.snapshot_version]
        return KvSnapshotInfo(
            snapshot_id=state.snapshot_version,
            log_offsets={int(b): o for b, o in cs.log_hwm.items()},
        )

    def list_kv_snapshots(self, db: str, name: str) -> list[int]:
        import os

        t = FlussTable(self.catalog, db, name)
        if t.kv is None:
            return []
        mdir = t.kv.manifest_dir
        if not os.path.isdir(mdir):
            return []
        return sorted(int(e.name[1:-5]) for e in os.scandir(mdir) if e.name.endswith(".json"))
