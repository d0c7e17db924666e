"""Admin facade — 1:1 surface of the reference's admin client
(fluss-client/src/main/java/org/apache/fluss/client/admin/Admin.java:140-552):
database/table DDL, table info, offsets, snapshot listing. A user of the
reference's Admin maps each call directly onto this class.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from fluss_spark.catalog import Catalog
from fluss_spark.table import FlussTable, create_table
from fluss_spark.types import TableSchema


@dataclass
class KvSnapshotInfo:
    snapshot_id: int
    log_offsets: dict[int, int]  # changelog position the snapshot covers


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
