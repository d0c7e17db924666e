"""Two-level catalog (database.table) over a warehouse directory.

Replaces the reference's ZooKeeper-backed metadata + coordinator
(client/admin/Admin.java:140-290, metadata/TablePath.java) with JSON
files and an atomic commit-log per table — the Delta-style "write files,
then one atomic metadata move" protocol that stands in for the tablet
server's single-leader commit authority.

Layout per table:
  <warehouse>/<db>/<table>/
    meta/schema.json            table schema + distribution + properties
    meta/commits/v{N}.json      commit N: per-bucket log watermarks,
                                current snapshot version, files added
    meta/CURRENT                text file holding latest commit N (atomic rename)
    log/[<part>=<v>/]bucket=<n>/*.parquet      append-only log (the WAL)
    snapshot/v{N}/bucket=<n>/*.parquet         PK-table materialized state
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field

from fluss_spark.types import TableSchema


class TableNotFoundError(KeyError):
    pass


class DatabaseNotFoundError(KeyError):
    pass


@dataclass
class CommitState:
    version: int
    log_hwm: dict[str, int]  # bucket (as str) -> next offset to assign
    snapshot_version: int  # -1 = no snapshot yet
    auto_increment: dict[str, int]  # column -> next value
    ts_ms: int
    # bucket -> first readable offset; advances when TTL trims the log
    # head (earliest offsets / metadata count stay exact after expiry)
    log_start: dict[str, int] = field(default_factory=dict)
    # commit dirs with version < log_floor are SHADOWED: a whole-log
    # rewrite (rebucket) republished their rows under a new layout, so
    # scans must never read them. The floor advances atomically WITH the
    # rewrite commit — physical deletion of the shadowed dirs can then
    # happen after (and survive a crash in between) without the catalog
    # ever pointing at deleted data. 0 = nothing shadowed.
    log_floor: int = 0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2)

    @staticmethod
    def from_json(s: str) -> "CommitState":
        return CommitState(**json.loads(s))


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    # -- databases --------------------------------------------------------
    def create_database(self, db: str, ignore_if_exists: bool = True) -> None:
        path = os.path.join(self.warehouse, db)
        if os.path.exists(path) and not ignore_if_exists:
            raise ValueError(f"database exists: {db}")
        os.makedirs(path, exist_ok=True)

    def list_databases(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    def drop_database(self, db: str) -> None:
        import shutil

        shutil.rmtree(os.path.join(self.warehouse, db))

    # -- tables -----------------------------------------------------------
    def table_dir(self, db: str, table: str) -> str:
        return os.path.join(self.warehouse, db, table)

    def create_table(self, db: str, table: str, schema: TableSchema) -> None:
        self.create_database(db)
        tdir = self.table_dir(db, table)
        if os.path.exists(os.path.join(tdir, "meta", "schema.json")):
            raise ValueError(f"table exists: {db}.{table}")
        os.makedirs(os.path.join(tdir, "meta", "commits"), exist_ok=True)
        os.makedirs(os.path.join(tdir, "log"), exist_ok=True)
        self._write_atomic(os.path.join(tdir, "meta", "schema.json"), schema.to_json())
        init = CommitState(
            version=0,
            log_hwm={},
            snapshot_version=-1,
            auto_increment={},
            ts_ms=int(time.time() * 1000),
        )
        self._write_atomic(os.path.join(tdir, "meta", "commits", "v0.json"), init.to_json())
        self._write_atomic(os.path.join(tdir, "meta", "CURRENT"), "0")

    def get_schema(self, db: str, table: str) -> TableSchema:
        path = os.path.join(self.table_dir(db, table), "meta", "schema.json")
        if not os.path.exists(path):
            raise TableNotFoundError(f"{db}.{table}")
        with open(path) as f:
            return TableSchema.from_json(f.read())

    def set_schema(self, db: str, table: str, schema: TableSchema) -> None:
        """ALTER TABLE support (metadata/TableChange.java): schema written
        atomically; field IDs anchor evolution."""
        self._write_atomic(
            os.path.join(self.table_dir(db, table), "meta", "schema.json"), schema.to_json()
        )

    def list_tables(self, db: str) -> list[str]:
        dbdir = os.path.join(self.warehouse, db)
        if not os.path.isdir(dbdir):
            return []
        return sorted(
            t
            for t in os.listdir(dbdir)
            if os.path.exists(os.path.join(dbdir, t, "meta", "schema.json"))
        )

    def drop_table(self, db: str, table: str) -> None:
        import shutil

        shutil.rmtree(self.table_dir(db, table))

    def table_exists(self, db: str, table: str) -> bool:
        return os.path.exists(os.path.join(self.table_dir(db, table), "meta", "schema.json"))

    # -- commit log -------------------------------------------------------
    def current_commit(self, db: str, table: str) -> CommitState:
        tdir = self.table_dir(db, table)
        with open(os.path.join(tdir, "meta", "CURRENT")) as f:
            v = int(f.read().strip())
        with open(os.path.join(tdir, "meta", "commits", f"v{v}.json")) as f:
            return CommitState.from_json(f.read())

    def commit(self, db: str, table: str, state: CommitState) -> None:
        """Single atomic metadata advance — the engine's linearization
        point (stands in for the tablet leader's log append ack)."""
        tdir = self.table_dir(db, table)
        self._write_atomic(
            os.path.join(tdir, "meta", "commits", f"v{state.version}.json"), state.to_json()
        )
        self._write_atomic(os.path.join(tdir, "meta", "CURRENT"), str(state.version))

    def commit_at(self, db: str, table: str, version: int) -> CommitState:
        """The CommitState recorded for one version — a single file
        read, where commit_history loads every version."""
        tdir = self.table_dir(db, table)
        with open(os.path.join(tdir, "meta", "commits", f"v{version}.json")) as f:
            return CommitState.from_json(f.read())

    def commit_history(self, db: str, table: str) -> list[CommitState]:
        cdir = os.path.join(self.table_dir(db, table), "meta", "commits")
        out = []
        for name in sorted(os.listdir(cdir), key=lambda n: int(n[1:-5])):
            with open(os.path.join(cdir, name)) as f:
                out.append(CommitState.from_json(f.read()))
        return out

    # -- single-writer lock ----------------------------------------------
    def write_lock(self, db: str, table: str, timeout_s: float = 60.0):
        """Per-table single-writer lock (SURVEY §7: offset assignment
        needs a deterministic monotonic counter under a table-level
        commit lock). O_EXCL lockfile with stale-lock breaking — the
        single-leader role of the reference's tablet server, minus the
        server."""
        import contextlib
        import time as _time

        lock_path = os.path.join(self.table_dir(db, table), "meta", "WRITE_LOCK")

        @contextlib.contextmanager
        def _lock():
            deadline = _time.monotonic() + timeout_s
            while True:
                try:
                    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, f"{os.getpid()}:{_time.time()}".encode())
                    os.close(fd)
                    break
                except FileExistsError:
                    try:  # break locks older than 10 minutes (dead writer)
                        age = _time.time() - os.stat(lock_path).st_mtime
                        if age > 600:
                            os.unlink(lock_path)
                            continue
                    except FileNotFoundError:
                        continue
                    if _time.monotonic() > deadline:
                        raise TimeoutError(f"write lock busy for {db}.{table}") from None
                    _time.sleep(0.05)
            try:
                yield
            finally:
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(lock_path)

        return _lock()

    @staticmethod
    def _write_atomic(path: str, content: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
