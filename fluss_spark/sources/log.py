"""Bucketed append-only log store — the engine's WAL and stream.

Reference semantics reproduced (not the implementation):
  - per-bucket monotonic, contiguous `__offset` (server/log/LogTablet.java
    assigns offsets on the single bucket leader; here the "leader" is a
    hash-shuffle on the bucket id + a row_number window, which routes all
    rows of one bucket to one task — the same serialization point, done
    declaratively so it scales to any bucket count)
  - bucket routing = hash(bucket keys) % n
    (common/bucketing/FlussBucketingFunction.java:27-45; we use Spark's
    Murmur3 `hash()` — stability within this engine is what matters)
  - sticky assignment for keyless appends
    (client/write/StickyBucketAssigner.java:35): spark_partition_id % n
    keeps each writer task on one bucket per batch
  - `__timestamp` = commit time (TableDescriptor.java:60)
  - commit protocol: data files are STAGED under <table>/.tmp/log-v<V>
    (hidden from every Spark reader, including the native file-source
    stream), atomically renamed into log/__commit=<V>/ at commit time,
    then meta/CURRENT advances; batch readers additionally filter
    commit <= CURRENT so even the rename -> CURRENT instant is fenced.
    Orphans from a crashed writer (staging dirs, or a renamed dir whose
    CURRENT advance never happened) are self-healed by the next writer
    under the table write lock (SURVEY §7 "what's hard").

Layout: <table>/log/commit=<V>/[<part>=<v>/]__bucket=<b>/*.parquet
Parquet row-group min/max stats on `__offset`/`__timestamp` give free
offset-range and timestamp time-travel pruning at scan time.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.catalog import Catalog, CommitState
from fluss_spark.types import (
    BUCKET_COL,
    CHANGE_TYPE_COL,
    OFFSET_COL,
    TIMESTAMP_COL,
    TableSchema,
    ddl_of,
)

COMMIT_DIR_COL = "__commit"


# system-column types admissible via `extra_cols`
_EXTRA_TYPES = {
    CHANGE_TYPE_COL: "string",
    "__seq": "long",
    "__sub": "int",
}


def _bucket_map_expr(per_bucket: dict[int, int], default: int):
    """bucket -> value lookup as ONE map literal (element_at on a map
    returns NULL for absent keys): constant expression/codegen depth at
    any bucket count, where a chained F.when would grow O(buckets)."""
    if not per_bucket:
        return F.lit(default).cast("long")
    pairs = ", ".join(
        f"{int(b)}, CAST({int(v)} AS BIGINT)" for b, v in per_bucket.items()
    )
    return F.expr(
        f"coalesce(element_at(map({pairs}), `{BUCKET_COL}`), "
        f"CAST({int(default)} AS BIGINT))"
    )


class LogStore:
    def __init__(self, catalog: Catalog, db: str, table: str):
        self.catalog = catalog
        self.db = db
        self.table = table
        self.schema = catalog.get_schema(db, table)
        self.log_dir = os.path.join(catalog.table_dir(db, table), "log")
        # S9 remote tier: sealed commit dirs moved here by tier_log()
        # (server/log/remote/LogTieringTask.java copies sealed segments to
        # remote storage and trims local; readers below the local log
        # start fall back to remote — client RemoteLogDownloader.java).
        # Here "remote" is a second Parquet root; scans union both tiers.
        self.remote_dir = os.path.join(catalog.table_dir(db, table), "remote")
        self.tmp_dir = os.path.join(catalog.table_dir(db, table), ".tmp")

    # ------------------------------------------------------------------ #
    # staged-commit protocol
    # ------------------------------------------------------------------ #
    def commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{COMMIT_DIR_COL}={version}")

    def staging_path(self, version: int) -> str:
        # dot-prefixed parent: invisible to Spark/Hadoop file listings
        return os.path.join(self.tmp_dir, f"log-v{version}")

    def publish(self, version: int) -> None:
        """Atomically move staged commit files into the log dir. Called
        immediately before the catalog CURRENT advance; a pre-existing
        destination can only be an orphan of a crashed attempt at this
        same version (we hold the write lock), so it is replaced."""
        import shutil

        dst = self.commit_path(version)
        if os.path.exists(dst):
            shutil.rmtree(dst)
        os.rename(self.staging_path(version), dst)

    def clean_orphans(self) -> None:
        """Self-heal under the write lock: drop leftover staging dirs and
        any log commit dir newer than CURRENT (a writer that crashed
        between rename and CURRENT advance). `inflight-*` dirs are LIVE
        optimistic-writer staging (kv.upsert_optimistic writes them
        outside the lock by design) — only a stale one (dead writer,
        age > 1h) is an orphan."""
        import shutil

        current = self.catalog.current_commit(self.db, self.table).version
        if os.path.isdir(self.tmp_dir):
            for e in os.scandir(self.tmp_dir):
                if e.name.startswith("inflight-"):
                    try:
                        if time.time() - e.stat().st_mtime < 3600:
                            continue
                    except FileNotFoundError:
                        continue
                shutil.rmtree(e.path, ignore_errors=True)
        for e in os.scandir(self.log_dir):
            if e.name.startswith(f"{COMMIT_DIR_COL}=") and int(e.name.split("=")[1]) > current:
                shutil.rmtree(e.path, ignore_errors=True)

    def file_schema(self, with_commit_col: bool = False, era=None):
        """Explicit read schema for log files (no inference — empty
        commits and type drift are non-issues). `era` = {field_id ->
        (physical name, physical type)} for files written before a
        rename/retype (types.era_fields_for_commit); current fields
        whose id is absent from the era were added later and are
        surfaced as NULL by the projection, not the read schema."""
        from pyspark.sql import types as T

        from fluss_spark.types import era_struct_fields

        if era is None:
            fields = list(self.schema.to_struct_type().fields)
        else:
            fields = era_struct_fields(self.schema, era)
        if self.schema.is_pk_table:
            fields.append(T.StructField(CHANGE_TYPE_COL, T.StringType(), False))
            fields.append(T.StructField("__seq", T.LongType(), True))
            fields.append(T.StructField("__sub", T.IntegerType(), True))
        fields += [
            T.StructField(BUCKET_COL, T.IntegerType(), True),
            T.StructField(OFFSET_COL, T.LongType(), True),
            T.StructField(TIMESTAMP_COL, T.TimestampType(), True),
        ]
        if with_commit_col:
            fields.append(T.StructField(COMMIT_DIR_COL, T.IntegerType(), True))
        return T.StructType(fields)

    def era_projection(self, era, extra_cols: list[str]):
        from fluss_spark.types import era_projection

        return era_projection(self.schema, era, extra_cols)

    # ------------------------------------------------------------------ #
    # append (S1)
    # ------------------------------------------------------------------ #
    def append(
        self,
        df: DataFrame,
        ordering: list[str] | None = None,
        extra_cols: list[str] | None = None,
        commit_ts_ms: int | None = None,
        defer_commit: bool = False,
        auto_increment_override: dict[str, int] | None = None,
    ) -> CommitState:
        """Append a batch; assigns __bucket/__offset/__timestamp and
        commits atomically. `ordering` fixes intra-batch offset order
        (deterministic replay); default is arrival order per partition.
        `extra_cols` admits system columns (e.g. _change_type for PK-table
        WALs) beyond the user schema. With `defer_commit`, files stay in
        the staging dir and the new CommitState is returned, but neither
        publish() nor the meta/CURRENT advance happens — the caller
        publishes + commits after adding more to the same version (PK
        upsert bundles WAL + snapshot into one commit).
        `auto_increment_override` means the caller already stamped the
        auto-increment columns (pk-table WALs carry insert-stable ids the
        log layer cannot derive) and supplies the advanced counter map;
        the per-record stamping below — correct for plain log tables,
        where every appended record IS an insert — is skipped.
        """
        schema = self.schema
        self.clean_orphans()
        state = self.catalog.current_commit(self.db, self.table)
        version = state.version + 1
        ts_ms = commit_ts_ms if commit_ts_ms is not None else int(time.time() * 1000)

        cols = schema.data_columns() + (extra_cols or [])
        for f in schema.fields:  # engine-assigned columns may be absent
            if f.auto_increment and f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast("long"))
        keep = cols + [c for c in (ordering or []) if c not in cols]
        out = df.select(*keep)
        # coerce data columns to their DECLARED types: an input batch with
        # a narrower/different type (e.g. a SQL literal inferred as
        # DECIMAL) would otherwise write its physical type into the file,
        # and the explicit read schema would misread it
        from fluss_spark.types import parse_type

        declared = {f.name: parse_type(f.type) for f in schema.fields}
        out = out.select(
            *[
                F.col(c).cast(declared[c]).alias(c) if c in declared else F.col(c)
                for c in keep
            ]
        )

        # bucket routing (W1/W2)
        n = schema.num_buckets
        if BUCKET_COL in (extra_cols or []):
            pass  # caller pre-routed (e.g. replay keeps pk-bucket alignment)
        elif schema.bucket_keys:
            out = out.withColumn(
                BUCKET_COL, F.pmod(F.hash(*schema.bucket_keys), F.lit(n)).cast("int")
            )
        else:
            out = out.withColumn(
                BUCKET_COL, (F.spark_partition_id() % F.lit(n)).cast("int")
            )

        # per-bucket offset assignment (W3): one window = the bucket leader
        order_cols = [F.col(c) for c in ordering] if ordering else [F.monotonically_increasing_id()]
        w = Window.partitionBy(BUCKET_COL).orderBy(*order_cols)
        base = {int(b): off for b, off in state.log_hwm.items()}
        # one map literal, not an O(buckets) when-chain: constant
        # expression/codegen depth at any bucket count (same shape as
        # kv.py's fused-commit HWM base)
        base_expr = _bucket_map_expr(base, default=0)
        out = out.withColumn(OFFSET_COL, (F.row_number().over(w) - 1 + base_expr).cast("long"))
        out = out.withColumn(TIMESTAMP_COL, F.timestamp_millis(F.lit(ts_ms)))

        # M10 auto-increment: allocate a contiguous per-bucket segment of
        # ids from the table counter (AutoIncrementManager's segment model,
        # BoundedSegmentSequenceGenerator) — ids are gap-free across the
        # commit because segments are packed by cumulative bucket counts.
        # On a LOG table every appended record is an insert, so the
        # per-record stamp matches the reference's assign-at-insert rule;
        # pk-table WALs arrive pre-stamped (auto_increment_override).
        auto_next = dict(state.auto_increment)
        auto_cols = [f.name for f in schema.fields if f.auto_increment]
        if auto_increment_override is not None:
            auto_next = dict(auto_increment_override)
        elif auto_cols:
            bucket_counts = sorted(
                (int(r[BUCKET_COL]), r["cnt"])
                for r in out.groupBy(BUCKET_COL).agg(F.count("*").alias("cnt")).collect()
            )
            for c in auto_cols:
                base_id = auto_next.get(c, 0)
                seg_start, acc = {}, base_id
                for bkt, cnt in bucket_counts:
                    seg_start[bkt] = acc
                    acc += cnt
                seg_expr = _bucket_map_expr(seg_start, default=base_id)
                out = out.withColumn(c, (seg_expr + F.row_number().over(w) - 1).cast("long"))
                auto_next[c] = acc
        final_cols = [c for c in cols if c not in (BUCKET_COL, OFFSET_COL, TIMESTAMP_COL)]
        out = out.select(*final_cols, BUCKET_COL, OFFSET_COL, TIMESTAMP_COL)  # drop ordering-only

        staged = self.staging_path(version)
        part_cols = list(schema.partition_keys) + [BUCKET_COL]
        codec = schema.properties.get("table.log.compression", "snappy")  # W6
        # no repartition before the write: the offset window above already
        # hash-clustered rows by BUCKET_COL (each bucket lives wholly in
        # one task), so partitionBy(bucket) emits one file per bucket as
        # is — an extra exchange here would shuffle the batch a third time
        (
            out.write.mode("overwrite")
            .option("compression", codec)
            .partitionBy(*part_cols)
            .parquet(staged)
        )

        # new high watermarks from the Parquet FOOTERS of the files just
        # written: row-group max(__offset) per bucket dir, read driver-side
        # (metadata-only) — replaces a full Spark read-back job per commit
        hwm = dict(state.log_hwm)
        per_bucket = self._footer_hwm(staged)
        if per_bucket is None:  # stats unavailable -> Spark fallback
            spark = df.sparkSession
            written = spark.read.schema(ddl_of(self.file_schema())).parquet(staged)
            per_bucket = {
                int(r[BUCKET_COL]): int(r["mx"])
                for r in written.groupBy(BUCKET_COL).agg(F.max(OFFSET_COL).alias("mx")).collect()
            }
        for bkt, mx in per_bucket.items():
            hwm[str(bkt)] = mx + 1

        new_state = CommitState(
            version=version,
            log_hwm=hwm,
            snapshot_version=state.snapshot_version,
            auto_increment=auto_next,
            ts_ms=ts_ms,
            log_start=state.log_start,
            log_floor=state.log_floor,
        )
        if not defer_commit:
            self.publish(version)
            self.catalog.commit(self.db, self.table, new_state)
        return new_state

    def _footer_hwm(self, staged: str) -> dict[int, int] | None:
        """Per-bucket max(__offset) from Parquet footer statistics of the
        staged files (driver-side, metadata-only). Returns None if any
        file lacks offset stats (caller falls back to a Spark job). Cost
        is one footer read per file — O(buckets), independent of rows."""
        import pyarrow.parquet as pq

        per_bucket: dict[int, int] = {}
        for root, _dirs, files in os.walk(staged):
            marker = f"{BUCKET_COL}="
            bucket = None
            for comp in root.split(os.sep):
                if comp.startswith(marker):
                    bucket = int(comp[len(marker):])
            for fn in files:
                if not fn.endswith(".parquet") or bucket is None:
                    continue
                md = pq.read_metadata(os.path.join(root, fn))
                try:
                    col_idx = md.schema.names.index(OFFSET_COL)
                except ValueError:
                    return None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(col_idx).statistics
                    if st is None or st.max is None:
                        return None
                    per_bucket[bucket] = max(per_bucket.get(bucket, -1), int(st.max))
        return per_bucket

    def committed_dirs(
        self, current: int | None = None, tiers: str = "all"
    ) -> tuple[dict[str, str], dict[str, str]]:
        """(local, remote) maps of commit-dir name -> path readable
        under the fencing invariant, in ONE place: log_floor <= v <=
        current (uncommitted staging and rebucket-shadowed dirs never
        listed), and remote dirs shadowed by a same-name local dir
        removed (LOCAL WINS on the crashed-tier_log overlap — reading
        both would double-count the commit). Every metadata walk
        (scan, lake snapshot, footer stats) derives from this."""
        state = self.catalog.current_commit(self.db, self.table)
        cur = state.version if current is None else current
        floor = state.log_floor

        def _dirs(root: str) -> dict[str, str]:
            if not os.path.isdir(root):
                return {}
            return {
                e.name: e.path
                for e in os.scandir(root)
                if e.name.startswith(f"{COMMIT_DIR_COL}=")
                and floor <= int(e.name.split("=")[1]) <= cur
            }

        local = _dirs(self.log_dir) if tiers in ("all", "local") else {}
        remote = _dirs(self.remote_dir) if tiers in ("all", "remote") else {}
        remote = {n: p for n, p in remote.items() if n not in local}
        return local, remote

    def minmax_from_metadata(self, column: str):
        """A2 statistics pushdown: (min, max) of a numeric/temporal
        column from Parquet footer row-group statistics — driver-side,
        zero file reads, O(files) footer reads (the metadata analog of
        count_from_metadata; reference A2 collects exactly these batch
        stats at write time, LogRecordBatchStatisticsCollector).

        Returns None when footer stats cannot answer exactly, and the
        caller must fall back to a scan: string columns (Parquet may
        truncate binary stats to prefixes), schema-evolution eras
        (physical column names differ per era), partition-key columns
        (values live in dir names, not files), or any file/row-group
        missing stats. Respects the same commit fencing as scan():
        uncommitted dirs, rebucket-shadowed dirs (< log_floor), and
        local-wins tier overlap."""
        import pyarrow.parquet as pq

        from fluss_spark.types import evolution_eras

        if evolution_eras(self.schema):
            return None
        if self.schema.is_pk_table:
            # the WAL retains superseded versions and -U/-D before
            # images; their values would feed the footer min/max even
            # though they are not live rows — only the snapshot can
            # answer exactly
            return None
        if column in self.schema.partition_keys:
            return None
        field = next((f for f in self.schema.fields if f.name == column), None)
        if field is None or field.type.upper() in ("STRING", "VARCHAR", "BYTES", "BINARY"):
            return None
        local, remote = self.committed_dirs()
        return footer_minmax(list(local.values()) + list(remote.values()), column)

    # ------------------------------------------------------------------ #
    # scan (S2/S3/S8)
    # ------------------------------------------------------------------ #
    def _tier_has_commits(self, tier_dir: str) -> bool:
        return os.path.isdir(tier_dir) and any(
            e.name.startswith(f"{COMMIT_DIR_COL}=") for e in os.scandir(tier_dir)
        )

    def scan(
        self,
        spark: SparkSession,
        start_offsets: dict[int, int] | None = None,
        end_offsets: dict[int, int] | None = None,
        as_of_commit: int | None = None,
        tiers: str = "all",
    ) -> DataFrame:
        """Full or offset-bounded log scan with system columns
        (__bucket, __offset, __timestamp[, _change_type]).

        Uncommitted data is fenced by `__commit <= CURRENT` (partition-dir
        pruning, no file reads). Offset bounds prune via Parquet row-group
        stats on __offset.

        S9: when tier_log() has moved sealed commits to the remote tier,
        the scan is the union of both tiers — same files, same offsets,
        no download step (the reference's RemoteLogDownloader exists only
        because its consumers read local disk; a Spark scan reads any
        path). `tiers` restricts to one tier ("local"/"remote") for
        maintenance jobs that must not rewrite the other.
        """
        state = self.catalog.current_commit(self.db, self.table)
        current = as_of_commit if as_of_commit is not None else state.version
        # commits below the floor were republished under a new bucket
        # layout (rebucket); they are unreadable garbage even if a crash
        # left their dirs on disk. Time travel below the floor is
        # impossible by construction (the rewrite collapsed history).
        floor = state.log_floor

        def _commits(d: str) -> list[str]:
            if not os.path.isdir(d):
                return []
            return [
                e.name
                for e in os.scandir(d)
                if e.name.startswith(f"{COMMIT_DIR_COL}=")
                and int(e.name.split("=")[1]) >= floor
            ]

        from functools import reduce

        from fluss_spark.types import evolution_eras

        local = _commits(self.log_dir) if tiers in ("all", "local") else []
        remote = _commits(self.remote_dir) if tiers in ("all", "remote") else []
        # LOCAL WINS on overlap: a crashed cross-device tier_log can leave
        # a commit in both tiers (remote copy landed, local delete
        # didn't); reading both would double-count the commit. The local
        # dir stays authoritative until it is gone.
        remote = [d for d in remote if d not in set(local)]
        eras = evolution_eras(self.schema)

        def _era_idx(v: int) -> int:
            for i, era in enumerate(eras):  # oldest-first; first cover wins
                if v <= era["until"]:
                    return i
            return -1  # current schema

        extras = (
            [CHANGE_TYPE_COL, "__seq", "__sub"] if self.schema.is_pk_table else []
        ) + [BUCKET_COL, OFFSET_COL, TIMESTAMP_COL, COMMIT_DIR_COL]
        frames = []
        for root, dirs in ((self.remote_dir, remote), (self.log_dir, local)):
            if not dirs:
                continue
            if not eras:
                # no rename/retype ever: identity fast path, single scan
                # per tier (the local tier reads its whole root — one
                # InMemoryFileIndex, the plan the tests pin)
                frames.append(
                    spark.read.schema(ddl_of(self.file_schema(with_commit_col=True)))
                    .option("basePath", root)
                    .parquet(
                        *(
                            [root]
                            if root == self.log_dir
                            else [os.path.join(root, d) for d in sorted(dirs)]
                        )
                    )
                )
                continue
            # era-mapped read: commit dirs group by the schema that wrote
            # them; each group reads its PHYSICAL layout and projects onto
            # the current schema by field id (rename=alias, retype=cast)
            groups: dict[int, list[str]] = {}
            for d in dirs:
                v = int(d.split("=")[1])
                if v > current:
                    continue  # uncommitted/newer-than-asof: never read
                groups.setdefault(_era_idx(v), []).append(d)
            for idx, ds in sorted(groups.items()):
                paths = [os.path.join(root, d) for d in sorted(ds)]
                if idx == -1:
                    frames.append(
                        spark.read.schema(ddl_of(self.file_schema(with_commit_col=True)))
                        .option("basePath", root)
                        .parquet(*paths)
                    )
                else:
                    era_map = {
                        f["id"]: (f["name"], f["type"]) for f in eras[idx]["fields"]
                    }
                    frames.append(
                        spark.read.schema(
                            ddl_of(self.file_schema(with_commit_col=True, era=era_map))
                        )
                        .option("basePath", root)
                        .parquet(*paths)
                        .select(self.era_projection(era_map, extras))
                    )
        if not frames:
            return self._empty_scan(spark)
        df = reduce(lambda a, b: a.unionByName(b), frames)
        df = df.filter(F.col(COMMIT_DIR_COL) <= current)
        if floor > 0:
            # partition-dir pruning, no file reads (the local identity
            # fast path lists its whole root; this is what fences any
            # shadowed pre-rebucket dir a crash left behind)
            df = df.filter(F.col(COMMIT_DIR_COL) >= floor)
        if start_offsets:
            cond = F.lit(False)
            for b, off in start_offsets.items():
                cond = cond | ((F.col(BUCKET_COL) == b) & (F.col(OFFSET_COL) >= off))
            # RESUME semantics, not bucket restriction: a bucket absent
            # from the map received its first row after the offsets were
            # recorded (e.g. a new pk hashing to a fresh bucket between
            # commits) — its entire history is new to the caller, so it
            # passes through from offset 0. Excluding it silently LOSES
            # data for every resume-shaped consumer (streaming reader,
            # index/vector-index sync, incremental MT refresh, snapshot
            # diff). Bucket-subset reads use snapshot(buckets=). The
            # escape disjunct is added ONLY when buckets are actually
            # missing: it carries no offset term, so it would otherwise
            # cost the pure OR-of-ANDs its __offset parquet pushdown.
            if len(start_offsets) < self.schema.num_buckets:
                cond = cond | ~F.col(BUCKET_COL).isin(list(start_offsets.keys()))
            df = df.filter(cond)
        if end_offsets:
            cond = F.lit(True)
            for b, off in end_offsets.items():
                cond = cond & ((F.col(BUCKET_COL) != b) | (F.col(OFFSET_COL) < off))
            df = df.filter(cond)
        return df.drop(COMMIT_DIR_COL)

    def _empty_scan(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame([], self.file_schema())

    # ------------------------------------------------------------------ #
    # offsets admin (S8: OffsetSpec EARLIEST/LATEST/TIMESTAMP)
    # ------------------------------------------------------------------ #
    def latest_offsets(self) -> dict[int, int]:
        state = self.catalog.current_commit(self.db, self.table)
        return {int(b): off for b, off in state.log_hwm.items()}

    def earliest_offsets(self) -> dict[int, int]:
        # non-zero once TTL/retention has trimmed the log head
        state = self.catalog.current_commit(self.db, self.table)
        starts = {int(b): off for b, off in state.log_start.items()}
        return {b: starts.get(b, 0) for b in self.latest_offsets()}

    def offsets_for_timestamp(self, spark: SparkSession, ts_ms: int) -> dict[int, int]:
        """First offset per bucket with __timestamp >= ts (TimeIndex lookup
        in the reference; here a stats-pruned min() aggregation)."""
        df = self.scan(spark)
        rows = (
            df.filter(F.col(TIMESTAMP_COL) >= F.timestamp_millis(F.lit(ts_ms)))
            .groupBy(BUCKET_COL)
            .agg(F.min(OFFSET_COL).alias("mn"))
            .collect()
        )
        out = self.latest_offsets()  # buckets with no newer data -> read from end
        for r in rows:
            out[int(r[BUCKET_COL])] = int(r["mn"])
        return out

    def count_from_metadata(self) -> int:
        """A1: count(*) served from commit metadata — no file reads
        (PushdownUtils.countTable equivalent): sum of (hwm - start) per
        bucket, exact even after TTL trims the log head."""
        earliest = self.earliest_offsets()
        return sum(off - earliest.get(b, 0) for b, off in self.latest_offsets().items())


def footer_minmax(paths: list[str], column: str):
    """(min, max) of `column` over every Parquet row group under
    `paths` from footer statistics only — shared by the log-tier A2
    walk and the pk-snapshot walk. Returns None (caller falls back to a
    scan) when any row group lacks exact stats for the column."""
    import pyarrow.parquet as pq

    lo = hi = None
    for d in paths:
        for root, _dirs_, files in os.walk(d):
            for fn in files:
                if not fn.endswith(".parquet"):
                    continue
                md = pq.read_metadata(os.path.join(root, fn))
                try:
                    idx = md.schema.names.index(column)
                except ValueError:
                    return None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        return None  # e.g. an all-null row group
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)
