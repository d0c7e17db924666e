"""Primary-key (KV) table store: upsert transaction, incremental
bucket-manifest snapshots, lookups, changelog views.

The reference's write path (server/kv/KvTablet.java:514-792) reads the
old value from RocksDB per record, merges, and appends +I/-U/+U/-D rows
to the WAL; KV snapshots upload per-tablet and only changed tablets
produce new files (server/kv/snapshot/). Here one deterministic
transaction does all of it set-at-a-time:

  1. seed   = snapshot rows of the BATCH's buckets, semi-joined to the
              batch's keys (the distributed read-old; O(batch), not
              O(table))
  2. fold   = operators/replay.py window fold over seed ∪ batch
  3. WAL    = changelog rows appended to the log store (gets __offset;
              the changelog IS the log, exactly like the reference)
  4. state  = ONLY touched buckets are rewritten: new files =
              (old bucket rows minus touched keys) ∪ final states
              replayed from the just-written changelog. Untouched
              buckets stay as prior-version files, referenced through a
              per-version manifest {bucket -> data dir} — per-commit
              write cost is O(touched buckets), not O(table)
  5. one atomic commit advances the table to version V'

The snapshot derivation from the written WAL makes "changelog replay
reproduces the snapshot" (SortMergeReader.java:30-55) an *executed
invariant* of every commit, not just a test.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.catalog import Catalog, CommitState
from fluss_spark.operators.replay import (
    OP_COL,
    SEED_COL,
    SEQ_COL,
    SUB_COL,
    replay,
)
from fluss_spark.sources.log import LogStore
from fluss_spark.types import (
    BUCKET_COL,
    CHANGE_TYPE_COL,
    DELETE,
    OFFSET_COL,
    TIMESTAMP_COL,
    parse_type,
)


class KvStore:
    def __init__(self, catalog: Catalog, db: str, table: str):
        self.catalog = catalog
        self.db = db
        self.table = table
        self.schema = catalog.get_schema(db, table)
        if not self.schema.is_pk_table:
            raise ValueError(f"{db}.{table} is not a primary-key table")
        self.log = LogStore(catalog, db, table)
        self.snapshot_dir = os.path.join(catalog.table_dir(db, table), "snapshot")
        self.manifest_dir = os.path.join(catalog.table_dir(db, table), "meta", "snapshots")

    # ------------------------------------------------------------------ #
    # manifests: per-version {bucket -> data dir name}
    # ------------------------------------------------------------------ #
    def _manifest(self, version: int) -> dict[int, str] | None:
        p = os.path.join(self.manifest_dir, f"v{version}.json")
        if version < 0 or not os.path.exists(p):
            return None
        with open(p) as f:
            return {int(k): v for k, v in json.load(f)["buckets"].items()}

    def _write_manifest(self, version: int, buckets: dict[int, str]) -> None:
        Catalog._write_atomic(
            os.path.join(self.manifest_dir, f"v{version}.json"),
            json.dumps({"buckets": {str(k): v for k, v in buckets.items()}}),
        )

    def _bucket_expr(self):
        return F.pmod(F.hash(*self.schema.bucket_keys), F.lit(self.schema.num_buckets)).cast("int")

    # ------------------------------------------------------------------ #
    # upsert / delete transaction (M1-M9)
    # ------------------------------------------------------------------ #
    def upsert(
        self,
        df: DataFrame,
        ordering: list[str] | None = None,
        partial_update_cols: list[str] | None = None,
        commit_ts_ms: int | None = None,
        merge_mode: str | None = None,
    ) -> CommitState:
        """Apply a batch of upserts/deletes. Rows may carry an `__op`
        column ('U'/'D'); absent means all upserts. `ordering` fixes the
        intra-batch fold order per key (default: arrival order).
        `partial_update_cols` = target columns incl. pk (M3,
        client/table/writer/Upsert.java:39-59)."""
        spark = df.sparkSession
        schema = self.schema
        pk, cols = schema.primary_key, schema.data_columns()

        if partial_update_cols is not None:
            missing_pk = [c for c in pk if c not in partial_update_cols]
            if missing_pk:
                raise ValueError(f"partial update must include the primary key, missing {missing_pk}")

        fold_in, may_have_deletes = self._fold_input(spark, df, ordering)

        changelog, _ = replay(
            fold_in,
            schema,
            partial_update_cols=partial_update_cols,
            merge_mode=merge_mode,
            may_have_deletes=may_have_deletes,
        )
        return self._commit_changelog(spark, changelog, commit_ts_ms)

    def _fold_input(
        self, spark: SparkSession, df: DataFrame, ordering: list[str] | None
    ) -> tuple[DataFrame, bool]:
        """Build the fold input (seed ∪ batch, with per-key __seq) so the
        whole upsert fold costs ONE pk hash exchange
        (tests/test_plans.py pins this on the full path)."""
        schema = self.schema
        pk, cols = schema.primary_key, schema.data_columns()
        # normalize the batch: every data column present (nulls for
        # non-target), __op. The per-key fold sequence (__seq) is NOT
        # assigned here: a window on the bare batch would cost its own pk
        # exchange, and the union with the seed below discards the
        # partitioning, forcing the fold to exchange AGAIN. Instead the
        # ordering columns ride along and __seq is computed after the
        # union, inside the fold's single pk exchange.
        b = df
        may_have_deletes = OP_COL in b.columns  # no __op => all upserts
        if ordering:
            ord_names = [c for c in ordering]
        else:
            b = b.withColumn("__arrival", F.monotonically_increasing_id())
            ord_names = ["__arrival"]
        ord_extra = [c for c in ord_names if c not in cols]
        # ONE projection (a per-field withColumn loop costs a full plan
        # copy + re-analysis per column — pure driver latency per commit)
        have = set(b.columns)
        proj = [
            (
                F.col(f.name).cast(parse_type(f.type))
                if f.name in have
                else F.lit(None).cast(parse_type(f.type))
            ).alias(f.name)
            for f in schema.fields
        ]
        proj.append(
            (F.col(OP_COL) if may_have_deletes else F.lit("U")).alias(OP_COL)
        )
        proj.append(F.lit(0).alias(SEED_COL))
        proj += [F.col(c) for c in ord_extra]
        b = b.select(*proj).select(*cols, OP_COL, SEED_COL, *ord_extra)

        # read-old restricted to the batch's buckets and keys; on a table
        # with no snapshot yet (first commit) there is nothing to read, so
        # the batch-bucket discovery job is skipped entirely
        manifest_now = self._manifest(
            self.catalog.current_commit(self.db, self.table).snapshot_version
        )
        has_snapshot = bool(manifest_now)
        # the batch-bucket discovery job pays off only when it can prune
        # a LARGE bucket space; under ~64 buckets the semi-join on keys
        # already bounds the read, so skip the extra job
        if has_snapshot and len(manifest_now) > 64:
            batch_buckets = [
                int(r["b"])
                for r in b.select(self._bucket_expr().alias("b")).distinct().collect()
            ]
        else:
            batch_buckets = None if has_snapshot else []
        # no .distinct() on the probe side: a semi join dedups by
        # definition, and the distinct would cost its own exchange + agg
        seed = (
            self.snapshot(spark, buckets=batch_buckets)
            .join(b.select(*pk), on=pk, how="left_semi")
            .withColumn(OP_COL, F.lit("U"))
            .withColumn(SEED_COL, F.lit(1))
        )
        ord_types = dict(b.dtypes)
        for c in ord_extra:  # seed rows sort first by SEED, ord is moot
            seed = seed.withColumn(c, F.lit(None).cast(ord_types[c]))
        fold_in = seed.select(*b.columns).unionByName(b)
        # __seq inside the fold's own pk exchange: seed first (SEED desc),
        # then batch rows in `ordering` order. Batch rows number 1.. per
        # key whether or not a seed row exists (sum(SEED) over the key =
        # presence); seed rows pin __seq=0 — identical semantics to the
        # old pre-union row_number window, minus one full-batch exchange.
        w_fold = Window.partitionBy(*pk).orderBy(
            F.col(SEED_COL).desc(), *[F.col(c).asc_nulls_first() for c in ord_names]
        )
        has_seed = F.sum(SEED_COL).over(Window.partitionBy(*pk))
        fold_in = fold_in.withColumn(
            SEQ_COL,
            F.when(F.col(SEED_COL) == 1, F.lit(0))
            .otherwise(F.row_number().over(w_fold) - has_seed)
            .cast("long"),
        ).select(*cols, OP_COL, SEQ_COL, SEED_COL)
        return fold_in, may_have_deletes

    def _commit_changelog(
        self, spark: SparkSession, changelog: DataFrame, commit_ts_ms: int | None
    ) -> CommitState:
        """WAL append + touched-bucket snapshot rewrite + atomic commit.

        WAL-FIRST: the fold plan is computed exactly ONCE — inside the
        WAL write job — and the STAGED WAL FILES are the lineage cut.
        The snapshot derivation re-reads those files (metadata-listed,
        bucket-pruned), so it can never diverge from what was appended
        even if the input DataFrame is non-deterministic: the file is
        the record. This replaces the old eager localCheckpoint barrier
        (one extra full materialization + its scheduling round-trips per
        commit — ~25% of the steady-state commit constant) with the
        durable artifact the commit must produce anyway."""
        schema = self.schema
        pk = schema.primary_key

        # WAL append: per-bucket offsets ordered by the fold sequence.
        # All events of one key land in one bucket (bucket key ⊆ pk), so
        # per-key changelog order is preserved in offset order.
        old_hwm = {int(b): off for b, off in self.catalog.current_commit(self.db, self.table).log_hwm.items()}
        wal_order = [SEQ_COL, SUB_COL] + pk
        state = self.log.append(
            changelog,
            ordering=wal_order,
            extra_cols=[CHANGE_TYPE_COL, SEQ_COL, SUB_COL],
            commit_ts_ms=commit_ts_ms,
            defer_commit=True,
        )
        version = state.version
        # the staged files ARE this commit's changelog (see docstring)
        staging = self.log.staging_path(version)
        changelog = (
            spark.read.schema(self.log.file_schema())
            .option("basePath", staging)
            .parquet(staging)
        )

        # touched buckets = high-watermark diff — no extra Spark job
        touched_buckets = [
            int(b) for b, off in state.log_hwm.items() if off != old_hwm.get(int(b))
        ]

        old_manifest = self._manifest(
            self.catalog.current_commit(self.db, self.table).snapshot_version
        ) or {}
        new_manifest = dict(old_manifest)

        if touched_buckets:
            from fluss_spark.operators.replay import _snapshot_from_changelog

            # last change event per key in (seq, sub) order — per key
            # identical to WAL-offset order (wal_order above sorts by it)
            touched_final = _snapshot_from_changelog(changelog, schema)
            touched_keys = changelog.select(*pk)  # anti join dedups
            # only the touched buckets are rewritten; a key whose last
            # event is -D must not survive via the old rows (anti-join on
            # ALL keys with change events)
            old_rows = self.snapshot(spark, buckets=touched_buckets)
            untouched_keys = old_rows.join(touched_keys, on=pk, how="left_anti")
            bucket_rows = untouched_keys.unionByName(touched_final)

            data_dir = f"data-v{version}"
            (
                bucket_rows.withColumn(BUCKET_COL, self._bucket_expr())
                .repartition(min(schema.num_buckets, 32), F.col(BUCKET_COL))
                .write.mode("overwrite")
                .partitionBy(BUCKET_COL)
                .parquet(os.path.join(self.snapshot_dir, data_dir))
            )
            for bkt in touched_buckets:
                new_manifest[bkt] = data_dir

        self._write_manifest(version, new_manifest)
        state.snapshot_version = version
        self.log.publish(version)
        self.catalog.commit(self.db, self.table, state)
        return state

    def insert_if_not_exists(self, df: DataFrame, ordering: list[str] | None = None) -> DataFrame:
        """L3 (Lookup.enableInsertIfNotExists, Lookup.java:96-105):
        insert rows whose key is absent, then return the current row for
        every requested key (present rows win; absent ones are the
        freshly inserted values). One left-anti + one upsert commit."""
        spark = df.sparkSession
        pk = self.schema.primary_key
        # persist the anti-join so the presence probe and the upsert seed
        # don't each recompute the snapshot scan
        missing = df.join(self.snapshot(spark).select(*pk), on=pk, how="left_anti").persist()
        try:
            if missing.limit(1).count() > 0:
                self.upsert(missing, ordering=ordering)
        finally:
            missing.unpersist()
        return self.snapshot(spark).join(df.select(*pk).distinct(), on=pk, how="left_semi")

    def _state_from_changelog(self, changelog: DataFrame) -> DataFrame:
        """Replay invariant: the last change event per key IS its state;
        keys ending in -D are gone (SortMergeReader: 'change log wins')."""
        pk, cols = self.schema.primary_key, self.schema.data_columns()
        w = Window.partitionBy(*pk).orderBy(F.col(OFFSET_COL).desc())
        return (
            changelog.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col(CHANGE_TYPE_COL) != DELETE))
            .select(*cols)
        )

    # ------------------------------------------------------------------ #
    # reads (S4/S5/S6, L1/L2, T9)
    # ------------------------------------------------------------------ #
    def snapshot(
        self,
        spark: SparkSession,
        version: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame:
        """KV snapshot scan (S4). `version` = time travel to an older
        snapshot (M11 — snapshot-id = manifest version). `buckets`
        restricts the read to those buckets' files (manifest + partition
        dir pruning — the lookup fast path)."""
        if version is None:
            version = self.catalog.current_commit(self.db, self.table).snapshot_version
        manifest = self._manifest(version)
        if not manifest:
            return spark.createDataFrame([], self.schema.to_struct_type())
        wanted = set(manifest) if buckets is None else (set(buckets) & set(manifest))
        by_dir: dict[str, list[int]] = {}
        for bkt in wanted:
            by_dir.setdefault(manifest[bkt], []).append(bkt)
        parts = []
        for data_dir, bkts in sorted(by_dir.items()):
            df = self._read_snapshot_dir(spark, data_dir)
            # partition-dir pruning: this dir may hold older versions of
            # buckets that a newer dir supersedes
            parts.append(df.filter(F.col(BUCKET_COL).isin(bkts)))
        if not parts:
            return spark.createDataFrame([], self.schema.to_struct_type())
        return reduce(lambda a, b: a.unionByName(b), parts).drop(BUCKET_COL)

    def referenced_data_dirs(self, version: int) -> set[str]:
        m = self._manifest(version) or {}
        return set(m.values())

    def minmax_from_metadata(self, column: str, version: int | None = None):
        """A2 statistics for PK tables: (min, max) of a numeric/temporal
        column over the LIVE snapshot, from Parquet footer stats of the
        manifest's bucket dirs — driver-side, zero file reads. Exact
        because snapshot dirs hold exactly the live merged rows (the
        WAL's superseded versions and before-images never appear here —
        the reason LogStore.minmax_from_metadata refuses pk tables).
        Returns None (caller falls back to a snapshot scan) for string
        columns (truncatable stats), schema-evolution eras (physical
        names differ per dir), partition keys, stat-less row groups, or
        when no snapshot manifest exists yet."""
        from fluss_spark.sources.log import footer_minmax
        from fluss_spark.types import evolution_eras

        if evolution_eras(self.schema):
            return None
        if column in self.schema.partition_keys:
            return None
        field = next((f for f in self.schema.fields if f.name == column), None)
        if field is None or field.type.upper() in ("STRING", "VARCHAR", "BYTES", "BINARY"):
            return None
        if version is None:
            version = self.catalog.current_commit(self.db, self.table).snapshot_version
        manifest = self._manifest(version)
        if not manifest:
            return None
        # a data dir can physically hold buckets the CURRENT manifest
        # assigns to a newer dir — walk exactly the (dir, bucket) pairs
        # the manifest references, mirroring scan()'s per-bucket filter
        paths = [
            p
            for b, d in sorted(manifest.items())
            if os.path.isdir(p := os.path.join(self.snapshot_dir, d, f"{BUCKET_COL}={b}"))
        ]
        return footer_minmax(paths, column)

    def _snapshot_schema(self, era=None):
        from pyspark.sql import types as T

        from fluss_spark.types import era_struct_fields

        if era is None:
            fields = list(self.schema.to_struct_type().fields)
        else:  # physical layout of a pre-rename/retype snapshot dir
            fields = era_struct_fields(self.schema, era)
        fields.append(T.StructField(BUCKET_COL, T.IntegerType(), True))
        return T.StructType(fields)

    def _era_for_dir(self, data_dir: str):
        """Era mapping for one snapshot data dir (written at the commit
        version its name carries), or None for the current schema."""
        from fluss_spark.types import era_fields_for_commit, evolution_eras

        eras = evolution_eras(self.schema)
        if not eras:
            return None
        return era_fields_for_commit(eras, int(data_dir.split("-v")[1]))

    def _read_snapshot_dir(self, spark: SparkSession, data_dir: str) -> DataFrame:
        """One snapshot data dir, projected onto the CURRENT schema by
        field id (rename=alias, retype=widening cast). Identity (no
        eras / dir written under the current schema) keeps the exact
        bare-scan plan."""
        era = self._era_for_dir(data_dir)
        df = (
            spark.read.schema(self._snapshot_schema(era))
            .option("basePath", os.path.join(self.snapshot_dir, data_dir))
            .parquet(os.path.join(self.snapshot_dir, data_dir))
        )
        if era is not None:
            from fluss_spark.types import era_projection

            df = df.select(era_projection(self.schema, era, [BUCKET_COL]))
        return df

    def changelog(self, spark: SparkSession, start_offsets: dict[int, int] | None = None) -> DataFrame:
        """$changelog virtual table (T9): _change_type, _log_offset,
        _commit_timestamp + data columns, in WAL order."""
        from fluss_spark.types import COMMIT_TS_COL, LOG_OFFSET_COL

        df = self.log.scan(spark, start_offsets=start_offsets)
        return df.select(
            *self.schema.data_columns(),
            F.col(CHANGE_TYPE_COL),
            F.col(OFFSET_COL).alias(LOG_OFFSET_COL),
            F.col(TIMESTAMP_COL).alias(COMMIT_TS_COL),
            F.col(BUCKET_COL),
        )

    def binlog(self, spark: SparkSession) -> DataFrame:
        """$binlog virtual table (T9): -U/+U pairs fused into one row of
        (before struct, after struct); +I has null before, -D null after
        (BinlogFlinkTableSource.java:43, TableDescriptor.java:64-70)."""
        pk, cols = self.schema.primary_key, self.schema.data_columns()
        from fluss_spark.types import INSERT, UPDATE_AFTER, UPDATE_BEFORE

        df = self.log.scan(spark)
        row = F.struct(*[F.col(c).alias(c) for c in cols])
        w = Window.partitionBy(BUCKET_COL).orderBy(OFFSET_COL)
        d = (
            df.withColumn("__row", row)
            .withColumn("__next_ct", F.lead(CHANGE_TYPE_COL).over(w))
            .withColumn("__next_row", F.lead("__row").over(w))
            .withColumn("__prev_ct", F.lag(CHANGE_TYPE_COL).over(w))
        )
        # -U followed by its +U becomes one UPDATE row; the +U is dropped
        fused = d.filter(~((F.col(CHANGE_TYPE_COL) == UPDATE_AFTER) & (F.col("__prev_ct") == UPDATE_BEFORE)))
        return fused.select(
            F.when(F.col(CHANGE_TYPE_COL) == INSERT, F.lit("INSERT"))
            .when(F.col(CHANGE_TYPE_COL) == UPDATE_BEFORE, F.lit("UPDATE"))
            .otherwise(F.lit("DELETE"))
            .alias("op_type"),
            F.when(F.col(CHANGE_TYPE_COL) != INSERT, F.col("__row")).alias("before"),
            F.when(F.col(CHANGE_TYPE_COL) == UPDATE_BEFORE, F.col("__next_row"))
            .when(F.col(CHANGE_TYPE_COL) == INSERT, F.col("__row"))
            .alias("after"),
            F.col(OFFSET_COL).alias("_log_offset"),
            F.col(BUCKET_COL),
        )

    def lookup(self, spark: SparkSession, key: dict[str, object]) -> DataFrame:
        """Point lookup by full primary key (L1, Lookuper.java:43-56).
        The bucket id is computed driver-side from the manifest → ONE
        data dir, one partition dir, then Parquet row-group stats prune
        within the bucket."""
        pk = self.schema.primary_key
        if sorted(key) != sorted(pk):
            raise ValueError(f"lookup key must be the full primary key {pk}, got {sorted(key)}")
        return self._keyed_read(spark, key, self.schema.bucket_keys)

    def prefix_lookup(self, spark: SparkSession, key: dict[str, object]) -> DataFrame:
        """Prefix lookup (L2, Lookup.java:87-105): key must equal the
        bucket key, which must be a prefix of the pk (validated at table
        definition in the reference, Lookup.java:66-90)."""
        bk = self.schema.bucket_keys
        if sorted(key) != sorted(bk):
            raise ValueError(f"prefix lookup key must be the bucket key {bk}, got {sorted(key)}")
        pk = self.schema.primary_key
        if pk[: len(bk)] != bk:
            raise ValueError(f"bucket key {bk} is not a prefix of primary key {pk}")
        return self._keyed_read(spark, key, bk)

    def _keyed_read(self, spark: SparkSession, key: dict[str, object], bucket_key: list[str]) -> DataFrame:
        schema = self.schema
        # cast literals to the DECLARED column types: Murmur3 hashes int
        # and bigint (etc.) differently, so an untyped literal would route
        # to the wrong bucket
        types = {f.name: parse_type(f.type) for f in schema.fields}
        bucket_expr = F.pmod(
            F.hash(*[F.lit(key[c]).cast(types[c]) for c in bucket_key]), F.lit(schema.num_buckets)
        )
        version = self.catalog.current_commit(self.db, self.table).snapshot_version
        manifest = self._manifest(version)
        if not manifest:
            return self.snapshot(spark).filter(self._key_cond(key))
        # resolve the owning bucket DRIVER-SIDE: the hash of literals is a
        # constant expression, so evaluate it once on a 1-row local
        # relation (no table scan, no shuffle, single local task). The
        # manifest then maps bucket -> exactly ONE data dir, so the lookup
        # plan is a single scan pruned to one __bucket partition dir —
        # not one scan per manifest dir (a 16-dir manifest previously
        # built 16 scans to read <=1 row).
        bkt = int(spark.range(1).select(bucket_expr.cast("int").alias("b")).first()["b"])
        data_dir = manifest.get(bkt)
        if data_dir is None:
            return spark.createDataFrame([], self.schema.to_struct_type())
        p = self._read_snapshot_dir(spark, data_dir)
        return (
            p.filter(F.col(BUCKET_COL) == F.lit(bkt))
            .filter(self._key_cond(key))
            .drop(BUCKET_COL)
        )

    @staticmethod
    def _key_cond(key: dict[str, object]):
        cond = F.lit(True)
        for c, v in key.items():
            cond = cond & (F.col(c) == F.lit(v))
        return cond
