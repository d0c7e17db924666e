"""Primary-key (KV) table store: upsert transaction, snapshot versions,
lookups, changelog views.

The reference's write path (server/kv/KvTablet.java:514-792) reads the
old value from RocksDB per record, merges, and appends +I/-U/+U/-D rows
to the WAL; snapshots of the KV store are uploaded periodically
(server/kv/snapshot/). Here one deterministic transaction does all of
it set-at-a-time:

  1. seed   = current snapshot (version V)
  2. fold   = operators/replay.py window fold over seed ∪ batch
  3. WAL    = changelog rows appended to the log store (gets __offset;
              the changelog IS the log, exactly like the reference)
  4. state  = untouched snapshot keys (anti-join on changelog keys)
              ∪ final state replayed from the just-written changelog —
              which makes "changelog replay reproduces the snapshot"
              (SortMergeReader.java:30-55) an *executed invariant* of
              every commit, not just a test
  5. one atomic commit advances the table to version V'

Scale: everything distributes by pk hash; the snapshot rewrite is
copy-on-write per commit (compaction/retention in maintenance.py).
"""

from __future__ import annotations

import os

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

    # ------------------------------------------------------------------ #
    # upsert / delete transaction (M1-M9)
    # ------------------------------------------------------------------ #
    def upsert(
        self,
        df: DataFrame,
        ordering: list[str] | None = None,
        partial_update_cols: list[str] | None = None,
        commit_ts_ms: int | None = None,
    ) -> CommitState:
        """Apply a batch of upserts/deletes. Rows may carry an `__op`
        column ('U'/'D'); absent means all upserts. `ordering` fixes the
        intra-batch fold order per key (default: arrival order).
        `partial_update_cols` = target columns incl. pk (M3,
        client/table/writer/Upsert.java:39-59)."""
        spark = df.sparkSession
        schema = self.schema
        pk, cols = schema.primary_key, schema.data_columns()

        batch_cols = partial_update_cols or cols
        if partial_update_cols is not None:
            missing_pk = [c for c in pk if c not in partial_update_cols]
            if missing_pk:
                raise ValueError(f"partial update must include the primary key, missing {missing_pk}")

        # normalize the batch: every data column present (nulls for
        # non-target), __op, per-key fold sequence
        b = df
        if OP_COL not in b.columns:
            b = b.withColumn(OP_COL, F.lit("U"))
        for f in schema.fields:
            if f.name not in b.columns:
                b = b.withColumn(f.name, F.lit(None).cast(parse_type(f.type)))
            else:
                b = b.withColumn(f.name, F.col(f.name).cast(parse_type(f.type)))
        order_cols = [F.col(c) for c in ordering] if ordering else [F.monotonically_increasing_id()]
        w_seq = Window.partitionBy(*pk).orderBy(*order_cols)
        b = (
            b.withColumn(SEQ_COL, F.row_number().over(w_seq).cast("long"))
            .withColumn(SEED_COL, F.lit(0))
            .select(*cols, OP_COL, SEQ_COL, SEED_COL)
        )

        seed = (
            self.snapshot(spark)
            .withColumn(OP_COL, F.lit("U"))
            .withColumn(SEQ_COL, F.lit(0).cast("long"))
            .withColumn(SEED_COL, F.lit(1))
        )
        fold_in = seed.select(*b.columns).unionByName(b)

        changelog, _ = replay(fold_in, schema, partial_update_cols=partial_update_cols)

        # WAL append: per-bucket offsets ordered by the fold sequence.
        # All events of one key land in one bucket (bucket key ⊆ pk), so
        # per-key changelog order is preserved in offset order.
        wal_order = [SEQ_COL, SUB_COL] + pk
        state = self.log.append(
            changelog,
            ordering=wal_order,
            extra_cols=[CHANGE_TYPE_COL, SEQ_COL, SUB_COL],
            commit_ts_ms=commit_ts_ms,
            defer_commit=True,
        )
        version = state.version

        # new snapshot = untouched keys + final state from the written WAL
        # (read exactly this commit's files — one partition dir, no history scan)
        commit_path = os.path.join(self.log.log_dir, f"__commit={version}")
        written = spark.read.schema(self.log.file_schema()).parquet(commit_path)
        touched_final = self._state_from_changelog(written)
        old = self.snapshot(spark)
        # anti-join on ALL keys with change events (a key whose last event
        # is -D must not survive via the old snapshot)
        touched_keys = written.select(*pk).distinct()
        untouched = old.join(touched_keys, on=pk, how="left_anti")
        new_snapshot = untouched.unionByName(touched_final)

        snap_path = os.path.join(self.snapshot_dir, f"v{version}")
        (
            new_snapshot.withColumn(
                BUCKET_COL, F.pmod(F.hash(*schema.bucket_keys), F.lit(schema.num_buckets)).cast("int")
            )
            .repartition(min(schema.num_buckets, 32), F.col(BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(snap_path)
        )

        state.snapshot_version = version
        self.catalog.commit(self.db, self.table, state)
        return state

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
    def snapshot(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """KV snapshot scan (S4). `version` = time travel to an older
        snapshot (M11 — snapshot-id = version dir)."""
        state = self.catalog.current_commit(self.db, self.table)
        v = state.snapshot_version if version is None else version
        path = os.path.join(self.snapshot_dir, f"v{v}")
        if v < 0 or not os.path.exists(path):
            return spark.createDataFrame([], self.schema.to_struct_type())
        return (
            spark.read.schema(self._snapshot_schema())
            .option("basePath", path)
            .parquet(path)
            .drop(BUCKET_COL)
        )

    def _snapshot_schema(self):
        from pyspark.sql import types as T

        fields = list(self.schema.to_struct_type().fields)
        fields.append(T.StructField(BUCKET_COL, T.IntegerType(), True))
        return T.StructType(fields)

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
        The bucket filter folds to a constant → partition-dir pruning,
        then Parquet row-group stats prune within the bucket."""
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
        state = self.catalog.current_commit(self.db, self.table)
        v = state.snapshot_version
        if v < 0:
            return self.snapshot(spark).filter(self._key_cond(key))
        path = os.path.join(self.snapshot_dir, f"v{v}")
        df = spark.read.schema(self._snapshot_schema()).option("basePath", path).parquet(path)
        bucket_expr = F.pmod(
            F.hash(*[F.lit(key[c]) for c in bucket_key]), F.lit(schema.num_buckets)
        )
        return (
            df.filter(F.col(BUCKET_COL).cast("int") == bucket_expr)
            .filter(self._key_cond(key))
            .drop(BUCKET_COL)
        )

    @staticmethod
    def _key_cond(key: dict[str, object]):
        cond = F.lit(True)
        for c, v in key.items():
            cond = cond & (F.col(c) == F.lit(v))
        return cond
