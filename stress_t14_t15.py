"""Scale-stress for the two engine-state operators (round-7 verdict item 6).

t14: drive the incremental sessions store with 2M synthetic events over
8 commits (250k each, shuffled arrival) and record per-commit wall time
— the claim is O(batch + affected sessions), so per-commit time must
stay flat, not grow with the store.

t15: grow a pk table 1x -> 10x (commits of 200k upserts) and after each
growth step apply the SAME fixed 20k-row delta commit, then measure
snapshot_diff(v_before_delta) — the claim is O(delta), so diff time
must stay flat as the table grows 10x.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("fluss_stress")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tempfile

from fluss_spark.catalog import Catalog
from fluss_spark.table import create_table
from fluss_spark.types import Field, TableSchema

wh = tempfile.mkdtemp(prefix="fluss_stress_")
cat = Catalog(wh)

# ---------------- t14: 2M events, 8 commits ----------------
from fluss_spark.operators.engine_queries import _fold_session_batch

N = 2_000_000
BATCHES = 8
USERS = 50_000
schema = TableSchema(
    fields=[
        Field("user_id", "BIGINT"),
        Field("session_start", "TIMESTAMP_LTZ"),
        Field("last_ts", "TIMESTAMP_LTZ"),
        Field("n_events", "BIGINT"),
        Field("cents", "BIGINT"),
    ],
    primary_key=["user_id", "session_start"],
    bucket_keys=["user_id"],
    num_buckets=32,
    properties={},
)
t = create_table(cat, "stress", "sessions2m", schema)

# deterministic synthetic events: user bursts with ~3 sessions each;
# md5-PRF ordering delivers batches in arrival-shuffled order so late
# batches bridge stored sessions (the merge path, not just appends)
ev = (
    spark.range(N)
    .select(
        F.col("id").alias("event_id"),
        (F.pmod(F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10).cast("long"), F.lit(USERS))).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000)
            + F.pmod(F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 10).cast("long"), F.lit(3))
            * 7200
            + F.pmod(F.conv(F.substring(F.md5(F.col("id").cast("string")), 17, 8), 16, 10).cast("long"), F.lit(1800))
        ).alias("ts"),
        (F.pmod(F.conv(F.substring(F.md5(F.col("id").cast("string")), 25, 6), 16, 10).cast("long"), F.lit(10000)) / 100.0).alias("value"),
    )
    .withColumn("batch", F.pmod(F.conv(F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit("b"))), 1, 8), 16, 10).cast("long"), F.lit(BATCHES)))
    .persist()
)
ev.count()

t14_times = []
for b in range(BATCHES):
    batch = ev.filter(F.col("batch") == b).select("user_id", "event_id", "ts", "value")
    t0 = time.time()
    _fold_session_batch(t, spark, batch)
    dt = time.time() - t0
    n_store = t.snapshot(spark).count()
    t14_times.append((b, round(dt, 2), n_store))
    print(f"t14 commit {b}: {dt:.2f}s  store={n_store}", flush=True)

print("T14_RESULT", t14_times, flush=True)
ev.unpersist()

# ---------------- t15: diff stays O(delta) as the table grows 10x ----------------
schema2 = TableSchema(
    fields=[
        Field("k", "BIGINT"),
        Field("grp", "STRING"),
        Field("v", "DOUBLE"),
    ],
    primary_key=["k"],
    num_buckets=32,
    properties={},
)
t2 = create_table(cat, "stress", "difftab", schema2)

STEP = 200_000
DELTA = 20_000
t15_times = []
rows_so_far = 0
for step in range(1, 11):
    # growth commit: STEP new keys
    base = spark.range(rows_so_far, rows_so_far + STEP).select(
        F.col("id").alias("k"),
        F.concat(F.lit("g"), F.pmod(F.col("id"), F.lit(7)).cast("string")).alias("grp"),
        (F.col("id") % 1000 / 10.0).alias("v"),
    )
    t2.upsert(base)
    rows_so_far += STEP
    v_before = cat.current_commit("stress", "difftab").version
    # fixed-size delta: update DELTA existing keys spread over the table
    delta = spark.range(DELTA).select(
        (F.col("id") * (rows_so_far // DELTA)).alias("k"),
        F.lit("gX").alias("grp"),
        F.lit(-1.0).alias("v"),
    )
    t2.upsert(delta)
    t0 = time.time()
    n = t2.snapshot_diff(spark, v_before).count()
    dt = time.time() - t0
    t15_times.append((rows_so_far, round(dt, 2), n))
    print(f"t15 table={rows_so_far} diff({DELTA} delta): {dt:.2f}s  rows={n}", flush=True)

print("T15_RESULT", t15_times, flush=True)
spark.stop()
