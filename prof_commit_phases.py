"""Scratch profiler: apportion the steady-state fused-commit driver gap.

Splits ONE upsert into its phases by calling the internals in the same
order upsert() does, timing each driver-side construction step and the
write action separately:

  - _fold_input build (batch proj, discovery job if any, seed, union,
    repartition, __seq layer)          -> per-layer eager JVM analyses
  - replay() build                     -> fold + emit layers
  - _commit_plan build                 -> sys-cast / offsets / routing
  - _write_combined (the ONE action)   -> job + JVM analysis/opt/codegen
  - _commit_finish                     -> footer HWM, renames, manifest

Run: python prof_commit_phases.py [reps]
"""

import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("fluss_spark")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from fluss_spark.catalog import Catalog  # noqa: E402
from fluss_spark.operators.replay import replay  # noqa: E402
from fluss_spark.sources.kv import BUCKET_COL, _aqe_off_enter, _aqe_off_exit  # noqa: E402
from fluss_spark.table import create_table  # noqa: E402
from fluss_spark.types import Field, TableSchema  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
    "event_id", "user_id", "event_type", "value"
)

wh = tempfile.mkdtemp(prefix="fluss_phase_")
cat = Catalog(wh)
schema = TableSchema(
    fields=[Field("user_id", "BIGINT"), Field("event_type", "STRING"), Field("value", "DOUBLE")],
    primary_key=["user_id"],
    num_buckets=8,
)
t = create_table(cat, "db", "prof", schema)

# warm: bulk load + one incremental commit (JIT all plans)
t.upsert(ev.filter(F.col("event_id") % 3 == 0), ordering=["event_id"])
t.upsert(ev.filter(F.col("event_id") % 3 == 1), ordering=["event_id"])

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
batch = ev.filter(F.col("event_id") % 3 == 2)

for rep in range(REPS):
    kv = t.kv
    marks = [("start", time.perf_counter())]

    def mark(name):
        marks.append((name, time.perf_counter()))

    _aqe_off_enter(spark)
    try:
        fold_in, mhd, bb, ps, prior = kv._fold_input(
            spark, batch, ["event_id"], None, fused=True
        )
        mark("fold_input build")
        changelog, _ = replay(
            fold_in, schema, may_have_deletes=mhd,
            cluster_cols=[BUCKET_COL], emit_prior=True,
        )
        mark("replay build")
        kv.log.clean_orphans()
        state0 = kv.catalog.current_commit(kv.db, kv.table)
        version = state0.version + 1
        ts_ms = int(time.time() * 1000)
        mark("clean+state")
        out, persisted, auto_next = kv._commit_plan(
            spark, changelog, ts_ms, bb, ps, state0, prior, prior_included=True
        )
        mark("commit_plan build")
        combined = os.path.join(kv.log.tmp_dir, f"commit-v{version}")
        kv._write_combined(out, combined, persisted)
        mark("write action")
        kv._commit_finish(spark, combined, state0, version, ts_ms, auto_next)
        mark("commit_finish")
    finally:
        _aqe_off_exit(spark)

    total = marks[-1][1] - marks[0][1]
    print(f"\n=== rep {rep}: wall {total:.3f}s ===")
    for (n0, t0), (n1, t1) in zip(marks, marks[1:]):
        print(f"  {n1:20s} {t1 - t0:7.3f}s")
