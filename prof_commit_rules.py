"""Scratch profiler: apportion the per-commit JVM analysis/optimization
cost across Catalyst rules via RuleExecutor.dumpTimeSpent().

Warms the commit shape, resets the JVM rule metrics, runs REPS
steady-state upserts (the real SQL-fold path), and dumps cumulative
per-rule wall time — per-commit cost = dump / REPS. Measurement only;
informs whether scoped spark.sql.optimizer.excludedRules could cut the
write action's planning constant or whether it is spread thin (floor).

Run: python prof_commit_rules.py [reps]
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
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from fluss_spark.catalog import Catalog  # noqa: E402
from fluss_spark.table import create_table  # noqa: E402
from fluss_spark.types import Field, TableSchema  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
    "event_id", "user_id", "event_type", "value"
)

wh = tempfile.mkdtemp(prefix="fluss_rules_")
cat = Catalog(wh)
schema = TableSchema(
    fields=[Field("user_id", "BIGINT"), Field("event_type", "STRING"), Field("value", "DOUBLE")],
    primary_key=["user_id"],
    num_buckets=8,
)
t = create_table(cat, "db", "prof", schema)

# warm: bulk load + one incremental commit (JIT all plans)
t.upsert(ev.filter(F.col("event_id") % 5 == 0), ordering=["event_id"])
t.upsert(ev.filter(F.col("event_id") % 5 == 1), ordering=["event_id"])

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
jvm = spark.sparkContext._jvm
RuleExecutor = jvm.org.apache.spark.sql.catalyst.rules.RuleExecutor
RuleExecutor.resetMetrics()

walls = []
for rep in range(REPS):
    batch = ev.filter(F.col("event_id") % 5 == 2 + (rep % 3))
    t0 = time.perf_counter()
    t.upsert(batch, ordering=["event_id"])
    walls.append(time.perf_counter() - t0)

print(f"commit walls: {[round(w, 3) for w in walls]}")
dump = RuleExecutor.dumpTimeSpent()
lines = [l for l in dump.splitlines() if l.strip()]
print(f"=== cumulative over {REPS} commits (per-commit = /{REPS}) ===")
for l in lines[:60]:
    print(l)
