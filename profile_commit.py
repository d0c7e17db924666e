"""Profiler: per-job breakdown of one steady-state pk-upsert commit.

Not part of the test suite — a scratch tool for the round-7 commit-path
work. Creates its own SparkSession with the UI enabled so the REST API
can report job/stage timings.
"""

import json
import os
import tempfile
import time
import urllib.request

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
    .config("spark.sql.parquet.aggregatePushdown", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4049")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

from fluss_spark.catalog import Catalog  # noqa: E402
from fluss_spark.table import FlussTable, create_table  # noqa: E402
from fluss_spark.types import Field, TableSchema  # noqa: E402

sf = "/root/testdata/sf0.1"
ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
    "event_id", "user_id", "event_type", "value"
)

wh = tempfile.mkdtemp(prefix="fluss_prof_")
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


def jobs():
    app = json.load(urllib.request.urlopen("http://localhost:4049/api/v1/applications"))[0]["id"]
    return json.load(
        urllib.request.urlopen(f"http://localhost:4049/api/v1/applications/{app}/jobs?status=succeeded")
    )


REPS = 5
for rep in range(REPS):
    before = {j["jobId"] for j in jobs()}
    t0 = time.time()
    t.upsert(ev.filter(F.col("event_id") % 3 == 2), ordering=["event_id"])
    wall = time.time() - t0
    new = [j for j in jobs() if j["jobId"] not in before]
    new.sort(key=lambda j: j["jobId"])
    print(f"\n=== rep {rep}: wall {wall:.2f}s, {len(new)} jobs ===")
    tot = 0.0
    for j in new:
        t_start = j["submissionTime"]
        t_end = j["completionTime"]
        from datetime import datetime

        fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
        dur = (
            datetime.strptime(t_end, fmt) - datetime.strptime(t_start, fmt)
        ).total_seconds()
        tot += dur
        desc = (j.get("description") or j["name"])[:110]
        print(f"  job {j['jobId']}: {dur:6.3f}s  stages={len(j['stageIds'])}  {desc}")
    print(f"  sum of job durations: {tot:.2f}s (gap = driver time: {wall - tot:.2f}s)")
