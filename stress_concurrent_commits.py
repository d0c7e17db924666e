"""Stress: optimistic concurrent commits vs the serial lock.

Not part of the test suite — a scratch benchmark for the round-10
concurrency work. Four writers upsert four DISJOINT partitions of a
partitioned pk table (sf0.1 events split by event_type); the serial
table takes the global write lock per commit, the optimistic table runs
the writers on real threads (table.commit.concurrency=optimistic).
Correctness is asserted (identical final snapshots), wall-clock
compared. On a contended host run it twice and trust the ratio, not the
absolute numbers (NOTES.md noise bands).
"""

import os
import tempfile
import threading
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("fluss_spark_occ_stress")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from fluss_spark.catalog import Catalog  # noqa: E402
from fluss_spark.table import FlussTable, create_table  # noqa: E402
from fluss_spark.types import Field, TableSchema  # noqa: E402

sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ev = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
    "event_type", "user_id", "value", "event_id"
)
parts = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
print(f"partitions: {sorted(parts)}")

wh = tempfile.mkdtemp(prefix="fluss_occ_stress_")
cat = Catalog(wh)


def mk(name, mode):
    schema = TableSchema(
        fields=[
            Field("event_type", "STRING", nullable=False),
            Field("user_id", "BIGINT", nullable=False),
            Field("value", "DOUBLE"),
        ],
        primary_key=["event_type", "user_id"],
        partition_keys=["event_type"],
        num_buckets=8,
        properties={"table.commit.concurrency": mode},
    )
    return create_table(cat, "db", name, schema)


half = ev.agg(F.max("event_id")).first()[0] // 2
seed = ev.filter(F.col("event_id") <= half)
second = ev.filter(F.col("event_id") > half)

results = {}
for mode in ("serial", "optimistic"):
    t = mk(f"occ_{mode}", mode)
    t.upsert(seed, ordering=["event_id"])  # warm + shared base

    def writer(part):
        handle = FlussTable(cat, "db", f"occ_{mode}")
        handle.upsert(
            second.filter(F.col("event_type") == part), ordering=["event_id"]
        )

    t0 = time.time()
    if mode == "serial":
        for p in parts:
            writer(p)
    else:
        threads = [threading.Thread(target=writer, args=(p,)) for p in parts]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
    results[mode] = time.time() - t0
    print(f"{mode}: {len(parts)} disjoint-partition commits in {results[mode]:.2f}s")

a = sorted(
    tuple(r) for r in FlussTable(cat, "db", "occ_serial").snapshot(spark).collect()
)
b = sorted(
    tuple(r) for r in FlussTable(cat, "db", "occ_optimistic").snapshot(spark).collect()
)
assert a == b, "serial and optimistic final states diverge"
print(
    f"states identical ({len(a)} rows); speedup = "
    f"{results['serial'] / results['optimistic']:.2f}x"
)
