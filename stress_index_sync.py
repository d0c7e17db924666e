"""Scale-stress for the secondary-index maintenance path (L6 family).

Per-sync cost decomposes as O(changelog slice) for the fold PLUS
O(live index rows in TOUCHED buckets) for the snapshot rewrite — the
engine's bucket-granular commit contract. The stress measures both
regimes while the base table (and index) grows 200k -> 2.2M rows:

- NARROW deltas (fixed 20k rows confined to 4 indexed values -> at
  most 4 of 32 index buckets touched): the rewrite term is bounded by
  those buckets' rows, so wall time must stay near-flat as the index
  grows 10x.
- BROAD deltas (fixed 20k rows spread over all 2000 indexed values ->
  every bucket touched): each sync rewrites the whole index, so the
  wall carries a visible linear term in index size. This regime is the
  worst case by construction; at scale it is managed by sync cadence
  (batch many commits per sync — the rewrite amortizes) and bucket
  count (rewrite granularity shrinks as buckets grow).

Run: python stress_index_sync.py  (uses local[$SPARK_GRAFT_CPUS])
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
    .appName("fluss_stress_idx")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import tempfile

from fluss_spark.catalog import Catalog
from fluss_spark.indexes import create_index, index_lookup, sync_index
from fluss_spark.table import create_table
from fluss_spark.types import Field, TableSchema

wh = tempfile.mkdtemp(prefix="fluss_stress_idx_")
cat = Catalog(wh)

STEP = 200_000
STEPS = 10
DELTA = 20_000
VALUES = 2_000  # distinct indexed values -> ~1000 base rows per value at 2M

schema = TableSchema(
    fields=[
        Field("event_id", "BIGINT", nullable=False),
        Field("user_id", "BIGINT", nullable=False),
        Field("event_type", "STRING"),
        Field("value", "DOUBLE"),
    ],
    primary_key=["event_id"],
    num_buckets=32,
)
t = create_table(cat, "db", "idx_base", schema)


def batch(lo: int, n: int):
    # deterministic PRF-ish columns off the id (no Date/random on the
    # driver; stable across runs)
    return (
        spark.range(lo, lo + n)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(VALUES)).alias("user_id"),
            F.concat(F.lit("t"), F.pmod(F.col("id"), F.lit(7))).alias("event_type"),
            (F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(10_000)) / 100.0).alias(
                "value"
            ),
        )
    )


# seed + index over user_id (the l6 shape: pk=event_id, index col=user_id)
t.upsert(batch(0, STEP), ordering=["event_id"])
create_index(cat, "db", "idx_base", "user_id", spark)

def delta_batch(lo: int, step: int, narrow: bool):
    """Fixed 20k-key update batch. narrow=True hits the SAME key window
    every step and keeps its indexed values inside {0..3} (so after the
    first step both the new mappings AND the retractions of the prior
    ones live in <=4 of the 32 index buckets); narrow=False hits a
    sliding window whose prior and new values spread over all VALUES
    (every bucket touched — mappings and retractions alike). The value
    varies per step so every row is a real change."""
    moved = F.pmod(F.xxhash64(F.col("id"), F.lit(100 + step)), F.lit(4 if narrow else VALUES))
    return spark.range(lo, lo + DELTA).select(
        F.col("id").alias("event_id"),
        moved.alias("user_id"),
        F.lit("moved").alias("event_type"),
        (F.lit(1.0) + step).alias("value"),
    )


walls: dict[str, list[float]] = {"narrow": [], "broad": []}
for step in range(1, STEPS + 1):
    # grow the base by 200k fresh keys and absorb it (not timed: this
    # sync's slice grows the INDEX, the timed ones below stay fixed)
    t.upsert(batch(step * STEP, STEP), ordering=["event_id"])
    sync_index(cat, "db", "idx_base", "user_id", spark)

    row = f"step {step:2d}: base={(step + 1) * STEP:>9,} rows "
    for regime in ("narrow", "broad"):
        # narrow pins keys [0, DELTA); broad slides through fresh keys
        lo = 0 if regime == "narrow" else (step - 1) * STEP + DELTA
        t.upsert(delta_batch(lo, step, regime == "narrow"), ordering=["event_id"])
        t0 = time.perf_counter()
        n = sync_index(cat, "db", "idx_base", "user_id", spark)
        w = time.perf_counter() - t0
        walls[regime].append(w)
        row += f" {regime}: slice={n:>6,} sync={w:5.2f}s"
    print(row, flush=True)

for regime in ("narrow", "broad"):
    ws = walls[regime]
    tail = ws[1:]  # step 1's narrow sync still retracts broad seed values
    print(
        f"\n{regime} sync walls:", " ".join(f"{w:.2f}" for w in ws),
        f"\n  steps 2-{STEPS}: first {tail[0]:.2f}s vs last {tail[-1]:.2f}s "
        f"at 10x table+index size",
    )

# sanity probe: lookups stay correct after all the moves
got = index_lookup(cat, "db", "idx_base", "user_id", 0, spark).count()
print(f"lookup(user_id=0) -> {got} rows (plan-bounded single-bucket probe)")
