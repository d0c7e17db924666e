"""SparkSession factory tuned for this engine.

Local-mode defaults sized for the test harness (local[N], single JVM);
on a real cluster the same configs apply per-executor and AQE handles
runtime re-planning. Everything here is standard public Spark config.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "fluss_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - shuffle partitions ~= cores (not the 200 default) so local runs
      don't over-parallelize; AQE coalesces further at runtime.
    - AQE on: runtime join-strategy switch + skew-join splitting is our
      answer to skewed bucket keys at scale.
    - UTC session timezone: required for value-parity with the DuckDB
      oracle (DuckDB timestamps are UTC-naive).
    - Arrow on: vectorized Python interop for the few pandas-UDF paths.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("FLUSS_SPARK_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
