"""fluss_spark — a PySpark-native streaming-table engine.

A from-scratch rebuild of the query/data-processing capabilities of
apache/fluss (streaming lakehouse storage: log tables, primary-key
tables, merge engines, changelog/CDC, lookups, pushdown scans) expressed
with idiomatic Spark: DataFrame/SQL plans optimized by Catalyst, Parquet
as the columnar batch format, Structured Streaming for the streaming
read model.

Reference (behavior only, not code): /root/reference (apache/fluss).
"""

from fluss_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
