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


def connect(warehouse: str):
    """Entry point mirroring the reference's ConnectionFactory: returns
    a Connection with get_table()/get_admin() (see fluss_spark.client)."""
    from fluss_spark.client import connect as _connect

    return _connect(warehouse)


def sql_session(warehouse: str, spark, default_db: str = "fluss"):
    """SQL statement executor over a warehouse (see fluss_spark.sql_ddl)."""
    from fluss_spark.catalog import Catalog
    from fluss_spark.sql_ddl import FlussSqlSession

    return FlussSqlSession(Catalog(warehouse), spark, default_db)


__all__ = ["get_spark", "connect", "sql_session"]
__version__ = "0.1.0"
