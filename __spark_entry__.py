"""Driver contract for the spark-graft builder (PySpark target).

entry(spark) runs the flagship query at sf0.001; queries()/oracle_sql()
expose every implemented operator from SURVEY.md §2 (registered in
fluss_spark.registry by the operator modules).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fluss_spark import registry

registry.load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["join_star_broadcast"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get a
    weaker rows-only check)."""
    return dict(registry.ORACLES)
