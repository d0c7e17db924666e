"""Physical-plan inspection helpers — the engine's pushdown contract.

The reference's connector tests assert on `explainSql` output to prove
pushdowns applied (FlinkTableSourceBatchITCase.java:103-272). Same idea
here: these helpers read Spark's formatted physical plan and assert the
properties that matter at 100 TB — filters reached the Parquet scan,
projections pruned the read schema, partition filters pruned
directories, small dims broadcast, aggregates run partial+final inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as df.explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(l for l in physical_plan(df).splitlines() if "PushedFilters" in l)


def read_schema(df: DataFrame) -> str:
    return "\n".join(l for l in physical_plan(df).splitlines() if "ReadSchema" in l)


def partition_filters(df: DataFrame) -> str:
    return "\n".join(l for l in physical_plan(df).splitlines() if "PartitionFilters" in l)


def final_plan(df: DataFrame) -> str:
    """Simple plan AFTER execution — under AQE the join strategy and
    codegen markers only exist in the final re-planned version."""
    df.collect()  # count() builds a different plan; collect finalizes THIS one
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in final_plan(df)


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # simple mode marks codegen'd operators with "*(n)"
    return "*(" in final_plan(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine before the shuffle: two HashAggregate nodes."""
    return physical_plan(df).count("HashAggregate") >= 2


def assert_contains(text: str, *needles: str) -> None:
    for n in needles:
        assert n in text, f"expected {n!r} in:\n{text}"
