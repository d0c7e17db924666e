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


def _plan_children(node):
    kids = []
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        kids.append(node.initialPlan())
    elif name == "InMemoryTableScan":
        try:
            kids.append(node.relation().cachedPlan())
        except Exception:
            pass
    it = node.children().iterator()
    while it.hasNext():
        kids.append(it.next())
    return kids


def _bounded_rows(node):
    """True when the subtree provably emits a BOUNDED number of rows at
    any input scale: below a limit / TakeOrderedAndProject, a grand
    aggregate (no grouping keys -> one row), or composed of only
    bounded inputs. WindowGroupLimit is NOT a limit here: it caps rows
    per GROUP (k per partition-spec group, k per input partition in
    Partial mode), so its output grows with the input — treating it as
    bounded would exempt the very single-partition pass the window
    fence exists to flag."""
    name = node.nodeName()
    if name == "WindowGroupLimit":
        kids = _plan_children(node)
        return bool(kids) and all(_bounded_rows(k) for k in kids)
    if "Limit" in name or name == "TakeOrderedAndProject":
        return True
    if "Aggregate" in name and "keys=[]" in node.simpleString(2000):
        return True
    kids = _plan_children(node)
    return bool(kids) and all(_bounded_rows(k) for k in kids)


def _has_partial_window_group_limit(node):
    """True if a WindowGroupLimit(Partial) stage exists in the subtree —
    each map partition was already cut to the window's k rows before any
    exchange, so the single-partition merge above receives at most
    k x num_partitions rows (the TakeOrderedAndProject shape)."""
    if node.nodeName() == "WindowGroupLimit" and "Partial" in node.simpleString(2000):
        return True
    return any(_has_partial_window_group_limit(k) for k in _plan_children(node))


def unbounded_global_windows(df: DataFrame) -> list:
    """Window physical nodes with an EMPTY partition spec whose input is
    not bounded by a limit — Spark executes these as a single-partition
    sort of the whole input (`WindowExec: No Partition Defined`), a
    one-executor bottleneck at scale. A partition-less window is only
    acceptable over a bounded subtree (below a GlobalLimit /
    TakeOrderedAndProject, where at most K rows reach it) or when a
    WindowGroupLimit(Partial) stage below the exchange already cut each
    map partition to the window's k rows (rank-filter pushdown — the
    merge sees at most k rows per input partition, the same shape as
    TakeOrderedAndProject). A Final-mode WindowGroupLimit with no
    Partial stage below it is flagged: it would be a single-partition
    pass over the full input."""
    out = []

    def _walk(node):
        name = node.nodeName()
        if name in ("Window", "WindowGroupLimit"):
            try:
                no_part = node.partitionSpec().isEmpty()
            except Exception:
                no_part = False
            if (
                no_part
                and not _bounded_rows(node)
                and not _has_partial_window_group_limit(node)
            ):
                out.append(node.simpleString(120))
        for k in _plan_children(node):
            _walk(k)

    _walk(df._jdf.queryExecution().executedPlan())
    return out


def unbounded_cartesians(df: DataFrame) -> list:
    """Cartesian / nested-loop join nodes where NEITHER side is a
    provably bounded-row subtree. A 1-row stat frame crossJoined onto a
    corpus is fine (its side is a grand aggregate or a limit); corpus ×
    corpus without an equi-key is the plan that never finishes at
    100 TB."""
    out = []

    def _walk(node):
        if node.nodeName() in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            kids = _plan_children(node)
            if len(kids) >= 2 and not any(_bounded_rows(k) for k in kids[:2]):
                out.append(node.simpleString(160))
        for k in _plan_children(node):
            _walk(k)

    _walk(df._jdf.queryExecution().executedPlan())
    return out
