"""Predicate builder — the reference's predicate AST surface
(common/predicate/PredicateBuilder.java:84-449, 29 files / 2486 LoC)
mapped 1:1 onto pyspark Column expressions.

The reference needs its own AST because predicates cross an RPC boundary
and are re-evaluated against batch statistics server-side
(Predicate.test(rowCount, minValues, maxValues, nullCounts)). In this
engine Catalyst owns both jobs: these builders return ordinary Columns,
Catalyst pushes them into the Parquet scan, and Parquet row-group
min/max/null stats give exactly the reference's batch-skipping behavior
(LogSegment.readWithFilter, server/log/LogSegment.java:597-670) with
exact residual filtering on top (the reference's is approximate —
Scan.java:67-69 'engine still needs to perform secondary filtering').

Also provides visitors the connectors implement: partition-only
predicate detection (PartitionPredicateVisitor) used for partition
pruning validation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


# -- leaves (PredicateBuilder.java:84-449) ------------------------------ #


def equal(c, v) -> Column:
    return _col(c) == v


def not_equal(c, v) -> Column:
    return _col(c) != v


def less_than(c, v) -> Column:
    return _col(c) < v


def less_or_equal(c, v) -> Column:
    return _col(c) <= v


def greater_than(c, v) -> Column:
    return _col(c) > v


def greater_or_equal(c, v) -> Column:
    return _col(c) >= v


def is_null(c) -> Column:
    return _col(c).isNull()


def is_not_null(c) -> Column:
    return _col(c).isNotNull()


def starts_with(c, prefix: str) -> Column:
    return _col(c).startswith(prefix)


def ends_with(c, suffix: str) -> Column:
    return _col(c).endswith(suffix)


def contains(c, sub: str) -> Column:
    return _col(c).contains(sub)


def in_(c, values) -> Column:
    return _col(c).isin(*values)


def not_in(c, values) -> Column:
    return ~_col(c).isin(*values)


def between(c, lo, hi) -> Column:
    return _col(c).between(lo, hi)


# -- compounds ---------------------------------------------------------- #


def and_(*preds: Column) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def or_(*preds: Column) -> Column:
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def partition(spec: dict[str, object]) -> Column:
    """Partition predicate (PredicateBuilder.partition, :430-449):
    conjunction of equality on partition columns — prunes partition dirs
    before any file IO."""
    return and_(*[equal(k, v) for k, v in spec.items()])


# -- visitors ----------------------------------------------------------- #


def referenced_columns(pred: Column) -> set[str]:
    """Column names referenced by a predicate (via the analyzed
    expression tree string — good enough for pruning validation)."""
    import re

    expr = pred._jc.toString()
    return set(re.findall(r"'?([A-Za-z_][A-Za-z0-9_]*)'?(?=\s*(?:=|<|>|!|#|\bIN\b))", expr)) or {
        t for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr)
    }


def only_touches(pred: Column, allowed: set[str], all_columns: set[str]) -> bool:
    """PartitionPredicateVisitor analog: True when the predicate only
    references columns in `allowed` (of those present in the table)."""
    refs = {c for c in referenced_columns(pred) if c in all_columns}
    return refs <= allowed
