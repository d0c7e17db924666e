"""RoaringBitmap-style functions (reference: flink/functions/bitmap/,
RbBuildAggFunction.java:33-41 etc.).

The reference ships Flink UDFs over serialized RoaringBitmap blobs. In
this engine a bitmap VALUE is a sorted distinct array<long> — the same
algebra (build / or / and / cardinality / contains / to_array) expressed
with JVM array built-ins, so bitmap pipelines stay in whole-stage
codegen. For WIRE-FORMAT parity with the reference (which persists
`RoaringBitmap.serialize()` bytes after runOptimize,
BitmapUtils.java:45-53), `rb_serialize`/`rb_deserialize` convert between
the array form and the RoaringFormatSpec portable binary via the
pure-Python codec in fluss_spark.functions.roaring (pyroaring, when
installed, is used as a cross-check in tests only — the codec does not
depend on it).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # optional library form, used for cross-checking the codec
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


def rb_serialize(bitmap_col: Column, bits: int = 32) -> Column:
    """array<long> bitmap -> RoaringBitmap portable bytes (the exact form
    FieldRoaringBitmap32/64Agg persists). Arrow-batched scalar UDF."""

    from fluss_spark.functions import roaring

    ser = roaring.roaring32_serialize if bits == 32 else roaring.roaring64_serialize

    @F.pandas_udf("binary")
    def _ser(s: pd.Series) -> pd.Series:
        return s.map(lambda a: None if a is None else ser(int(x) for x in a))

    return _ser(bitmap_col)


def rb_deserialize(binary_col: Column, bits: int = 32) -> Column:
    """RoaringBitmap portable bytes -> sorted array<long> bitmap value."""
    from fluss_spark.functions import roaring

    de = roaring.roaring32_deserialize if bits == 32 else roaring.roaring64_deserialize

    @F.pandas_udf("array<long>")
    def _de(s: pd.Series) -> pd.Series:
        return s.map(lambda b: None if b is None else de(b))

    return _de(binary_col)


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
