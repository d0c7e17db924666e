"""Driver-facing queries for the bitmap function family (SURVEY §2.7)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_spark.functions.bitmap import (
    rb_and_agg,
    rb_build_agg,
    rb_cardinality,
    rb_deserialize,
    rb_or_agg,
    rb_serialize,
)
from fluss_spark.registry import load, register


@register(
    "fn_rb_build_cardinality",
    oracle="""
    SELECT event_type,
           md5(list_aggregate(list_transform(list_sort(list(DISTINCT user_id)),
                                             x -> x::VARCHAR),
                              'string_agg', ',')) AS bitmap_fp,
           count(DISTINCT user_id) AS cardinality
    FROM events
    GROUP BY event_type
    """,
)
def fn_rb_build_cardinality(spark: SparkSession, sf: str) -> DataFrame:
    """RB_BUILD_AGG + RB_CARDINALITY: distinct-user bitmap per event
    type (RbBuildAggFunction.java:33-41, RbCardinalityFunction.java:33-40).
    The bitmap itself is value-checked through a scalar fingerprint
    (md5 of the sorted member list) — raw array columns don't survive
    every comparator, and the fingerprint proves the same set bit-exactly."""
    e = load(spark, sf, "events")
    bm = e.groupBy("event_type").agg(rb_build_agg(F.col("user_id")).alias("user_bitmap"))
    fp = F.md5(
        F.array_join(F.transform("user_bitmap", lambda x: x.cast("string")), ",").cast("binary")
    )
    return bm.select(
        "event_type",
        fp.alias("bitmap_fp"),
        rb_cardinality(F.col("user_bitmap")).alias("cardinality"),
    )


@register(
    "fn_rb_and_or_agg",
    oracle="""
    WITH b AS (
      SELECT event_type, list_sort(list(DISTINCT user_id)) AS bm
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY event_type
    )
    SELECT
      (SELECT count(DISTINCT user_id) FROM events WHERE event_type IN ('click','purchase')) AS n_either,
      (SELECT count(*) FROM (
         SELECT user_id FROM events WHERE event_type='click'
         INTERSECT
         SELECT user_id FROM events WHERE event_type='purchase')) AS n_both
    """,
)
def fn_rb_and_or_agg(spark: SparkSession, sf: str) -> DataFrame:
    """RB_OR_AGG / RB_AND_AGG: fold per-type bitmaps into union and
    intersection cardinalities (users with either / both event types)."""
    e = load(spark, sf, "events").filter(F.col("event_type").isin("click", "purchase"))
    bitmaps = e.groupBy("event_type").agg(rb_build_agg(F.col("user_id")).alias("bm"))
    return bitmaps.agg(
        rb_cardinality(rb_or_agg(F.col("bm"))).alias("n_either"),
        rb_cardinality(rb_and_agg(F.col("bm"))).alias("n_both"),
    )


@register(
    "fn_rb_binary_roundtrip",
    oracle="""
    SELECT event_type,
           md5(list_aggregate(list_transform(list_sort(list(DISTINCT user_id)),
                                             x -> x::VARCHAR),
                              'string_agg', ',')) AS bitmap_fp,
           count(DISTINCT user_id) AS cardinality
    FROM events
    GROUP BY event_type
    """,
)
def fn_rb_binary_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Wire-format proof: build per-type bitmaps, SERIALIZE to the
    RoaringBitmap portable binary (the bytes BitmapUtils.toBytes
    persists), DESERIALIZE, and fingerprint the recovered member set.
    The oracle recomputes the fingerprint from plain SQL distinct
    aggregation — equality means the binary codec round-trips the exact
    value set, inside the distributed plan."""
    e = load(spark, sf, "events")
    bm = e.groupBy("event_type").agg(rb_build_agg(F.col("user_id")).alias("bm"))
    recovered = bm.select(
        "event_type", rb_deserialize(rb_serialize(F.col("bm"))).alias("rt")
    )
    fp = F.md5(
        F.array_join(F.transform("rt", lambda x: x.cast("string")), ",").cast("binary")
    )
    return recovered.select(
        "event_type",
        fp.alias("bitmap_fp"),
        rb_cardinality(F.col("rt")).alias("cardinality"),
    )
