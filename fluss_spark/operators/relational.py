"""Relational operators over engine scans — scans, predicates, limit,
aggregation, joins, windows, set ops.

In the reference these split into storage-side pushdowns (projection
`client/table/scanner/Scan.java:48-55`, predicates
`common/predicate/PredicateBuilder.java:84-449`, limit
`client/table/scanner/batch/LimitBatchScanner.java:61`, count(*)
`flink/source/FlinkTableSource.java:834-881`) and engine-delegated
operators (joins/windows/set-ops are done by Flink/Spark, SURVEY §2.5-2.6).
Here both layers are Catalyst: filters/projections reach the Parquet
reader (PushedFilters/ReadSchema), joins pick broadcast for small dims,
aggregation is whole-stage-codegen'd with map-side partial aggregation.

All float outputs are rounded on BOTH sides so the DuckDB value-hash
compares stably across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.registry import load, register

# --------------------------------------------------------------------------
# S3 batch scan + P1/P2/P8 projection
# --------------------------------------------------------------------------


@register(
    "s3_scan_projection",
    oracle="SELECT p_partkey, p_name, p_retailprice FROM part",
)
def s3_scan_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded scan with column projection; Parquet reads only 3 columns
    (reference: Scan.project, FileLogProjection.java:78-210 — Parquet
    column pruning is the Spark-native equivalent)."""
    return load(spark, sf, "part").select("p_partkey", "p_name", "p_retailprice")


# --------------------------------------------------------------------------
# P3 predicate AST leaves (PredicateBuilder.java:84-449) + P4/P5 pushdown
# --------------------------------------------------------------------------


@register(
    "p3_pred_compare",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount <= 0.05
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def p3_pred_compare(spark: SparkSession, sf: str) -> DataFrame:
    """Comparison predicates >, <=, < pushed to the Parquet scan
    (min/max row-group skipping = Fluss batch-stats filter,
    LogSegment.java:597-670)."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") > 30)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@register(
    "p3_pred_string",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE starts_with(p_name, 'b') OR p_name LIKE '%red%' OR p_name LIKE '%y'
    """,
)
def p3_pred_string(spark: SparkSession, sf: str) -> DataFrame:
    """StartsWith / Contains / EndsWith predicate leaves
    (PredicateBuilder.startsWith/endsWith/contains)."""
    p = load(spark, sf, "part")
    return p.filter(
        F.col("p_name").startswith("b")
        | F.col("p_name").contains("red")
        | F.col("p_name").endswith("y")
    ).select("p_partkey", "p_name")


@register(
    "p3_pred_in_between_null",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 1000 AND 200000
      AND o_custkey IS NOT NULL
    """,
)
def p3_pred_in_between_null(spark: SparkSession, sf: str) -> DataFrame:
    """In / Between / IsNotNull predicate leaves (PredicateBuilder.in,
    between :430, isNotNull)."""
    o = load(spark, sf, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(1000, 200000)
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "p3_pred_not_in_or",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal
    FROM customer
    WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
       OR c_acctbal < 0
    """,
)
def p3_pred_not_in_or(spark: SparkSession, sf: str) -> DataFrame:
    """NotIn + Or compound predicate (PredicateBuilder.notIn/or)."""
    c = load(spark, sf, "customer")
    return c.filter(
        (~F.col("c_mktsegment").isin("BUILDING", "MACHINERY")) | (F.col("c_acctbal") < 0)
    ).select("c_custkey", "c_mktsegment", "c_acctbal")


# --------------------------------------------------------------------------
# S7 limit scan (LimitBatchScanner.java:61-104) — deterministic top-N form
# --------------------------------------------------------------------------


@register(
    "s7_limit_topn",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def s7_limit_topn(spark: SparkSession, sf: str) -> DataFrame:
    """LIMIT pushdown; made deterministic with a total order (Spark plans
    TakeOrderedAndProject — per-partition top-N then merge, no full sort)."""
    o = load(spark, sf, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# A1 count(*) pushdown (FlinkTableSource.applyAggregates)
# --------------------------------------------------------------------------


@register("a1_count_star", oracle="SELECT count(*) AS cnt FROM lineitem")
def a1_count_star(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(*) without touching data columns — Spark's Parquet aggregate
    pushdown answers it from footer metadata (reference answers from
    TableStats, PushdownUtils.countTable)."""
    return load(spark, sf, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# --------------------------------------------------------------------------
# §2.5 engine-side aggregation (hash agg, rollup, distinct)
# --------------------------------------------------------------------------


@register(
    "agg_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style multi-aggregate — whole-stage-codegen hash agg with
    map-side partial aggregation (one shuffle on the 2 group cols)."""
    li = load(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical rollup (engine-delegated in the reference, SURVEY §2.5)."""
    li = load(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct aggregation (two-phase expand + agg in Spark)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# L-class joins: the engine side of Fluss lookup joins (SURVEY §2.3) plus
# general joins the reference delegates to the engine.
# --------------------------------------------------------------------------


@register(
    "join_star_broadcast",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_star_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    """Star join: fact orders against broadcast dims — no shuffle of the
    fact table for the dim joins (equivalent role to Fluss lookup join
    L4, FlinkLookupFunction.java:51-178, where the dim is served by KV
    lookups; Spark-side the snapshot is small → broadcast hash join)."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — also the building block of the
    insert-if-not-exists lookup (L3, Lookup.java:96-105)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_outer_agg",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_outer_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# §2.6 windows / set ops (engine-native in our build; ordering contract =
# per-bucket __offset order, see sources/log.py)
# --------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-K per group via ranking window (one shuffle on the group key)."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 3
    """,
)
def window_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    """Running aggregate over a deterministic total order — the same
    window machinery that powers changelog replay (operators/replay.py)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_suppkey") <= 3)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
    )


@register(
    "setop_except_union",
    oracle="""
    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
     EXCEPT
     SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000)
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def setop_except_union(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT + UNION (distinct) set operators."""
    c = load(spark, sf, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    neg = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.exceptAll(big).union(neg).distinct()


@register(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_status_by_flag(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (conditional aggregation form so both engines name columns
    identically)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))), 2).alias("qty_o"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 2).alias("qty_f"),
    )


# --------------------------------------------------------------------------
# T5 event-time windowing (batch form; streaming variant in streaming/)
# --------------------------------------------------------------------------


@register(
    "t5_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n, round(sum("value"), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def t5_tumbling_window(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling event-time window aggregation (reference leaves windows to
    the engine — SupportsWatermarkPushDown only, FlinkTableSource.java:565)."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("hour_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "t5_sliding_window",
    oracle="""
    WITH k AS (SELECT unnest([0, 1]) AS off),
    w AS (
      SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800 - 1800 * k.off)
                                 * 1000000 AS BIGINT)) AS window_start,
             event_type, "value"
      FROM events CROSS JOIN k
    )
    SELECT window_start, event_type, count(*) AS n,
           round(sum("value"), 2) AS sum_value
    FROM w GROUP BY window_start, event_type
    """,
)
def t5_sliding_window(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding (hopping) event-time window: 1-hour windows every 30
    minutes, so each event lands in exactly 2 windows. Spark's window()
    generator expands rows THEN aggregates — the same Expand+HashAgg
    plan a streaming hopping-window agg uses; the oracle recomputes the
    window assignment arithmetic from epoch seconds."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "t5_session_window",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, "value",
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
      FROM e
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum("value"), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def t5_session_window(spark: SparkSession, sf: str) -> DataFrame:
    """Session window via Spark's NATIVE session_window() generator
    (30-minute gap), value-checked against the gaps-and-islands SQL
    formulation — proving the built-in session assignment matches the
    lag/running-sum fold (same semantics op_sessionize implements by
    hand; session end = last event + gap, Spark's convention). One
    user_id exchange; the session merge happens inside the aggregate."""
    e = load(spark, sf, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "join_topk_q3",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def join_topk_q3(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-K
    (filters push to all three scans; the final top-10 is
    TakeOrderedAndProject, no global sort)."""
    c = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets (engine-delegated in the reference)."""
    return load(spark, sf, "lineitem").cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n")
    )


@register(
    "subquery_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
    """,
)
def subquery_above_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery: orders 50% above the mean (one metadata-size
    broadcast of the scalar, no per-row recomputation)."""
    o = load(spark, sf, "orders")
    o.createOrReplaceTempView("__orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM __orders_sq
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM __orders_sq)
        """
    )


@register(
    "expr_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           length(p_name) AS name_len,
           round(p_retailprice * 1.1, 2) AS taxed,
           coalesce(nullif(p_type, ''), 'unknown') AS ptype,
           CASE WHEN p_size >= 25 THEN 'large' WHEN p_size >= 10 THEN 'mid' ELSE 'small' END AS size_class,
           substr(p_name, 1, 5) AS name5
    FROM part
    """,
)
def expr_functions(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar expression surface: string/case/arith/null functions —
    all whole-stage-codegen built-ins (the engine's 'scalar function
    library' is pyspark.sql.functions, strictly richer than the
    reference's predicate-only expression language, SURVEY §2.7)."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.length("p_name").alias("name_len"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed"),
        F.coalesce(F.nullif("p_type", F.lit("")), F.lit("unknown")).alias("ptype"),
        F.when(F.col("p_size") >= 25, "large")
        .when(F.col("p_size") >= 10, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.substring("p_name", 1, 5).alias("name5"),
    )


@register(
    "p3_pred_not_equal_distinct",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation
    WHERE n_name != 'FRANCE' AND n_regionkey IS NOT DISTINCT FROM 2
    """,
)
def p3_pred_not_equal_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """NotEqual + null-safe equality leaves (PredicateBuilder.notEqual;
    <=> is Spark's null-safe =, IS NOT DISTINCT FROM in the oracle)."""
    n = load(spark, sf, "nation")
    return n.filter(
        (F.col("n_name") != "FRANCE") & F.col("n_regionkey").eqNullSafe(F.lit(2))
    ).select("n_nationkey", "n_name")


@register(
    "join_q10_returned",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def join_q10_returned(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer — selective
    fact filter, two fact-dim joins, broadcast nation (bounded dim;
    customer is AQE-decided), top-20."""
    c = load(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "nation")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "fn_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(avg(json_extract_string(props, '$.k')::DOUBLE), 4) AS avg_k
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY event_type
    """,
)
def fn_json_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured columns: JSON path extraction from the events
    `props` payload (get_json_object — JVM-side JSON parsing; at corpus
    scale prefer from_json with an explicit schema so the parse runs
    once per row, not per path)."""
    from fluss_spark.registry import load as _load

    e = _load(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return (
        e.filter(k.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
        )
    )


@register(
    "fn_date_parts",
    oracle="""
    SELECT date_part('year', o_orderdate) AS y,
           date_part('month', o_orderdate) AS m,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    """,
)
def fn_date_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-part extraction and grouping (year/month rollup — the
    partition-key derivation pattern for time-partitioned tables)."""
    o = load(spark, sf, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@register(
    "window_rank_variants",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rk,
           dense_rank() OVER w AS drk,
           ntile(4) OVER w AS quartile,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order
    FROM orders
    WHERE o_custkey < 20
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-window family: rank / dense_rank / ntile / lag / lead over
    one window spec (single shuffle + sort, all five functions evaluated
    in the same Window operator)."""
    o = load(spark, sf, "orders").filter(F.col("o_custkey") < 20)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rk"),
        F.dense_rank().over(w).cast("long").alias("drk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
    )


_SALT_N = 4  # salt fan-out for the skew-resistant large-large join


@register(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority,
           count(*) AS n,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-resistant large-large equi-join: the probe side salts its
    key with pmod(hash(row-local col), N); the build side is replicated
    N ways (explode over the salt domain), and the join runs on
    (key, salt) — a hot orderkey's rows now spread over N reducer
    partitions instead of one straggler. Deterministic (no rand()), so
    results are replay-stable. At 100 TB this is the fallback when BOTH
    sides are too big to broadcast and AQE skew-split alone can't break
    a pathological key; result is provably identical to the plain join
    (oracle = unsalted SQL)."""
    li = load(spark, sf, "lineitem").withColumn(
        "__salt", F.pmod(F.hash("l_linenumber"), F.lit(_SALT_N)).cast("int")
    )
    o = load(spark, sf, "orders").withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(_SALT_N)]))
    )
    j = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"]) & (li["__salt"] == o["__salt"]),
        "inner",
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


@register(
    "agg_percentiles",
    oracle="""
    WITH s AS (
      SELECT l_returnflag AS f, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT f AS l_returnflag,
    """
    + ",\n".join(
        # CAST .. AS DOUBLE: DuckDB parses {p} as DECIMAL, Spark as
        # DOUBLE — both sides must run the identical IEEE arithmetic
        f"max(CASE WHEN rn = floor((n-1)*CAST({p} AS DOUBLE)) THEN v END) AS p{tag}"
        for p, tag in [(0.25, 25), (0.50, 50), (0.75, 75), (0.95, 95)]
    )
    + "\nFROM s GROUP BY f",
)
def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-group quantiles, lower-interpolation definition
    (numpy interpolation='lower': v[floor((n-1)*p)]). The result is an
    actual data value, so no float synthesis or rounding can diverge
    between engines (midpoint interpolation lands on .005 boundaries
    where Spark's BigDecimal HALF_UP and DuckDB's nearbyint disagree).
    Plan: one shuffle for the per-group rank window, conditional
    aggregation picks the ranked row. At 100 TB the same query swaps to
    `approx_percentile` (mergeable t-digest, map-side combine) with no
    plan-shape change."""
    li = load(spark, sf, "lineitem")
    s = li.select(
        F.col("l_returnflag").alias("f"),
        F.col("l_extendedprice").alias("v"),
    ).withColumn("rn", F.row_number().over(
        Window.partitionBy("f").orderBy("v")
    ) - 1).withColumn("n", F.count("*").over(Window.partitionBy("f")))

    aggs = []
    for p, tag in [(0.25, 25), (0.50, 50), (0.75, 75), (0.95, 95)]:
        lo = F.floor((F.col("n") - 1) * F.lit(p))
        aggs.append(F.max(F.when(F.col("rn") == lo, F.col("v"))).alias(f"p{tag}"))
    return s.groupBy("f").agg(*aggs).withColumnRenamed("f", "l_returnflag")


@register(
    "join_tpch_q5",
    oracle="""
    SELECT n.n_name AS nation_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def join_tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with a local-supplier condition
    (c_nationkey = s_nationkey crosses two join chains). Plan strategy
    at scale: lineitem (the 100 TB side) shuffles ONCE on l_orderkey to
    meet the filtered orders⋈customer side; nation/region are bounded
    dims (explicit broadcast), while customer/supplier grow with SF so
    AQE picks broadcast only when the side fits at runtime. The year
    filter pushes to the orders scan (row-group min/max skip) before
    any join."""
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS (the third grouping-set shape next to cube
    and rollup) — each set aggregates independently but in ONE pass over
    the input (Spark Expand + single hash agg, not a union of scans)."""
    li = load(spark, sf, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))


@register(
    "join_tpch_q17",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT p.p_brand, round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_small
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pa    ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.lim
    GROUP BY p.p_brand
    """,
)
def join_tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: a correlated scalar subquery (per-part average
    quantity) written DECORRELATED — the subquery becomes a groupBy over
    the same fact table joined back on the key, which is how Catalyst
    rewrites correlated aggregates anyway; writing it flat makes the
    plan explicit: two passes over lineitem, both partial-aggregated
    map-side, joined on l_partkey (part has no hardcoded broadcast hint
    — it grows with SF; AQE broadcasts when it fits). No per-row
    re-scan (the naive correlated plan would be O(n * parts))."""
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pa = li.groupBy("l_partkey").agg((F.avg("l_quantity") * 0.2).alias("lim"))
    p = load(spark, sf, "part").select("p_partkey", "p_brand")
    return (
        li.join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("lim"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_small"),
        )
    )


@register(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           round(avg(l_quantity), 4) AS mean_qty,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qty_price,
           round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (second moments + correlation) — all
    mergeable built-ins (partial aggregation map-side; a 100 TB corr is
    one shuffle of per-partition moment tuples, same plan as sum)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_qty_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
    )


@register(
    "reshape_unpivot",
    oracle="""
    WITH u AS (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, count(*) AS n, round(sum(value), 2) AS total,
           round(min(value), 2) AS vmin, round(max(value), 2) AS vmax
    FROM u GROUP BY measure
    """,
)
def reshape_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long reshape (unpivot/melt, the inverse of pivot) + per-
    measure profile. Spark's unpivot is a projection-only Expand — one
    scan, no join/union of scans (the oracle's UNION ALL form would scan
    three times)."""
    li = load(spark, sf, "lineitem")
    u = li.unpivot(
        ids=[],
        values=["l_quantity", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return u.groupBy("measure").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("total"),
        F.round(F.min("value"), 2).alias("vmin"),
        F.round(F.max("value"), 2).alias("vmax"),
    )
