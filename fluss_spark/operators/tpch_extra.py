"""TPC-H-shaped relational patterns beyond the core set in relational.py.

The reference delegates all of these to the host engine (SURVEY §2.5-2.6:
Fluss storage has no join/agg/window operators beyond count(*) pushdown,
`flink/source/FlinkTableSource.java:834-881`); in our build they are the
engine surface itself, so each distinct optimizer shape gets a
driver-contract query: agg-then-semi-join (Q18), double aggregation
(Q13), conditional-agg ratio (Q14), anti-join + count-distinct (Q16),
derived-view scalar max (Q15), HAVING vs global scalar (Q11), nation-pair
self-joined dim (Q7), share-of-total (Q8), disjunctive join predicate
(Q19), decorrelated double-window EXISTS (Q21), scalar-threshold
anti-join (Q22).

Scale notes (100 TB posture):
- nation/region are BOUNDED dims (25/5 rows at any SF) -> explicit
  broadcast(); 1-row scalar subqueries likewise.
- supplier/part/customer and every subset of them grow linearly with
  SF -> NO explicit broadcast hint; AQE broadcasts at runtime when the
  filtered side fits and falls back to shuffle join when it doesn't
  (a hardcoded hint would OOM the driver at 100 TB).
- every scalar subquery is computed once and broadcast (1-row cross
  join), never re-evaluated per row.
- Q21 uses two window passes over the SAME partition key, so the second
  pass reuses the first's hash partitioning (one shuffle total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.registry import load, register


@register(
    "join_tpch_q18",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(o.o_totalprice, 2) AS o_price,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o_price DESC, o.o_orderkey
    LIMIT 100
    """,
)
def join_tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): aggregate-HAVING produces a
    small key set, which SEMI-joins the fact before the wide join — the
    expensive customer/orders join only sees qualifying orders. Both
    lineitem passes partial-aggregate map-side; top-100 is
    TakeOrderedAndProject (no global sort)."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 300)
        .select("l_orderkey")
    )
    o = load(spark, sf, "orders").join(
        big, F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    c = load(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_price"),
            "total_qty",
        )
        .orderBy(F.col("o_price").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "join_tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey) t
    GROUP BY c_count
    """,
)
def join_tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join with
    a non-key residual condition, then DOUBLE aggregation. The second
    groupBy keys on the first's output (tiny domain), so its shuffle
    moves only |customers| pre-combined rows."""
    c = load(spark, sf, "customer").select("c_custkey")
    o = load(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    joined = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
        "left",
    )
    per_cust = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "agg_tpch_q14",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def agg_tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape (promo revenue ratio): conditional aggregation
    computes numerator and denominator in ONE pass over the join — no
    second scan, no self-join. The shipdate range prunes row groups at
    the Parquet scan."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    p = load(spark, sf, "part").select("p_partkey", "p_type")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("promo_pct")
        )
    )


@register(
    "join_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#5'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def join_tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part class): NOT-IN
    exclusion as a LEFT-ANTI join (AQE broadcasts the exclusion list
    when it fits — it is supplier-bounded, so no hardcoded hint) +
    count(DISTINCT) — Spark plans distinct-agg as a two-level
    expand+agg, both levels partial map-side."""
    bad = (
        load(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = load(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "subquery_tpch_q15",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, round(r.total_rev, 2) AS total_rev
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def subquery_tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by quarterly revenue): the revenue
    view is computed ONCE; its scalar max is broadcast back as a 1-row
    cross join (no re-aggregation, no global sort to find the max)."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev = (
        load(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(vol).alias("total_rev_raw"))
    )
    mx = rev.agg(F.max("total_rev_raw").alias("mx"))
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_rev_raw == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_rev_raw", 2).alias("total_rev"))
    )


@register(
    "subquery_tpch_q11",
    oracle="""
    WITH v AS (
        SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS val
        FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, round(val, 2) AS val
    FROM v
    WHERE val > (SELECT sum(val) * 0.0006 FROM v)
    """,
)
def subquery_tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape (important parts: HAVING vs a global scalar over
    the same derived view). The view is one shuffle; the global total is
    a second-level agg of the already-grouped rows (tiny), broadcast
    back — lineitem is scanned exactly once."""
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    v = (
        load(spark, sf, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(vol).alias("val_raw"))
    )
    thr = v.agg((F.sum("val_raw") * 0.0006).alias("thr"))
    return (
        v.join(F.broadcast(thr), v.val_raw > F.col("thr"))
        .select("l_partkey", F.round("val_raw", 2).alias("val"))
    )


@register(
    "join_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
)
def join_tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (bilateral trade volume): the same dim table joined
    twice under different roles (supplier nation / customer nation), the
    pair filter applied AFTER both joins (it references both). nation and
    supplier broadcast; the two fact joins shuffle on their own keys."""
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "join_tpch_q8",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n1.n_name AS nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD') t
    GROUP BY o_year
    """,
)
def join_tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape (market share): share-of-total via conditional agg
    over an 8-table join. Region filter reaches nation via broadcast
    pre-join (dim-on-dim reduction BEFORE touching the fact); the
    customer-side filter cuts fact rows early."""
    r = load(spark, sf, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    n2 = (
        load(spark, sf, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("n2_key"))
    )
    n1 = load(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    p = load(spark, sf, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"), "left_semi")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "join_tpch_q19",
    oracle="""
    SELECT count(*) AS n,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def join_tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape (disjunctive mixed-side predicate): the OR spans
    both join sides, so it can't fully push below the join — but the
    single-side envelopes CAN: part rows must match one of three brands
    (pushed to the part scan) and lineitem quantity must be in [1,30]
    (pushed to the fact scan). We state both envelopes explicitly
    (Catalyst also extracts per-side OR unions itself; the explicit form
    keeps the contract independent of optimizer version). The residual
    OR evaluates post-join."""
    p = load(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#14")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    )
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    disj = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(disj)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@register(
    "join_tpch_q21",
    oracle="""
    WITH m AS (
        SELECT l_orderkey, l_suppkey, l_shipdate,
               max(l_shipdate) OVER (PARTITION BY l_orderkey) AS max_ship,
               count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS nsupp
        FROM lineitem),
    am AS (
        SELECT *, count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS nmax
        FROM m WHERE nsupp >= 2 AND l_shipdate = max_ship)
    SELECT s.s_name, count(*) AS numwait
    FROM am JOIN supplier s ON s.s_suppkey = am.l_suppkey
    WHERE am.nmax = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def join_tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who alone held up multi-supplier
    orders), decorrelated: the EXISTS / NOT-EXISTS self-joins of the
    original become two window passes over l_orderkey — "another supplier
    exists on the order" = per-order distinct-supplier count >= 2;
    "no other supplier shipped later" = this row is at the order's max
    shipdate AND the at-max distinct count is 1. Both windows share the
    same partition key, so the second reuses the first's hash exchange:
    ONE shuffle of lineitem replaces the original's three self-joins."""
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    w = Window.partitionBy("l_orderkey")
    m = li.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        F.max("l_shipdate").over(w).alias("max_ship"),
        F.size(F.collect_set("l_suppkey").over(w)).alias("nsupp"),
    ).filter((F.col("nsupp") >= 2) & (F.col("l_shipdate") == F.col("max_ship")))
    am = m.select(
        "l_orderkey",
        "l_suppkey",
        F.size(F.collect_set("l_suppkey").over(w)).alias("nmax"),
    ).filter(F.col("nmax") == 1)
    s = load(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        am.join(s, am.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "subquery_tpch_q22",
    oracle="""
    SELECT c.c_nationkey, count(*) AS numcust,
           round(sum(c.c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 250000)
    GROUP BY c.c_nationkey
    """,
)
def subquery_tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape (wealthy customers who never ordered): a scalar
    threshold (broadcast 1-row) gates the probe BEFORE the anti-join, so
    the anti-join's left side is already thinned; the anti-join itself
    shuffles on custkey (or broadcasts orders' key projection under AQE).
    "Never ordered" is parameterized as "never placed a >250k order" so
    the anti side is a filtered scan, not the whole orders table."""
    c = load(spark, sf, "customer")
    thr = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("thr"))
    o = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(thr), c.c_acctbal > F.col("thr"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "agg_tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def agg_tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape (forecast revenue change): pure scan-aggregate. All
    three predicates push to the Parquet scan (row-group min/max skips
    whole groups); the agg is a map-side partial + 1-row final — the
    cheapest possible shape, and the purest test that pushdown works."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "join_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def join_tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS with a
    non-equi residual becomes a LEFT-SEMI hash join on l_orderkey with
    the l_shipdate > o_orderdate comparison as the join residual — the
    fact side never duplicates orders (semi short-circuits on first
    match), and the date filter thins the probe side at its scan."""
    o = load(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "join_tpch_q9",
    oracle="""
    SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.4 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(28, 4))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
)
def join_tpch_q9(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape (product-line profit; supply cost modeled as 40% of
    retail since the testdata has no partsupp): the p_name LIKE filter
    cuts the fact through a broadcast join FIRST (highest selectivity),
    then supplier/nation attach by broadcast; only the orders join
    shuffles the (already-thinned) fact. Contains(p_name) pushes to the
    part scan."""
    p = (
        load(spark, sf, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.4 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(28,4)")  # quantize per-row: decimal sum is order-independent
                             # (double sum noise is amplified by the subtraction)
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "join_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def join_tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority split; returnflag stands
    in for shipmode, which the testdata lacks): fact-fact equi-join where
    the lineitem side is pre-thinned by a pushed date range, then a
    conditional two-way count in ONE aggregation pass — no per-priority
    re-scan, no pivot shuffle (3-row output)."""
    li = load(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = load(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(urgent, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~urgent, F.lit(1))).alias("low_line_count"),
        )
    )


@register(
    "subquery_tpch_q2",
    oracle="""
    SELECT n.n_name, s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE s.s_acctbal = (SELECT min(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    """,
)
def subquery_tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier; acctbal stands in for the
    missing partsupp supplycost): the correlated scalar min decorrelates
    to a groupBy over the SAME table joined back on (nationkey, minval).
    Both sides are dim-sized, so both the agg and the join broadcast —
    at 100 TB this pattern matters when the outer is a fact: the agg
    output stays |groups|-sized and broadcastable regardless of fact
    size."""
    s = load(spark, sf, "supplier")
    mn = s.groupBy(F.col("s_nationkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    n = load(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        s.join(
            F.broadcast(mn),
            (s.s_nationkey == F.col("mk")) & (s.s_acctbal == F.col("min_bal")),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "subquery_tpch_q20",
    oracle="""
    SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_type = 'SMALL'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 100)
    """,
)
def subquery_tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of a part class):
    nested IN over an aggregate-HAVING derived set, planned as agg →
    LEFT-SEMI. The part filter broadcasts into lineitem before the agg,
    the agg output is |suppliers|-bounded, and the semi join broadcasts
    it back — supplier is never shuffled."""
    p = load(spark, sf, "part").filter(F.col("p_type") == "SMALL").select("p_partkey")
    li = load(spark, sf, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    qual = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 100)
        .select("l_suppkey")
    )
    s = load(spark, sf, "supplier")
    return s.join(qual, s.s_suppkey == F.col("l_suppkey"), "left_semi").select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
