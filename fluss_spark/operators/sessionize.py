"""Composite stream-analytics operators the reference delegates to its
host engine (SURVEY §2.5-2.6/T5): sessionization and as-of join —
expressed as pure window plans (one shuffle on the entity key, no
Python), with DuckDB oracles.

Both are staples of event/training-data pipelines:
  - sessionization groups events into gap-bounded sessions (batch twin
    of Structured Streaming's session_window)
  - as-of join attaches to each event the most recent prior event of
    another kind — Spark has no native ASOF; the composition below is
    the merge-sort formulation as a running window (scales as one
    shuffle; DuckDB's native ASOF JOIN is the oracle)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fluss_spark.registry import load, register

_GAP_MIN = 30  # session gap, minutes


@register(
    "op_sessionize",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL {_GAP_MIN} MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                            ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS session_id
      FROM e
    )
    SELECT user_id, session_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def op_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization: lag -> new-session flag -> running sum
    = session id -> per-session aggregate. Two window passes + one
    aggregation, all on the same user_id shuffle (Spark reuses the
    partitioning across the window and the groupBy)."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > _GAP_MIN * 60), F.lit(1)).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        e.withColumn("__new", new_session)
        .withColumn("session_id", F.sum("__new").over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "op_asof_join",
    oracle="""
    WITH p AS (SELECT user_id, event_id, round(value,2) AS purchase_value
               FROM events WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id, round(value,2) AS click_value
               FROM events WHERE event_type = 'click')
    SELECT p.user_id, p.event_id AS purchase_id, p.purchase_value,
           c.event_id AS prior_click_id, c.click_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.event_id >= c.event_id
    """,
)
def op_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: each purchase gets the latest click at-or-before it
    (by event_id) from the same user. Implementation = union both sides
    tagged, one running last_value(ignorenulls) window per user over the
    merged order — the distributed merge-sort formulation (no per-pair
    join, no pandas)."""
    e = load(spark, sf, "events").select("user_id", "event_id", "event_type", "value")
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        "event_type",
        F.round("value", 2).alias("v"),
        F.when(
            F.col("event_type") == "click",
            F.struct(F.col("event_id").alias("id"), F.round("value", 2).alias("val")),
        ).alias("__click"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_prior = tagged.withColumn("__prior", F.last("__click", ignorenulls=True).over(w))
    return with_prior.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("v").alias("purchase_value"),
        F.col("__prior.id").alias("prior_click_id"),
        F.col("__prior.val").alias("click_value"),
    )


_FUNNEL_WINDOW = "INTERVAL 1 DAY"  # max gap between consecutive funnel stages


@register(
    "op_funnel",
    oracle=f"""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type='view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id
                AND e.ts > v.t1 AND e.ts <= v.t1 + {_FUNNEL_WINDOW}
          WHERE e.event_type='click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id
                AND e.ts > c.t2 AND e.ts <= c.t2 + {_FUNNEL_WINDOW}
          WHERE e.event_type='purchase' GROUP BY e.user_id)
    SELECT 'view' AS stage, 1 AS stage_ord, count(*) AS n_users FROM v
    UNION ALL SELECT 'view_click', 2, count(*) FROM c
    UNION ALL SELECT 'view_click_purchase', 3, count(*) FROM p
    """,
)
def op_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase, each stage within 1 day
    of the previous): per-user earliest qualifying timestamp per stage,
    chained through two equi-joins on user_id. Every stage keys on
    user_id, so the per-stage groupBys and joins reuse ONE hash
    partitioning end to end; stage outputs are |users|-sized, never
    |events|-sized — the shape that holds when events are 100 TB but
    users fit a shuffle."""
    e = load(spark, sf, "events").select("user_id", "event_type", "ts")

    def next_stage(prev: DataFrame, prev_ts: str, etype: str, out_ts: str) -> DataFrame:
        return (
            e.filter(F.col("event_type") == etype)
            .join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_ts))
                & (F.col("ts") <= F.col(prev_ts) + F.expr(_FUNNEL_WINDOW))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_ts))
        )

    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = next_stage(v, "t1", "click", "t2")
    p = next_stage(c, "t2", "purchase", "t3")

    def stage(df: DataFrame, name: str, ord_: int) -> DataFrame:
        return df.agg(F.count("*").alias("n_users")).select(
            F.lit(name).alias("stage"),
            F.lit(ord_).cast("int").alias("stage_ord"),
            "n_users",
        )

    return (
        stage(v, "view", 1)
        .unionByName(stage(c, "view_click", 2))
        .unionByName(stage(p, "view_click_purchase", 3))
    )


@register(
    "op_retention_cohort",
    oracle="""
    WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
               FROM events GROUP BY user_id),
    a AS (SELECT DISTINCT e.user_id, f.cohort,
                 CAST(datediff('day', f.cohort, date_trunc('week', e.ts)) // 7 AS INTEGER)
                   AS week_offset
          FROM events e JOIN f USING (user_id))
    SELECT cohort::TIMESTAMP AS cohort_week, week_offset, count(*) AS n_users
    FROM a GROUP BY cohort_week, week_offset
    """,
)
def op_retention_cohort(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohorts: cohort = week of a user's first event;
    each (user, active week) pair counts once at its week offset. The
    first-event groupBy, the join back, and the distinct all key on
    user_id (one partitioning reused); the final rollup output is
    |cohorts x weeks| — metadata-sized at any event volume."""
    e = load(spark, sf, "events").select("user_id", "ts")
    f = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
        .select("user_id", F.date_trunc("week", "first_ts").alias("cohort"))
    )
    active = (
        e.join(f, "user_id")
        .select(
            "user_id",
            "cohort",
            F.expr("CAST(datediff(date_trunc('week', ts), cohort) DIV 7 AS INT)").alias(
                "week_offset"
            ),
        )
        .distinct()
    )
    return (
        # timestamp (not DATE) on both sides: the driver's comparator
        # normalizes datetime64 resolutions but not date-object columns
        active.groupBy(F.col("cohort").alias("cohort_week"), "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


_INTERVAL_US = 60_000_000  # 60s follow window
_BIN_US = _INTERVAL_US  # bin width = interval -> candidate bins are bin, bin+1


@register(
    "op_interval_join",
    oracle=f"""
    SELECT a.event_id AS a_id,
           count(*) AS n_follow,
           round(sum(b.value), 2) AS follow_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + {_INTERVAL_US}
    GROUP BY a.event_id
    """,
)
def op_interval_join(spark: SparkSession, sf: str) -> DataFrame:
    """Interval join (Flink's stream-stream interval join, which the
    reference delegates to its host engine): for each event, aggregate
    the same user's events in (ts, ts+60s].

    Scale plan: a naive theta-join degenerates to a per-user cross
    product. Instead each left row is replicated into the two 60s-wide
    time bins its window can overlap, and the join becomes an EQUI-join
    on (user_id, bin) — hash-shuffled, AQE-splittable, no nested-loop.
    The residual exact range predicate filters inside the matched bin
    pairs, on integer microseconds (float arithmetic would drift)."""
    e = load(spark, sf, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us"), "value"
    )
    left = e.select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("us").alias("a_us"),
        F.explode(
            F.array(
                F.expr(f"us DIV {_BIN_US}"),
                F.expr(f"us DIV {_BIN_US}") + 1,
            )
        ).alias("bin"),
    ).dropDuplicates(["a_id", "bin"])
    right = e.select(
        "user_id",
        F.col("us").alias("b_us"),
        F.col("value").alias("b_value"),
        F.expr(f"us DIV {_BIN_US}").alias("bin"),
    )
    pairs = left.join(right, on=["user_id", "bin"], how="inner").filter(
        (F.col("b_us") > F.col("a_us")) & (F.col("b_us") <= F.col("a_us") + _INTERVAL_US)
    )
    return pairs.groupBy("a_id").agg(
        F.count("*").alias("n_follow"),
        F.round(F.sum("b_value"), 2).alias("follow_value"),
    )


@register(
    "op_transition_matrix",
    oracle="""
    WITH t AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, count(*) AS n
      FROM t WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(round(n / sum(n) OVER (PARTITION BY from_type), 4) AS DOUBLE) AS p
    FROM c
    """,
)
def op_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user next-event transition matrix (first-order Markov counts
    and probabilities) — the user-journey / funnel-discovery shape. One
    user_id exchange for the lead window; the (from, to) count rolls up
    on a tiny key space, and the row-normalization window runs on the
    aggregated matrix (|event_types|^2 rows), not the event stream."""
    e = load(spark, sf, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("to_type", F.lead("event_type").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n"))
    )
    w_norm = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_norm), 4).cast("double").alias("p"),
    )


_PATH_LEN = 3  # events per path window
_PATH_TOP = 20


@register(
    "op_user_paths",
    oracle=f"""
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    p AS (
      SELECT concat(event_type, '>', e2, '>', e3) AS path, count(*) AS n
      FROM o WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1
    )
    SELECT path, n, CAST(row_number() OVER (ORDER BY n DESC, path) AS INT) AS rank
    FROM p ORDER BY n DESC, path LIMIT {_PATH_TOP}
    """,
)
def op_user_paths(spark: SparkSession, sf: str) -> DataFrame:
    """User-journey path analysis: the corpus's top {_PATH_TOP} length-
    {_PATH_LEN} event sequences (the Sankey/funnel-discovery primitive).
    One window pass per user builds sliding event trigrams via lead()
    — no self-joins — then a global count + top-N reduction. Scale
    shape: the user_id partitioning is the same exchange sessionize/
    funnel use; the per-path aggregation is map-side combined and the
    final top-N is a TakeOrdered, not a full sort."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    p = (
        o.select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.orderBy(F.col("n").desc(), F.col("path"))
    return (
        p.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= _PATH_TOP)
        .orderBy("rank")
    )


_Z_THRESHOLD = 2.5
_Z_MIN_EVENTS = 5


@register(
    "op_anomaly_zscore",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, x,
             count(*) OVER w AS n,
             sum(x) OVER w AS sx,
             sum(x * x) OVER w AS sxx
      FROM c WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, event_id,
           round((x - CAST(sx AS DOUBLE) / n)
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                        / (CAST(n AS DOUBLE) * (n - 1))), 4) AS z
    FROM s
    WHERE n >= {_Z_MIN_EVENTS}
      AND (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) > 0
      AND abs((x - CAST(sx AS DOUBLE) / n)
              / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     / (CAST(n AS DOUBLE) * (n - 1)))) > {_Z_THRESHOLD}
    """,
)
def op_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user anomaly detection: events whose value is more than
    {_Z_THRESHOLD} sample standard deviations from the user's own mean
    (users with < {_Z_MIN_EVENTS} events skipped) — the per-entity
    outlier flagging pass a metrics/abuse pipeline runs.

    Determinism note (why cents): a float threshold filter on an
    order-dependent aggregate is engine-ambiguous — sum(double) varies
    in ulps with accumulation order, and a z sitting on the threshold
    could flip membership between engines. Values here are 2-decimal,
    so the moments are computed from EXACT integer power sums of cents
    (n, Σx, Σx² — all < 2^53), making mean/stddev/z bit-identical IEEE
    arithmetic on both sides. One shuffle on user_id — the same
    exchange every other per-user operator in this family uses."""
    ev = load(spark, sf, "events")
    c = ev.select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("x"),
    )
    w = Window.partitionBy("user_id")
    s = (
        c.withColumn("n", F.count("*").over(w))
        .withColumn("sx", F.sum("x").over(w))
        .withColumn("sxx", F.sum(F.col("x") * F.col("x")).over(w))
    )
    n = F.col("n")
    mean = F.col("sx").cast("double") / n
    var_num = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx")
    std = F.sqrt(var_num / (n.cast("double") * (n - 1)))
    z = (F.col("x") - mean) / std
    return (
        s.filter((n >= _Z_MIN_EVENTS) & (var_num > 0) & (F.abs(z) > _Z_THRESHOLD))
        .select("user_id", "event_id", F.round(z, 4).alias("z"))
    )


# ---------------------------------------------------------------------- #
# op_attribution: last-touch marketing attribution
# ---------------------------------------------------------------------- #
_TOUCH_TYPES = ("click", "view")


@register(
    "op_attribution",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type, value,
             last_value(CASE WHEN event_type IN {_TOUCH_TYPES!r}
                             THEN event_type END IGNORE NULLS)
               OVER w AS touch_type,
             last_value(CASE WHEN event_type IN {_TOUCH_TYPES!r}
                             THEN event_id END IGNORE NULLS)
               OVER w AS touch_event_id,
             last_value(CASE WHEN event_type IN {_TOUCH_TYPES!r}
                             THEN ts END IGNORE NULLS)
               OVER w AS touch_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           coalesce(touch_type, 'direct') AS channel,
           touch_event_id,
           CASE WHEN touch_ts IS NOT NULL
                THEN (epoch_us(ts) - epoch_us(touch_ts)) // 1000000 END
             AS secs_since_touch,
           round(value, 2) AS value
    FROM e WHERE event_type = 'purchase'
    """,
)
def op_attribution(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRECEDING click/view (channel, touch event, seconds
    since), 'direct' when no touch precedes it — the standard
    conversion-attribution shape. One user_id window pass (three
    carry-forward last-values over the same frame share one exchange
    and one sort); no self-joins, output linear in purchases. The
    strictly-preceding frame (ROWS ... 1 PRECEDING) keeps a purchase
    from attributing to a same-timestamp later touch."""
    e = load(spark, sf, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin(*_TOUCH_TYPES)
    touch_type = F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w)
    touch_id = F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True).over(w)
    touch_ts = F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    return (
        e.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            "value",
            touch_type.alias("touch_type"),
            touch_id.alias("touch_event_id"),
            touch_ts.alias("touch_ts"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            F.coalesce(F.col("touch_type"), F.lit("direct")).alias("channel"),
            "touch_event_id",
            (
                (F.unix_micros("ts") - F.unix_micros("touch_ts"))
                / F.lit(1_000_000)
            ).cast("bigint").alias("secs_since_touch"),
            F.round("value", 2).alias("value"),
        )
    )


# ---------------------------------------------------------------------- #
# op_rfm: recency / frequency / monetary customer segmentation
# ---------------------------------------------------------------------- #
def _q5_sql(key: str, cuts: str) -> str:
    """Value-based quintile score in DuckDB SQL: 1 + number of exact
    percentile cut points the key exceeds. Cut positions are p*(n-1)
    with p = i/5, so every true cut is a rational with denominator 5 —
    comparing 5*key against round(5*cut) is exact integer math, immune
    to cross-engine last-ulp drift in the interpolated double."""
    terms = " + ".join(
        f"(({key}) * 5 > CAST(round(({cuts})[{i}] * 5) AS BIGINT))::INT"
        for i in range(1, 5)
    )
    return f"CAST(1 + {terms} AS INT)"


@register(
    "op_rfm",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    anchor AS (SELECT max(last_ts) AS t0 FROM p),
    base AS (
      SELECT user_id,
             CAST((epoch_us(t0) - epoch_us(last_ts)) // 86400000000 AS BIGINT)
               AS recency_days,
             frequency, cents
      FROM p, anchor
    ),
    cuts AS (
      SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rc,
             quantile_cont(-frequency,   [0.2, 0.4, 0.6, 0.8]) AS fc,
             quantile_cont(-cents,       [0.2, 0.4, 0.6, 0.8]) AS mc
      FROM base
    )
    SELECT user_id, recency_days, frequency,
           cents / 100.0 AS monetary,
           {_q5_sql('recency_days', 'rc')} AS r_score,
           {_q5_sql('-frequency', 'fc')} AS f_score,
           {_q5_sql('-cents', 'mc')} AS m_score
    FROM base, cuts
    """,
)
def op_rfm(spark: SparkSession, sf: str) -> DataFrame:
    """RFM segmentation — the classic customer-value model: per user,
    days since last purchase (recency, anchored at the corpus's newest
    purchase so the result is reproducible), purchase count and spend,
    each scored into VALUE-BASED quintiles (1 = best; equal values
    always share a score). Monetary sums integer cents so the
    aggregate is partition-order independent (the repo's quantize-
    to-int64 exact-sum rule). Scale shape: one purchase-filtered
    aggregation keyed by user, then ONE exact-percentile aggregate
    produces the 12 cut points (4 per dimension), broadcast back and
    stamped map-side — no global window / single-partition sort at any
    corpus size, unlike the rank-positional ntile formulation. Cut
    positions are p*(n-1), p = i/5, so true cuts are rationals with
    denominator 5: comparing 5*key > round(5*cut) makes the stamping
    exact integer math on both engines."""
    e = load(spark, sf, "events").filter(F.col("event_type") == "purchase")
    p = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    anchor = p.agg(F.max("last_ts").alias("t0"))
    base = p.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (
            (F.unix_micros("t0") - F.unix_micros("last_ts")) / F.lit(86_400_000_000)
        ).cast("bigint").alias("recency_days"),
        "frequency",
        "cents",
    )
    pcts = [F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)]
    cuts = base.agg(
        F.percentile(F.col("recency_days"), F.array(*pcts)).alias("rc"),
        F.percentile(-F.col("frequency"), F.array(*pcts)).alias("fc"),
        F.percentile(-F.col("cents"), F.array(*pcts)).alias("mc"),
    )

    def q5(key, cuts_col):
        s = F.lit(1)
        for i in range(1, 5):
            c5 = F.round(F.element_at(F.col(cuts_col), i) * 5).cast("bigint")
            s = s + (key * 5 > c5).cast("int")
        return s.cast("int")

    return base.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "recency_days",
        "frequency",
        (F.col("cents") / 100.0).alias("monetary"),
        q5(F.col("recency_days"), "rc").alias("r_score"),
        q5(-F.col("frequency"), "fc").alias("f_score"),
        q5(-F.col("cents"), "mc").alias("m_score"),
    )
