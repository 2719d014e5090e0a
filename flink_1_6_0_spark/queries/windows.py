"""Group windows + OVER aggregates, batch-checked against the oracle —
SURVEY.md §2.5-2.6 (BASELINE.md bench items 6-7's batch halves).

The same window()/session_window() expressions run under Structured Streaming
with a watermark (tests/test_streaming.py); here they are checked for value
correctness on the bounded events table where DuckDB can replay the
semantics (tumble = time_bucket, hop = bucket fan-out, session = gap-based
sessionization via lag + cumulative sum).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.operators import over as over_ops
from flink_1_6_0_spark.operators import windows as win_ops
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query

# ---------------------------------------------------------------------------
# Group windows (§2.5)
# ---------------------------------------------------------------------------


@query(
    "window_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL 1 HOUR, ts)                    AS wstart,
           time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR  AS wend,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("batch", "window"),
    bench=True,
)
def window_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE group window (TumblingEventTimeWindows;
    DataStreamGroupWindowAggregate.scala:256)."""
    e = T(spark, sf_dir, "events")
    out = e.groupBy(win_ops.tumble("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return out.select(
        F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "event_type", "n", "sum_value"
    )


@query(
    "window_hop",
    oracle="""
    SELECT time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE      AS wstart,
           time_bucket(INTERVAL 30 MINUTE, ts) - k * INTERVAL 30 MINUTE + INTERVAL 1 HOUR AS wend,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events, UNNEST([0, 1]) AS u(k)
    GROUP BY 1, 2
    """,
    tags=("batch", "window"),
)
def window_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP (sliding) group window, Flink arg order (time, slide, size)
    (SlidingEventTimeWindows; FunctionCatalog.scala:451). Each event lands in
    size/slide = 2 windows — the oracle fans out explicitly."""
    e = T(spark, sf_dir, "events")
    out = e.groupBy(win_ops.hop("ts", "30 minutes", "1 hour").alias("w")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return out.select(
        F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "n", "sum_value"
    )


@query(
    "window_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts)                         AS session_start,
           max(ts) + INTERVAL 10 MINUTE    AS session_end,
           count(*)                        AS n,
           round(sum(value), 2)            AS sum_value
    FROM numbered GROUP BY user_id, sid
    """,
    tags=("batch", "window"),
)
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION group window, 10-minute gap (EventTimeSessionWindows;
    WindowOperator merging path WindowOperator.java:304). Spark session_window
    end = last event + gap, replicated by the oracle's sessionization."""
    e = T(spark, sf_dir, "events")
    out = e.groupBy(win_ops.session("ts", "10 minutes").alias("w"), "user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n",
        "sum_value",
    )


@query(
    "window_tumble_flink_sql",
    oracle="""
    SELECT time_bucket(INTERVAL 1 DAY, ts)  AS wstart,
           event_type,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    tags=("batch", "window", "sql-frontend"),
)
def window_tumble_flink_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink SQL spelling through the front-end shim: TUMBLE/TUMBLE_START in
    the query text (FunctionCatalog.scala:447-461 → plans.sql_frontend
    rewrite → Spark window())."""
    from flink_1_6_0_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    te.register_table("events", T(spark, sf_dir, "events"))
    return te.sql(
        """
        SELECT TUMBLE_START(ts, INTERVAL '1' DAY) AS wstart,
               event_type,
               count(*)             AS n,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY TUMBLE(ts, INTERVAL '1' DAY), event_type
        """
    )


# ---------------------------------------------------------------------------
# OVER aggregates (§2.6)
# ---------------------------------------------------------------------------


@query(
    "over_rows_unbounded",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING), 2) AS running_sum,
           count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS running_n
    FROM events
    """,
    tags=("batch", "over"),
    bench=True,
)
def over_rows_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-preceding ROWS OVER aggregate (RowTimeUnboundedOver.scala:254)."""
    e = T(spark, sf_dir, "events")
    w = over_ops.rows_unbounded(["user_id"], ["ts", "event_id"])
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "over_rows_bounded",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS avg4,
           round(min(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS min4
    FROM events
    """,
    tags=("batch", "over"),
)
def over_rows_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS OVER (ProcTimeBoundedRowsOver.scala:43 semantics on event
    time): last-4-rows rolling aggregate."""
    e = T(spark, sf_dir, "events")
    w = over_ops.rows_bounded(["user_id"], ["ts", "event_id"], 3)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg4"),
        F.round(F.min("value").over(w), 4).alias("min4"),
    )


@query(
    "over_range_bounded",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS sum_1h,
           count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h
    FROM events
    """,
    tags=("batch", "over"),
)
def over_range_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded RANGE OVER on event time (RowTimeBoundedRangeOver.scala):
    per-row trailing 1-hour aggregate, ordered by WHOLE epoch seconds on
    both engines. The truncation must be explicit in the oracle: DuckDB's
    epoch(ts) keeps the microsecond fraction, so two same-user events
    inside one second are RANGE peers for Spark's unix_seconds key but not
    for a fractional key — the r13 sf0.1 gate caught exactly that row
    (sf0.01 has no same-user same-second pair)."""
    e = T(spark, sf_dir, "events").withColumn(
        "__epoch", F.unix_seconds(F.col("ts"))
    )
    w = over_ops.range_bounded_seconds(["user_id"], "__epoch", 3600)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        F.count("*").over(w).alias("n_1h"),
    )


@query(
    "over_ranking",
    oracle="""
    SELECT event_id, user_id,
           row_number()  OVER w AS rn,
           rank()        OVER w_v AS rnk,
           dense_rank()  OVER w_v AS drnk,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event
    FROM events
    WINDOW w   AS (PARTITION BY user_id ORDER BY ts, event_id),
           w_v AS (PARTITION BY user_id ORDER BY event_type, event_id)
    """,
    tags=("batch", "over", "exceeds"),
)
def over_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEEDS the reference: Flink 1.6's BasicOperatorTable has no
    RANK/ROW_NUMBER/LEAD/LAG (FunctionCatalog.scala:295-461); Spark window
    functions provide them natively, declared as engine extensions."""
    from pyspark.sql import Window

    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_v = Window.partitionBy("user_id").orderBy("event_type", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w_v).cast("long").alias("rnk"),
        F.dense_rank().over(w_v).cast("long").alias("drnk"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
    )


# ---------------------------------------------------------------------------
# Interval join on event time (§2.3, batch half of bench item 7)
# ---------------------------------------------------------------------------


@query(
    "interval_join_events",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id,
           round(b.value, 2) AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts
     AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
    tags=("batch", "join", "interval"),
    bench=True,
)
def interval_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded (interval) join (TimeBoundedStreamJoin.scala:55,
    IntervalJoinOperator.java:89): purchases within 30min after a click by
    the same user. Batch form = equi-join on user + range residual; the
    streaming form adds watermarks (streaming.interval_join)."""
    from flink_1_6_0_spark.operators.joins import interval_join

    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    # self-join: prefix the right side so attribute lineage is unambiguous
    buys = e.filter(F.col("event_type") == "purchase").select(
        [F.col(c).alias(f"b_{c}") for c in e.columns]
    )
    out = interval_join(
        clicks, buys, [("user_id", "b_user_id")], "ts", "b_ts", "0 seconds", "30 minutes"
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("b_event_id").alias("purchase_id"),
        "user_id",
        F.round(F.col("b_value"), 2).alias("purchase_value"),
    )


@query(
    "window_count_evictor",
    oracle="""
    WITH ranked AS (
      SELECT user_id,
             time_bucket(INTERVAL 1 HOUR, ts) AS w_start,
             value,
             row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
                                ORDER BY ts DESC, value DESC) AS rn
      FROM events)
    SELECT user_id, w_start,
           CAST(count(*) AS INT)  AS n_kept,
           round(sum(value), 2)   AS sum_kept
    FROM ranked WHERE rn <= 3
    GROUP BY user_id, w_start
    ORDER BY user_id, w_start
    """,
    tags=("batch", "window"),
)
def window_count_evictor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CountEvictor (windowing/evictors/CountEvictor.java): tumbling 1-hour
    windows per user keep only their LAST 3 elements (time order, ties by
    value) before aggregating. The eviction is an array expression over the
    window's collected elements; the oracle expresses the same retention as
    a from-the-end row_number."""
    e = T(spark, sf_dir, "events")
    out = win_ops.evicted_window_agg(e, ["user_id"], "ts", "1 hour", "value", keep_last_n=3)
    return out.orderBy("user_id", "w_start")


@query(
    "window_count_tumble",
    oracle="""
    WITH numbered AS (
      SELECT user_id, value,
             CAST((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)
                  // 100 AS BIGINT) AS count_window
      FROM events)
    SELECT user_id, count_window,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2)     AS sum_value
    FROM numbered
    GROUP BY user_id, count_window
    ORDER BY user_id, count_window
    """,
    tags=("batch", "window"),
)
def window_count_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countWindow(100) (KeyedStream.countWindow → GlobalWindows +
    CountTrigger), batch form: rows per user in (ts, event_id) order bucketed
    into 100-element windows, then aggregated per bucket."""
    e = T(spark, sf_dir, "events")
    bucketed = win_ops.count_window(e, ["user_id"], ["ts", "event_id"], 100)
    return (
        bucketed.groupBy("user_id", "count_window")
        .agg(F.count("*").cast("bigint").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .orderBy("user_id", "count_window")
    )


@query(
    "window_multi_rollup",
    oracle="""
    SELECT gran, bucket, event_type, n, sum_value FROM (
      SELECT 'hour' AS gran, time_bucket(INTERVAL 1 HOUR, ts) AS bucket, event_type,
             count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 2, 3
      UNION ALL
      SELECT 'day', time_bucket(INTERVAL 1 DAY, ts), event_type,
             count(*), round(sum(value), 2)
      FROM events GROUP BY 2, 3
    )
    """,
    tags=("batch", "window", "rollup"),
)
def window_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity rollup (the hypertable/continuous-aggregate pattern:
    hour AND day buckets materialized together): one scan, GROUPING SETS over
    pre-bucketed time columns — Spark computes both granularities in a single
    Expand + one shuffle instead of two scans/aggregations. The oracle is the
    equivalent two-level UNION ALL."""
    e = T(spark, sf_dir, "events")
    bucketed = e.select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        F.date_trunc("day", F.col("ts")).alias("d"),
        "event_type",
        "value",
    )
    bucketed.createOrReplaceTempView("__rollup_src")
    out = spark.sql(
        """
        SELECT CASE WHEN h IS NOT NULL THEN 'hour' ELSE 'day' END AS gran,
               coalesce(h, d) AS bucket, event_type,
               count(*) AS n, round(sum(value), 2) AS sum_value
        FROM __rollup_src
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type))
        """
    )
    return out


@query(
    "window_topn",
    oracle="""
    WITH agg AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS ws, user_id,
             round(sum(value), 2) AS total
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT ws, user_id, total,
             row_number() OVER (PARTITION BY ws ORDER BY total DESC, user_id) AS rn
      FROM agg)
    SELECT ws, user_id, total, rn::BIGINT AS rn
    FROM ranked WHERE rn <= 3
    """,
    tags=("batch", "window", "rank"),
)
def window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window TopN (the canonical Flink pattern: tumbling window → per-window
    ranking → top 3 users by summed value). Window agg is map-side partial;
    the rank window partitions by window-start, so state is one window's
    group list — never a global sort. Deterministic ties (total DESC,
    user_id)."""
    e = T(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").alias("ws"), "user_id", "total")
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("ws").orderBy(F.desc("total"), F.asc("user_id")))
    return agg.withColumn("rn", rn.cast("long")).filter(F.col("rn") <= 3)


@query(
    "events_cohort_retention",
    oracle="""
    WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
               FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    sizes AS (SELECT cohort, count(*)::BIGINT AS cohort_size FROM f GROUP BY cohort),
    joined AS (
      SELECT f.cohort, (datediff('day', f.cohort, act.wk) // 7)::BIGINT AS week_offset,
             act.user_id
      FROM f JOIN act USING (user_id))
    SELECT j.cohort, j.week_offset,
           count(DISTINCT j.user_id)::BIGINT AS n_active,
           any_value(s.cohort_size) AS cohort_size,
           round(count(DISTINCT j.user_id) * 1.0 / any_value(s.cohort_size), 4) AS retention
    FROM joined j JOIN sizes s ON j.cohort = s.cohort
    GROUP BY j.cohort, j.week_offset
    """,
    tags=("batch", "window", "analytics"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (the classic product-analytics rollup): users
    cohorted by first-activity ISO week, per-cohort weekly active fraction.
    date_trunc('week') anchors Mondays identically on both engines (7-day
    window() buckets would NOT align: Spark anchors 1970-01-01, DuckDB
    2000-01-03). Two map-side-combined aggregates + one equi-join on
    user_id; cohort sizes broadcast back."""
    e = T(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    f = e.groupBy("user_id").agg(F.min(wk).alias("cohort"))
    act = e.select("user_id", wk.alias("wk")).distinct()
    sizes = f.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    joined = f.join(act, "user_id").select(
        "cohort",
        F.floor(F.datediff(F.col("wk"), F.col("cohort")) / 7).cast("long").alias("week_offset"),
        "user_id",
    )
    return (
        joined.groupBy("cohort", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            "cohort", "week_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias("retention"),
        )
    )


@query(
    "interval_join_exclusive",
    oracle="""
    WITH e AS (SELECT event_id, user_id, event_type, date_trunc('minute', ts) AS ts
               FROM events)
    SELECT a.event_id AS click_id, b.event_id AS purchase_id, a.user_id
    FROM (SELECT * FROM e WHERE event_type = 'click') a
    JOIN (SELECT * FROM e WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts < a.ts + INTERVAL 30 MINUTE
    """,
    tags=("batch", "join", "interval"),
)
def interval_join_exclusive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCLUSIVE interval-join bounds (IntervalJoined.lowerBoundExclusive /
    upperBoundExclusive, KeyedStream.java:478,488; IntervalJoinITCase.java:284
    testBoundsCanBeExclusive — surfaced by the r12 streaming-runtime port):
    purchases STRICTLY inside (click.ts, click.ts + 30min) on MINUTE-
    truncated event times, so boundary-equal pairs exist and the strict
    bounds demonstrably exclude them (raw microsecond timestamps never tie —
    the inclusive and exclusive forms would be vacuously identical). The
    oracle uses > / < where interval_join_events uses >= / <=."""
    from flink_1_6_0_spark.operators.joins import interval_join

    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.date_trunc("minute", F.col("ts")).alias("ts")
    )
    clicks = e.filter(F.col("event_type") == "click")
    buys = e.filter(F.col("event_type") == "purchase").select(
        [F.col(c).alias(f"b_{c}") for c in e.columns]
    )
    out = interval_join(
        clicks, buys, [("user_id", "b_user_id")], "ts", "b_ts", "0 seconds", "30 minutes",
        lower_exclusive=True, upper_exclusive=True,
    )
    return out.select(
        F.col("event_id").alias("click_id"),
        F.col("b_event_id").alias("purchase_id"),
        "user_id",
    )


@query(
    "window_cascade_rowtime",
    oracle="""
    WITH w1 AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR
                 - INTERVAL 1 MILLISECOND AS rowtime,
               count(*) AS n
        FROM events GROUP BY 1
    )
    SELECT epoch_ms(time_bucket(INTERVAL 4 HOUR, rowtime) + INTERVAL 4 HOUR
             - INTERVAL 1 MILLISECOND) AS wr,
           count(*)     AS n_windows,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM w1 GROUP BY 1
    """,
    tags=("batch", "window", "sql-frontend"),
)
def window_cascade_rowtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASCADED group windows on TUMBLE_ROWTIME (TimeAttributesITCase.scala:
    341/:374 — `w.rowtime` = window end − 1 ms is itself a rowtime): a 1-hour
    tumble's rowtime feeds a 4-hour tumble, both spelled in Flink SQL through
    the front-end rewrite. Catalyst folds each level into one hash aggregate;
    the second level shuffles only first-level window rows (≤ hours, not
    events) — the cascade is cheaper than the base aggregate at any scale."""
    from flink_1_6_0_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    te.register_table("events", T(spark, sf_dir, "events"))
    return te.sql(
        """
        SELECT unix_millis(TUMBLE_ROWTIME(rowtime, INTERVAL '4' HOUR)) AS wr,
               count(*) AS n_windows,
               sum(n)   AS n_events
        FROM (
          SELECT TUMBLE_ROWTIME(ts, INTERVAL '1' HOUR) AS rowtime,
                 count(*) AS n
          FROM events
          GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)
        )
        GROUP BY TUMBLE(rowtime, INTERVAL '4' HOUR)
        """
    )
