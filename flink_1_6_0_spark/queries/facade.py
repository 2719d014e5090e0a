"""DataStream-façade queries — the round-3 API additions as oracle-checked
surface: windowAll (DataStream.java:748), fold (WindowedStream.java:422,
KeyedStream fold), and windowed coGroup (CoGroupedStreams.java:126).

Each query drives the FAÇADE (flink_1_6_0_spark.datastream_api), not the
underlying DataFrame ops directly, so the driver's oracle gate verifies the
user-facing entry points end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.datastream_api import DataStream
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query


@query(
    "window_all_tumble",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, ts) AS window_start,
           count(*)             AS n,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1
    """,
    tags=("batch", "window", "facade"),
)
def window_all_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timeWindowAll (DataStream.java:769, AllWindowedStream.java): a window
    over the whole stream with NO keys. The reference pins this to
    parallelism 1; here distinct windows still spread across reducers (the
    groupBy key is the window itself) — same semantics, better scaling."""
    out = (
        DataStream(T(spark, sf_dir, "events"))
        .time_window_all("ts", "6 hours")
        .aggregate(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    return out.df.select("window_start", "n", "sum_value")


@query(
    "fold_keyed",
    oracle="""
    SELECT event_type,
           'seed,' || string_agg(event_id::VARCHAR, ',' ORDER BY event_id) AS ids,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
    tags=("batch", "agg", "facade"),
)
def fold_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyedStream.fold (deprecated-in-1.6 but present; WindowedStream.java:422
    carries the windowed twin): accumulate-with-seed, ORDER-SENSITIVE — the
    oracle's ordered string_agg only matches if rows really visit the fold
    function in event_id order, which a commutative aggregate could fake but
    a concatenation cannot."""

    def fold_fn(acc, row):
        acc["ids"] = acc["ids"] + "," + str(row.event_id)
        acc["n"] = acc["n"] + 1
        return acc

    out = (
        DataStream(T(spark, sf_dir, "events").select("event_type", "event_id"))
        .key_by("event_type")
        .fold({"ids": "seed", "n": 0}, fold_fn,
              "event_type string, ids string, n long", order_by=["event_id"])
    )
    return out.df


@query(
    "cogroup_windowed",
    oracle="""
    WITH c AS (SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS w, count(*) AS n_click
               FROM events WHERE event_type = 'click' GROUP BY 1, 2),
         p AS (SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS w, count(*) AS n_purchase
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT coalesce(c.user_id, p.user_id) AS user_id,
           coalesce(c.w, p.w)             AS w,
           coalesce(n_click, 0)           AS n_click,
           coalesce(n_purchase, 0)        AS n_purchase
    FROM c FULL OUTER JOIN p ON c.user_id = p.user_id AND c.w = p.w
    """,
    tags=("batch", "join", "facade"),
)
def cogroup_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed coGroup (CoGroupedStreams.java:126): the apply fires for every
    (key, window) on EITHER side — the oracle's FULL OUTER join of the two
    per-window counts is exactly that contract (an inner windowed join would
    drop the one-sided groups)."""
    import pandas as pd

    # r16 (guide §4.1): the cogroup fn only COUNTS rows — project the scan
    # down to (user_id, ts) before the opaque pandas-cogroup boundary, or
    # every (key, window) group ships all six event columns (including the
    # fat props JSON payload) through the shuffle and the Arrow transpose.
    ev = T(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    left = DataStream(
        ev.filter(F.col("event_type") == "click").drop("event_type")
    ).key_by("user_id")
    right = DataStream(
        ev.filter(F.col("event_type") == "purchase").drop("event_type")
    ).key_by("user_id")

    def fn(key, lpdf, rpdf):
        return pd.DataFrame([{
            "user_id": key[1], "w": key[0],
            "n_click": len(lpdf), "n_purchase": len(rpdf),
        }])

    return (
        left.co_group(right)
        .window("ts", "ts", "1 day")
        .apply(fn, "user_id long, w timestamp, n_click long, n_purchase long")
        .df
    )
