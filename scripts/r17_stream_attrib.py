"""R17 task 1: attribute stream_outer_join / stream_evicted_window cost.

Runs each query's streaming pipeline at sf0.01 exactly as the registered
query does (memory sink, processAllAvailable), then dumps every micro-batch's
progress record: durationMs breakdown (addBatch/getBatch/queryPlanning/
walCommit/commitOffsets), stateOperators (commit time, rows, memory bytes,
shuffle partitions), and wall time. Usage:

    python scripts/r17_stream_attrib.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_1_6_0_spark.session import get_spark  # noqa: E402
from flink_1_6_0_spark.sources.stream import events_stream, to_memory_sink  # noqa: E402


def run_outer_join(spark, sf_dir):
    from flink_1_6_0_spark.streaming.nonwindow_join import bounded_outer_join

    ev = events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        *[F.col(c).alias(f"b_{c}") for c in ev.columns]
    )
    joined = bounded_outer_join(
        clicks, buys, [("user_id", "b_user_id")], "ts", "b_ts", bound="30 minutes"
    ).select(
        F.col("event_id").alias("click_id"), F.col("b_event_id").alias("purchase_id")
    )
    return joined, "append"


def run_evicted_window(spark, sf_dir):
    from flink_1_6_0_spark.streaming.evictors import stream_evicted_window

    stream = events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
    out = stream_evicted_window(
        stream, ["user_id"], "ts", "event_id", "value", 86400, keep_last_n=2
    )
    return out, "append"


def run_interval_join(spark, sf_dir):
    from flink_1_6_0_spark.streaming.interval_join import stream_interval_join

    ev = events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        *[F.col(c).alias(f"b_{c}") for c in ev.columns]
    )
    joined = stream_interval_join(
        clicks, buys, [("user_id", "b_user_id")], "ts", "b_ts",
        "0 seconds", "30 minutes", left_delay="1 minute", right_delay="1 minute",
    ).select(F.col("event_id").alias("click_id"), F.col("b_event_id").alias("purchase_id"))
    return joined, "append"


def run_tumble_agg(spark, sf_dir):
    stream = events_stream(spark, sf_dir).withWatermark("ts", "1 minute")
    agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    out = agg.select(F.col("window.start").alias("ws"), "event_type", "n", "sum_value")
    return out, "complete"


BUILDERS = {
    "stream_outer_join": run_outer_join,
    "stream_evicted_window": run_evicted_window,
    "stream_interval_join": run_interval_join,
    "stream_tumble_agg": run_tumble_agg,
}


def attribute(spark, name, sf_dir):
    df, mode = BUILDERS[name](spark, sf_dir)
    spark.sparkContext.setJobDescription(f"r17 attrib: {name}")
    t0 = time.perf_counter()
    q = to_memory_sink(df, f"attr_{name}", mode)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    wall = time.perf_counter() - t0
    nrows = spark.table(f"attr_{name}").count()
    progresses = [json.loads(p.json) for p in q.recentProgress]
    batches = []
    for p in progresses:
        so = [
            {
                k: o.get(k)
                for k in (
                    "operatorName", "numRowsTotal", "numRowsUpdated",
                    "allUpdatesTimeMs", "commitTimeMs", "memoryUsedBytes",
                    "numShufflePartitions", "numStateStoreInstances",
                    "allRemovalsTimeMs",
                )
            }
            for o in p.get("stateOperators", [])
        ]
        batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs"),
                "stateOperators": so,
            }
        )
    return {"query": name, "wall_sec": round(wall, 3), "result_rows": nrows, "batches": batches}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["stream_outer_join", "stream_evicted_window"]
    spark = get_spark(app_name="r17-stream-attrib")
    out = [attribute(spark, n, sf_dir) for n in names]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
