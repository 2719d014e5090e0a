"""One-off experiment: does the NTZ->TIMESTAMP cast projection explain the
window_tumble / over_rows_unbounded r3 bench regression?

Variants per query, 5 timed runs each (after a warm-up), medians printed:
  A. current path  — read parquet, withColumn cast (catalog.normalize_table)
  B. raw NTZ       — read parquet, no cast at all
  C. read-schema   — spark.read.schema(... ts TIMESTAMP ...) so conversion
                     happens inside the vectorized parquet reader
"""
from __future__ import annotations

import os
import statistics
import time

import pyspark.sql.functions as F
from flink_1_6_0_spark.operators import over as over_ops
from flink_1_6_0_spark.operators import windows as win_ops
from flink_1_6_0_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-ntz")
path = os.path.join(SF_DIR, "events.parquet")

raw_schema = spark.read.parquet(path).schema
ts_schema = ", ".join(
    f"{f.name} TIMESTAMP" if f.name == "ts" else f"{f.name} {f.dataType.simpleString()}"
    for f in raw_schema.fields
)


def events_a():
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def events_b():
    return spark.read.parquet(path)


def events_c():
    return spark.read.schema(ts_schema).parquet(path)


def q_tumble(e):
    out = e.groupBy(win_ops.tumble("ts", "1 hour").alias("w"), "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
    return out.select(
        F.col("w.start").alias("wstart"), F.col("w.end").alias("wend"), "event_type", "n", "sum_value"
    )


def q_over(e):
    w = over_ops.rows_unbounded(["user_id"], ["ts", "event_id"])
    return e.select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


def consume(df):
    df.write.format("noop").mode("overwrite").save()


for qname, q in (("window_tumble", q_tumble), ("over_rows_unbounded", q_over)):
    for vname, ev in (("A_cast", events_a), ("B_rawntz", events_b), ("C_readschema", events_c)):
        consume(q(ev()))  # warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            consume(q(ev()))
            ts.append(time.perf_counter() - t0)
        print(f"{qname:22s} {vname:13s} median={statistics.median(ts):.3f} all={[round(t,3) for t in ts]}", flush=True)
