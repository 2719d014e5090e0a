"""Streaming iteration — flink-examples-streaming iteration/
IterateExample.java (feedback loop until a condition exits each element).

Per micro-batch fixpoint form (`iterate_stream`): values double each pass
and leave the loop once they exceed 100 — the reference example's
"iterate until threshold" shape. The TRUE cross-epoch feedback form
(`iterate_stream_feedback`, feedback rows re-entering via the source
directory across micro-batches) is exercised in
tests/test_streaming.py::test_iterate_stream_feedback_cross_epoch.

Run: python examples/stream_iterate.py
"""

import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from flink_1_6_0_spark.session import get_spark
from flink_1_6_0_spark.sources.stream import read_parquet_stream
from flink_1_6_0_spark.streaming.iterate import iterate_stream

if __name__ == "__main__":
    spark = get_spark(app_name="stream-iterate")
    src = tempfile.mkdtemp(prefix="iter_src_")
    spark.createDataFrame([(i,) for i in range(1, 8)], "v long").write.parquet(
        src, mode="overwrite"
    )
    stream = read_parquet_stream(spark, src)
    out = []
    q = iterate_stream(
        stream,
        step_fn=lambda df: df.select((F.col("v") * 2).alias("v")),
        exit_predicate=F.col("v") > 100,
        emit_fn=lambda rows, epoch: out.extend(r.v for r in rows.collect()),
    )
    q.processAllAvailable()
    q.stop()
    print("exited values:", sorted(out))
