"""SocketWindowWordCount — the canonical streaming example
(flink-examples-streaming socket/SocketWindowWordCount.java): words from a
socket, counted in 5-second processing-time tumbling windows.

Run: nc -lk 9999   (in another terminal), then
     python examples/socket_window_word_count.py [host [port]]
"""

import sys

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from flink_1_6_0_spark.session import get_spark
from flink_1_6_0_spark.sources.stream import socket_stream

if __name__ == "__main__":
    host = sys.argv[1] if len(sys.argv) > 1 else "localhost"
    port = int(sys.argv[2]) if len(sys.argv) > 2 else 9999
    spark = get_spark(app_name="socket-window-word-count")
    lines = socket_stream(spark, host, port)
    words = lines.select(
        F.explode(F.split(F.col("value"), r"\s+")).alias("word"),
        F.current_timestamp().alias("proctime"),  # processing-time attribute
    )
    counts = (
        words.filter(F.col("word") != "")
        .groupBy(F.window("proctime", "5 seconds"), "word")
        .agg(F.count("*").alias("count"))
    )
    q = counts.writeStream.outputMode("update").format("console").start()
    q.awaitTermination()
