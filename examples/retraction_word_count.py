"""Retraction chain — Flink's "count the counts" streaming pipeline
(RetractionITCase.scala:51 testWordCount): an unbounded
groupBy(word).sum feeding groupBy(count).count, where every first-level
update must RETRACT its previous value downstream or the frequency
histogram smears each word over all the counts it passed through.

Spark forbids two stateful aggregates in one streaming query, so
streaming.group_agg.chained_group_agg runs the chain as foreachBatch with
explicit first-level state (idempotent per-epoch partials, merged per
batch) and recomputes the downstream aggregate over the merged table —
a superseded count simply no longer exists, which IS the retraction.

Run: python examples/retraction_word_count.py
Prints the frequency table after every micro-batch; the final table is
{count 1: 2 words, count 2: 1 word, count 6: 1 word} — the reference
golden — while intermediate epochs show counts migrating between buckets
without ever double-counting a word.
"""

import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from flink_1_6_0_spark.session import get_spark
from flink_1_6_0_spark.sources.stream import read_parquet_stream
from flink_1_6_0_spark.streaming.group_agg import chained_group_agg

WORDS = [
    ("Hello", 1), ("word", 1), ("Hello", 1), ("bark", 1), ("bark", 1),
    ("bark", 1), ("bark", 1), ("bark", 1), ("bark", 1), ("flink", 1),
]

if __name__ == "__main__":
    spark = get_spark(app_name="retraction-word-count")
    work = tempfile.mkdtemp(prefix="retract_example_")

    src = f"{work}/src"
    for i in range(0, len(WORDS), 2):  # 5 files → 5 micro-batches
        spark.createDataFrame(WORDS[i : i + 2], "word string, num int").repartition(
            1
        ).write.mode("append").parquet(src)

    def emit(df, epoch):
        rows = sorted(tuple(r) for r in df.collect())
        print(f"epoch {epoch}: count → frequency {rows}")

    q = (
        chained_group_agg(
            read_parquet_stream(spark, src),
            ["word"],
            [F.sum("num").alias("cnt")],
            [F.sum("cnt").alias("cnt")],
            lambda first_level: first_level.groupBy("cnt").agg(
                F.count("word").alias("frequency")
            ),
            f"{work}/state",
            emit,
        )
        .option("checkpointLocation", f"{work}/ckpt")
        .start()
    )
    q.processAllAvailable()
    q.stop()
