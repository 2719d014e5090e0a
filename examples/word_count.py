"""WordCount — the canonical batch example (flink-examples-batch
wordcount/WordCount.java): tokenize lines, count per word.

Run: python examples/word_count.py [text_file]
"""

import sys

import pyspark.sql.functions as F

sys.path.insert(0, ".")
from flink_1_6_0_spark.session import get_spark
from flink_1_6_0_spark.sources.batch import from_elements

SAMPLE = [
    "to be or not to be",
    "that is the question",
    "whether tis nobler in the mind to suffer",
]


def word_count(df, text_col="value"):
    """flatMap(tokenize) → groupBy(word).sum(1) — the reference's exact
    shape; one shuffle with map-side combine."""
    words = df.select(F.explode(F.split(F.lower(F.col(text_col)), r"\W+")).alias("word"))
    return (
        words.filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"), "word")
    )


if __name__ == "__main__":
    spark = get_spark(app_name="word-count")
    if len(sys.argv) > 1:
        df = spark.read.text(sys.argv[1])
    else:
        df = from_elements(spark, [(line,) for line in SAMPLE], "value string")
    word_count(df).show(20, truncate=False)
