"""Streaming sources & sinks — SURVEY.md §2.1, §2.11.

Reference → Spark:
- Kafka consumer/producer (FlinkKafkaConsumerBase.java:84,
  FlinkKafkaProducer011.java:94) → readStream/writeStream format("kafka")
  (exactly-once via checkpointed offsets + idempotent epoch writes — the
  moral equivalent of TwoPhaseCommitSinkFunction)
- env.socketTextStream (StreamExecutionEnvironment.java:1194)
  → format("socket")
- readFile watch mode (ContinuousFileMonitoringFunction,
  StreamExecutionEnvironment.java:999) → file-source streams (new-file
  discovery per micro-batch)
- StreamingFileSink/BucketingSink → writeStream format("parquet")
- print()/debug sinks → format("console") / format("memory")

Kafka/socket need live endpoints; tests drive the file and memory paths.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.catalog import _events_read_schema, normalize_table


def read_parquet_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """A parquet directory replayed as a stream (readFile watch-mode analog;
    also the test harness for every windowed-agg/join query: bounded input
    drives the stream to completion with processAllAvailable).

    Hardens the session first: the schema probe below dies on
    TIMESTAMP(NANOS) parquet (events table) unless nanosAsLong is set — and
    a bare driver session may run a streaming query before any batch one."""
    from flink_1_6_0_spark.queries import harden_session

    harden_session(spark)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        # file streams require a directory source; narrow with a glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TESTDATA events table as a stream (ts normalized from ns).

    When events.ts arrives TIMESTAMP_NTZ the explicit TIMESTAMP read schema
    does the conversion inside the scan (same trick as catalog.read_table —
    no cast projection per micro-batch); otherwise normalize post-read."""
    path = os.path.join(sf_dir, "events.parquet")
    from flink_1_6_0_spark.queries import harden_session

    harden_session(spark)
    schema = _events_read_schema(spark, path)
    if schema is not None:
        reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        return reader.parquet(os.path.dirname(path))
    return normalize_table("events", read_parquet_stream(spark, path))


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark source (timestamp, value) — Spark's rate source."""
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """env.socketTextStream (StreamExecutionEnvironment.java:1194)."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


def kafka_stream(spark: SparkSession, bootstrap: str, topics: str, starting_offsets: str = "earliest") -> DataFrame:
    """FlinkKafkaConsumer analog. Requires the spark-sql-kafka package on the
    classpath and a live broker — neither exists in this container; the call
    shape is the declared surface."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def to_memory_sink(df: DataFrame, name: str, output_mode: str = "append"):
    """Debug/test sink: run to completion synchronously, query via SQL.
    Returns the StreamingQuery (caller stops it)."""
    q = df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    return q


def to_parquet_sink(df: DataFrame, path: str, checkpoint: str, output_mode: str = "append"):
    """StreamingFileSink analog — exactly-once via checkpointed file commits."""
    return (
        df.writeStream.outputMode(output_mode)
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def to_foreach_batch(df: DataFrame, fn, checkpoint: str | None = None, output_mode: str = "update"):
    """TwoPhaseCommitSinkFunction analog: fn(batch_df, epoch_id) with epoch_id
    as the idempotence key — retried epochs carry the same id."""
    w = df.writeStream.outputMode(output_mode).foreachBatch(fn)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
