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
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.catalog import _events_read_schema, normalize_table


#: Per-epoch row budget for time-ordered directory replays. The r15 x100
#: stream probe found the bound empirically: 3 epochs of ~3.3M rows OOM'd
#: the JVM heap at the ApplyInPandasWithState STATE readback (a stateful
#: kernel buffers its per-key state until the epoch's watermark advance, so
#: per-epoch input volume IS the state high-water mark on a single-JVM
#: local run). ~350k rows/epoch is the x10 gate's proven-green volume; on a
#: real cluster the same state distributes across executors and the budget
#: scales with executor count.
_EPOCH_ROWS_TARGET = 350_000


_PER_TRIGGER_CACHE: dict[tuple[str, float], int] = {}

#: Rows of per-epoch input one streaming state partition should carry. The
#: r16 scaling block showed stateful queries were state-store-COMMIT bound,
#: not data bound, at bench scale: `spark.sql.shuffle.partitions` =
#: SPARK_GRAFT_CPUS handed a 10k-row epoch 32 partitions (a stream-stream
#: join commits 4 store instances per partition per micro-batch — 128
#: commits for ~4k state rows), making 32 cores 2.2x SLOWER than 8 for
#: stream_tumble_agg and stream_outer_join ~25 s at sf0.01 (r17 attribution:
#: 217 s cumulative commitTimeMs in one batch). Partition count now derives
#: from DATA VOLUME (rows per epoch), capped by SPARK_GRAFT_CPUS so cluster
#: runs keep full parallelism: at 100 TB the cap binds long before this
#: target does, while toy/bench epochs stop paying two orders of magnitude
#: of per-store constant overhead. NOT a local[32] special case — the same
#: rule sizes up with the tier (x10 stamped tier: 333k-row epochs -> 7
#: partitions at both core counts, so the driver's core sweep measures the
#: engine, not store constants).
_ROWS_PER_STATE_PARTITION = 50_000

_ROW_COUNT_CACHE: dict[tuple[str, int, int], int] = {}


def _cached_row_count(spark: SparkSession, path: str) -> int:
    """Parquet row count (footer metadata job), memoized per
    (realpath, mtime_ns, size) — the same immutable-input convention as
    _PER_TRIGGER_CACHE / the EMB_CAP count memo; bench runs construct the
    same stream dozens of times."""
    stat_target = path
    if os.path.isdir(path):
        marker = os.path.join(path, "_TIME_ORDERED")
        if os.path.isfile(marker):
            stat_target = marker
    st = os.stat(stat_target)
    key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    hit = _ROW_COUNT_CACHE.get(key)
    if hit is None:
        hit = spark.read.parquet(path).count()
        _ROW_COUNT_CACHE[key] = hit
    return hit


def _source_epochs(spark: SparkSession, path: str) -> int:
    """How many micro-batches the bounded replay of ``path`` produces under
    the same rules events_stream/read_parquet_stream apply: single files and
    unstamped directories drain in ONE epoch; a _TIME_ORDERED directory
    replays ceil(n_parts / per_trigger) epochs."""
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, "_TIME_ORDERED")):
        per = _time_ordered_per_trigger(spark, path)
        n_parts = sum(
            1 for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
        )
        return max(1, -(-n_parts // per))
    return 1


def stateful_shuffle_partitions(
    spark: SparkSession, path: str, epochs: int | None = None
) -> int:
    """State-partition count for a bounded streaming replay of ``path``:
    ceil(rows-per-epoch / _ROWS_PER_STATE_PARTITION), clamped to
    [1, SPARK_GRAFT_CPUS]. Derived from data volume only (see the constant's
    note); the CPUS cap is the cluster-parallelism ceiling, not a tuning
    knob."""
    total = _cached_row_count(spark, path)
    if epochs is None:
        epochs = _source_epochs(spark, path)
    per_epoch = max(1, total // max(1, epochs))
    cap = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return max(1, min(cap, -(-per_epoch // _ROWS_PER_STATE_PARTITION)))


@contextmanager
def scaled_state_partitions(spark: SparkSession, path: str, epochs: int | None = None):
    """Scope ``spark.sql.shuffle.partitions`` to a data-derived value for one
    streaming query's lifetime (the conf is read at query START and fixes the
    state-store partition count for that checkpoint). Restores the previous
    value on exit; yields the chosen count."""
    n = stateful_shuffle_partitions(spark, path, epochs)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield n
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _time_ordered_per_trigger(spark: SparkSession, path: str) -> int:
    """maxFilesPerTrigger for a `_TIME_ORDERED`-stamped directory: at least
    3 epochs (multi-batch evidence), more when needed to keep each epoch
    under _EPOCH_ROWS_TARGET rows. The row count is parquet-footer
    metadata (no data scan) but still a Spark job — cached per
    (path, marker mtime) since stamped tiers are immutable once published
    (bench runs construct the same stream dozens of times)."""
    key = (path, os.path.getmtime(os.path.join(path, "_TIME_ORDERED")))
    hit = _PER_TRIGGER_CACHE.get(key)
    if hit is not None:
        return hit
    n_parts = sum(
        1 for f in os.listdir(path) if f.startswith("part-") and f.endswith(".parquet")
    )
    total = _cached_row_count(spark, path)
    epochs = max(3, -(-total // _EPOCH_ROWS_TARGET))
    per = max(1, n_parts // epochs)
    if n_parts < epochs:
        # r15 ADVICE: per clamps to 1 file/trigger, but with fewer part
        # files than needed epochs each file ALREADY exceeds the row
        # budget — the exact single-JVM state-OOM condition the budget
        # exists to prevent (e.g. 30 parts holding 60M rows = 2M-row
        # epochs). Warn loudly so the tier gets re-synthesized with
        # enough files (scale_synth sizes part counts from the budget).
        import warnings

        warnings.warn(
            f"time-ordered tier {path}: {n_parts} part files < {epochs} "
            f"epochs needed to keep epochs under {_EPOCH_ROWS_TARGET} rows "
            f"({total} total) — epochs will exceed the state budget; "
            "re-synthesize the tier with more part files",
            RuntimeWarning,
            stacklevel=2,
        )
    _PER_TRIGGER_CACHE[key] = per
    return per


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
    if os.path.isdir(path) and os.path.isfile(os.path.join(path, "_TIME_ORDERED")):
        # Directory table stamped time-ordered (scale_synth._stamp_time_ordered:
        # one part file per disjoint ts range, ascending mtimes): replay as
        # >= 3 genuinely time-ordered micro-batches — the file source admits
        # oldest-mtime first, so watermarks advance strictly forward. The
        # caller's max_files_per_trigger is overridden: its default of 1 was
        # tuned for single-file/staged layouts, and an unstamped directory
        # would have to drain in one epoch instead (see events_stream).
        max_files_per_trigger = _time_ordered_per_trigger(spark, path)
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
        if os.path.isfile(path):
            # single-file testdata layout: glob-narrow within the parent
            reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            reader = reader.option("pathGlobFilter", os.path.basename(path))
            return reader.parquet(os.path.dirname(path))
        if os.path.isfile(os.path.join(path, "_TIME_ORDERED")):
            # r15 (r14 verdict task 3): a directory table stamped
            # time-ordered (scale_synth writes the x10 events as one part
            # file per disjoint ts range with ascending mtimes) replays as
            # >= 3 REAL micro-batches — the file source admits oldest-mtime
            # first, so the watermark advances strictly forward and the
            # whole watermarked stream family gets multi-epoch progression
            # evidence at the 1M-event tier instead of a single-epoch drain.
            # Epoch size is row-budgeted (see _EPOCH_ROWS_TARGET): stateful
            # kernels buffer per-key state until the epoch's watermark
            # advance, so unbounded epochs OOM exactly when the tier grows.
            reader = spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", _time_ordered_per_trigger(spark, path)
            )
            return reader.parquet(path)
        # Unstamped Spark-written DIRECTORY table: stream the directory
        # itself — the unconditional glob filter used to match 0 files here
        # and every stream query read an empty source (r14 x10 gate
        # finding). Drain in ONE micro-batch: part files are not
        # time-ordered, so a 1-file-per-trigger replay feeds the watermark
        # out of order and drops most rows as late — the bounded-replay
        # semantics the oracles model are the single-epoch drain. Ordered
        # MULTI-batch progression is separately exercised (and oracle-
        # checked) by the stream_multibatch_* family over the date-
        # partitioned lake, whose batches are genuinely time-ordered.
        reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1_000_000)
        return reader.parquet(path)
    return normalize_table("events", read_parquet_stream(spark, path))


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Synthetic benchmark source (timestamp, value) — Spark's rate source."""
    return spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()


def socket_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """env.socketTextStream (StreamExecutionEnvironment.java:1194)."""
    return spark.readStream.format("socket").option("host", host).option("port", port).load()


# The exact option spellings of Spark's kafka DataSource (Structured
# Streaming + Kafka Integration Guide). Centralized so the contract test
# (tests/test_sources.py::test_kafka_call_shape_*) fails loudly if a
# spelling drifts. Lighting this up needs the package
# org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> (for this
# image: 4.1.2) on the classpath plus a live broker — neither ships in the
# container, so the tests pin the call shape, not broker I/O.
def kafka_source_options(bootstrap: str, topics: str, starting_offsets: str = "earliest") -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(bootstrap: str, topic: str) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
    }


def kafka_stream(spark: SparkSession, bootstrap: str, topics: str, starting_offsets: str = "earliest") -> DataFrame:
    """FlinkKafkaConsumer analog (FlinkKafkaConsumerBase.java:84):
    subscribe + bootstrap servers + starting offsets (the reference's
    setStartFromEarliest/Latest maps to startingOffsets)."""
    return (
        spark.readStream.format("kafka")
        .options(**kafka_source_options(bootstrap, topics, starting_offsets))
        .load()
    )


def kafka_sink(df: DataFrame, bootstrap: str, topic: str, checkpoint: str):
    """FlinkKafkaProducer analog (FlinkKafkaProducer011.java:94): the frame
    must carry a ``value`` column (and optional ``key``) per the kafka sink
    contract; exactly-once comes from the checkpointed sink commit protocol,
    the same guarantee tier as the reference's transactional producer."""
    return (
        df.writeStream.format("kafka")
        .options(**kafka_sink_options(bootstrap, topic))
        .option("checkpointLocation", checkpoint)
        .start()
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
