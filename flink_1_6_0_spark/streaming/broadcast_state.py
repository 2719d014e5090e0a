"""Broadcast state — SURVEY.md §2.11.

Reference: DataStream.broadcast(MapStateDescriptor) + BroadcastProcessFunction
(flink-streaming-java DataStream.java:425, state/BroadcastState.java): a
low-throughput control stream (rules, configs, ML models) is replicated to
every task; the keyed data stream reads the latest broadcast state per
element.

Spark mapping: Structured Streaming has no second input inside a stateful
operator, so the idiomatic pattern is ``foreachBatch`` + per-micro-batch
re-read of the control table + ``F.broadcast`` join — every micro-batch sees
the newest rules exactly like the reference's tasks see the latest broadcast
element (update granularity = one micro-batch, the engine's latency unit;
the reference's is one element — documented drift).

Scale: the control side must stay broadcast-sized (the reference holds it in
every task's memory too); the data-side join is map-side only — no shuffle
is introduced on the stream.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def broadcast_rules_join(
    stream: DataFrame,
    spark: SparkSession,
    rules_path: str,
    on: str,
    sink_fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str | None = None,
):
    """Join a live stream against a mutable broadcast rule table.

    ``rules_path`` is re-read at every micro-batch (parquet); rows join on
    ``on`` with an inner broadcast join; ``sink_fn(joined_df, epoch_id)``
    receives each enriched micro-batch (TwoPhaseCommit analog: epoch_id
    makes idempotent writes possible). Returns the StreamingQuery."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        rules = spark.read.parquet(rules_path)
        sink_fn(batch_df.join(F.broadcast(rules), on, "inner"), epoch_id)

    writer = stream.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
