"""Late-data capture — SURVEY.md §2.5 "late data side output" row.

Reference: WindowedStream.sideOutputLateData(tag) (WindowedStream.java:178) +
allowedLateness (WindowOperator.java:134) — rows arriving behind the
watermark beyond the allowed lateness go to a side output instead of the
window aggregate.

Spark has no built-in late-data side output (the watermark silently drops
late rows). The capture pattern: fork the stream BEFORE the watermark is
applied — the main branch aggregates with the watermark; the late branch
compares each row's event time against a (conservative, processing-side)
high-water mark and files laggards. The cleanest exact form runs in
foreachBatch where the batch's own max(ts) approximates the watermark;
both are provided.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def split_late(df: DataFrame, ts_col: str, delay: str, high_watermark_ts) -> tuple[DataFrame, DataFrame]:
    """Batch/foreachBatch form: given the current high watermark (max event
    time seen so far minus nothing), split rows into (on_time, late) where
    late means ts < high_watermark - delay — exactly the rows Flink's window
    operator would route to the late-data tag."""
    bound = F.lit(high_watermark_ts).cast("timestamp") - F.expr(f"INTERVAL {delay}")
    on_time = df.filter(F.col(ts_col) >= bound)
    late = df.filter(F.col(ts_col) < bound)
    return on_time, late


def foreach_batch_late_capture(stream: DataFrame, ts_col: str, delay: str, on_time_fn, late_fn):
    """Streaming form: per micro-batch, rows behind (batch-max(ts) - delay)
    are routed to ``late_fn``, the rest to ``on_time_fn`` — the
    sideOutputLateData(tag) shape with the batch max as the watermark proxy
    (conservative within a batch; across batches the true watermark is
    min-of-sources, which Spark manages for the main aggregate itself)."""

    def handle(batch: DataFrame, epoch_id: int) -> None:
        hwm = batch.agg(F.max(ts_col)).collect()[0][0]
        if hwm is None:
            return
        on_time, late = split_late(batch, ts_col, delay, hwm)
        on_time_fn(on_time, epoch_id)
        late_fn(late, epoch_id)

    return stream.writeStream.outputMode("append").foreachBatch(handle)
