"""Late-data capture — SURVEY.md §2.5 "late data side output" row.

Reference: WindowedStream.sideOutputLateData(tag) (WindowedStream.java:178) +
allowedLateness (WindowOperator.java:134) — rows arriving behind the
watermark beyond the allowed lateness go to a side output instead of the
window aggregate.

Spark has no built-in late-data side output (the watermark silently drops
late rows). The capture pattern: fork the stream BEFORE the watermark is
applied; per micro-batch, rows behind the ENGINE watermark (from
``query.lastProgress.eventTime.watermark`` — max event time over prior
batches minus the delay, the same min-of-sources watermark the main
aggregate uses) are routed to the late branch. No extra driver job per
batch: the watermark is read off the progress report, not recomputed.

lastProgress at batch N describes batch N-1, so the bound is the watermark
as of the END of the previous batch — exactly when Spark (and Flink's
window operator at watermark advance) would start dropping those rows.
Before any progress exists, the watermark is Flink's Long.MIN_VALUE
equivalent: nothing is late.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def split_late(df: DataFrame, ts_col: str, delay: str, high_watermark_ts) -> tuple[DataFrame, DataFrame]:
    """Batch form: given a high-water mark (max event time seen), split rows
    into (on_time, late) where late means ts < high_watermark - delay —
    exactly the rows Flink's window operator would route to the late tag."""
    bound = F.lit(high_watermark_ts).cast("timestamp") - F.expr(f"INTERVAL {delay}")
    on_time = df.filter(F.col(ts_col) >= bound)
    late = df.filter(F.col(ts_col) < bound)
    return on_time, late


def foreach_batch_late_capture(
    stream: DataFrame,
    ts_col: str,
    delay: str,
    on_time_fn,
    late_fn,
    checkpoint: str | None = None,
):
    """Streaming sideOutputLateData(tag): starts (and returns) a foreachBatch
    query that routes each micro-batch's rows behind the engine watermark to
    ``late_fn`` and the rest to ``on_time_fn``.

    The watermark comes from the query's own progress report — the true
    engine watermark, not a batch-local max — so a micro-batch consisting
    ENTIRELY of stragglers is still classified late (the batch-max proxy
    would wave it through). First batch: no watermark yet → all on time,
    matching Flink's initial Long.MIN_VALUE watermark.
    """
    holder: dict = {"max_seen": None}

    def handle(batch: DataFrame, epoch_id: int) -> None:
        # lastProgress (posted at the END of the previous batch) carries that
        # batch's max event time; the running max over all prior batches is
        # the engine's watermark input, and max_seen - delay its watermark at
        # the START of this batch. The `watermark` progress field itself lags
        # one further batch (it reports the value USED, not the one advanced
        # to), so the running max is the faithful read.
        q = holder.get("q")
        if q is not None and q.lastProgress:
            seen = (q.lastProgress.get("eventTime") or {}).get("max")
            if seen and (holder["max_seen"] is None or seen > holder["max_seen"]):
                holder["max_seen"] = seen  # ISO-8601 UTC strings sort correctly
        if holder["max_seen"]:
            bound = F.lit(holder["max_seen"]).cast("timestamp") - F.expr(f"INTERVAL {delay}")
            on_time = batch.filter(F.col(ts_col) >= bound)
            late = batch.filter(F.col(ts_col) < bound)
        else:
            on_time, late = batch, batch.limit(0)
        on_time_fn(on_time, epoch_id)
        late_fn(late, epoch_id)

    # the watermark column must be declared for the engine to track/report it
    writer = stream.withWatermark(ts_col, delay).writeStream.outputMode("update").foreachBatch(handle)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    holder["q"] = q
    return q
