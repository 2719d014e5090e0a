"""Time attributes & watermark injection — SURVEY.md §4.3 custom-work item 2.

Reference: DefinedRowtimeAttributes / DefinedProctimeAttribute
(flink-table/.../sources/definedTimeAttributes.scala:33,50), timestamp
extractors (sources/tsextractors/) and watermark strategies
(sources/wmstrategies/BoundedOutOfOrderTimestamps), materialized by
RelTimeIndicatorConverter (StreamTableEnvironment.scala:822).

Spark collapses all of it into two constructs:
- rowtime  → a TimestampType column + ``df.withWatermark(col, delay)``
  (bounded out-of-orderness; same min-of-inputs propagation as Flink's
  watermark model, DataStream.java:888)
- proctime → ``current_timestamp()`` evaluated at processing time
  (semantic drift documented: Flink evaluates per-operator, Spark per
  micro-batch plan — results identical for windowing purposes).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_rowtime(df: DataFrame, column: str, delay: str = "0 seconds") -> DataFrame:
    """Declare ``column`` as the event-time attribute with a
    BoundedOutOfOrderTimestamps watermark of ``delay``."""
    if not df.isStreaming:
        return df  # batch: event-time columns need no watermark (Flink batch ignores them too)
    return df.withWatermark(column, delay)


def with_proctime(df: DataFrame, column: str = "proctime") -> DataFrame:
    """Attach a processing-time attribute (ProctimeSqlFunction marker →
    current_timestamp at execution)."""
    return df.withColumn(column, F.current_timestamp())
