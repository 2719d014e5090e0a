"""Streaming deduplication — SURVEY.md §M3 build-plan row ("deduplication:
keyed dropDuplicates with watermark").

Reference analog: first-row-per-key patterns built on keyed ValueState
(ProcessFunction, KeyedStream.java:361) with state TTL. Spark has the
operator built in: dropDuplicates on a streaming frame keeps first-seen per
key in the state store; dropDuplicatesWithinWatermark bounds the state by
the watermark (the StateTtlConfig analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Keep the first row per key — unbounded state (TTL disabled)."""
    return stream.dropDuplicates(keys)


def dedup_stream_within_watermark(stream: DataFrame, keys: list[str], rowtime: str, delay: str) -> DataFrame:
    """Keep the first row per key with state bounded by the watermark
    (StateTtlConfig ≈ watermark-scoped dedup state)."""
    return stream.withWatermark(rowtime, delay).dropDuplicatesWithinWatermark(keys)
