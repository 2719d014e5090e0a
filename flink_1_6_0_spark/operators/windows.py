"""Group windows — SURVEY.md §2.5 (tumble/hop/session, batch + stream).

Reference: window assigners (flink-streaming-java/.../windowing/assigners/,
16 classes), WindowOperator.java:102, SQL group windows
DataStreamGroupWindowAggregate.scala:256-354, batch emulation
DataSetTumble*/DataSetSession*/DataSetSlide*AggReduceGroupFunction.scala.

Spark's `window()` / `session_window()` expressions implement all three
assigners for both batch and streaming — the same expression works on a
bounded DataFrame and a watermarked stream, which is exactly the unified
batch/stream story the reference's Table API aims at.

Scale notes: a tumbling/hopping window agg is one hash shuffle on
(window, keys) with map-side partial aggregation; hop multiplies rows by
size/slide before the shuffle (inherent to the semantics). Session windows
shuffle on keys and merge per key — skewed keys are the thing to watch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def tumble(ts: str | Column, size: str) -> Column:
    """TumblingEventTimeWindows (assigners/TumblingEventTimeWindows.java)."""
    return F.window(ts, size)


def hop(ts: str | Column, slide: str, size: str) -> Column:
    """SlidingEventTimeWindows — Flink arg order (time, slide, size)."""
    return F.window(ts, size, slide)


def session(ts: str | Column, gap: str | Column) -> Column:
    """EventTimeSessionWindows (static gap) / DynamicEventTimeSessionWindows
    (gap as an expression — Spark session_window accepts a Column gap)."""
    return F.session_window(ts, gap)


def windowed_agg(
    df: DataFrame,
    window_col: Column,
    keys: list[str],
    aggs: list[Column],
    include_bounds: bool = True,
) -> DataFrame:
    """WindowedStream.aggregate (WindowedStream.java:689) / SQL group window
    agg: groupBy(window, keys).agg(...), exposing window_start/window_end."""
    out = df.groupBy(window_col.alias("window"), *keys).agg(*aggs)
    if include_bounds:
        out = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *[c for c in out.columns if c not in {"window", *keys}],
        )
    return out
