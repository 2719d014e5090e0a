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


_UNIT_MS = {
    "millisecond": 1, "milli": 1, "ms": 1,
    "second": 1000, "sec": 1000,
    "minute": 60_000, "min": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def _duration_ms(s: str) -> int | None:
    """'5 milliseconds' / '1 hour' / '0.005 seconds' → milliseconds, or None
    when the string is not a simple "<number> <unit>" duration (compound
    forms like '1 hour 30 minutes', or units this table doesn't know —
    Spark's window() parses those itself; review finding: raising here broke
    previously-working slide<=size callers)."""
    parts = s.strip().split()
    if len(parts) != 2:
        return None
    n, unit = parts
    unit = unit.lower()
    if unit != "ms" and unit.endswith("s"):  # plural; 'ms' must not strip to 'm'
        unit = unit[:-1]
    if unit not in _UNIT_MS:
        return None
    try:
        ms = int(round(float(n) * _UNIT_MS[unit]))
    except ValueError:
        return None
    # a sub-millisecond duration rounds to 0 here — treat it as unparseable
    # so Spark's own duration parser rejects it loudly instead of the
    # gap-pane branch building a zero-length window that NULLs every row
    return ms if ms > 0 else None


def hop(ts: str | Column, slide: str, size: str) -> Column:
    """SlidingEventTimeWindows — Flink arg order (time, slide, size).

    Flink additionally allows ``slide > size``: non-overlapping panes with
    GAPS between them (SlidingEventTimeWindows.assignWindows returns zero
    windows for in-gap elements; GroupWindowITCase.scala:357
    ``Slide over 5.milli every 10.milli``). Spark's ``window()`` rejects
    that shape, so the gap case builds the pane directly: epoch-aligned
    ``start = floor(ts / slide) * slide``, membership ``ts < start + size``,
    NULL for in-gap rows — callers (windowed_agg, the Table API) drop the
    NULL group, mirroring the assigner's zero-window behavior. Same
    plan shape as window(): a deterministic per-row expression, no shuffle
    of its own."""
    slide_ms, size_ms = _duration_ms(slide), _duration_ms(size)
    if slide_ms is None or size_ms is None or slide_ms <= size_ms:
        # unparseable-here durations pass through to Spark's own parser
        return F.window(ts, size, slide)
    tcol = F.col(ts) if isinstance(ts, str) else ts
    t = F.unix_millis(tcol)
    start = F.floor(t / F.lit(slide_ms)).cast("long") * F.lit(slide_ms)
    return F.when(
        t < start + F.lit(size_ms),
        F.struct(
            F.timestamp_millis(start).alias("start"),
            F.timestamp_millis(start + F.lit(size_ms)).alias("end"),
        ),
    )


def session(ts: str | Column, gap: str | Column) -> Column:
    """EventTimeSessionWindows (static gap) / DynamicEventTimeSessionWindows
    (gap as an expression — Spark session_window accepts a Column gap).
    A Column gap must be CalendarIntervalType: build it with
    ``F.make_interval(...)`` (an ``INTERVAL n MINUTE`` literal is
    DayTimeIntervalType and is rejected)."""
    return F.session_window(ts, gap)


def windowed_agg(
    df: DataFrame,
    window_col: Column,
    keys: list[str],
    aggs: list[Column],
    include_bounds: bool = True,
) -> DataFrame:
    """WindowedStream.aggregate (WindowedStream.java:689) / SQL group window
    agg: groupBy(window, keys).agg(...), exposing window_start/window_end.
    Rows assigned to NO window (NULL rowtime, or the gap of a slide>size
    hop) are dropped — the assigner's zero-window contract (the NULL group
    is removed after the aggregate; window() may not appear in a filter)."""
    out = (
        df.groupBy(window_col.alias("window"), *keys)
        .agg(*aggs)
        .filter(F.col("window").isNotNull())
    )
    if include_bounds:
        out = out.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            *[c for c in out.columns if c not in {"window", *keys}],
        )
    return out


def session_dynamic_gap(ts: str | Column, gap_expr: Column) -> Column:
    """DynamicEventTimeSessionWindows (assigners/DynamicEventTimeSessionWindows
    .java) — per-element gap from an expression; SURVEY.md §7 flags this as a
    hard part, but Spark ≥3.2 session_window accepts a Column gap directly.
    Named alias of ``session`` (same expression, same CalendarIntervalType
    caveat) kept for reference-API discoverability."""
    return session(ts, gap_expr)


def count_window(df: DataFrame, keys: list[str], order_by: list[str | Column], size: int) -> DataFrame:
    """countWindow(size) (KeyedStream.countWindow) — batch form: rows per key
    are numbered in ``order_by`` order and bucketed into windows of ``size``
    rows; adds a ``count_window`` column (0-based window index per key).

    Streaming form: a count-trigger is a custom stateful operator in Spark
    (applyInPandasWithState holding a per-key counter) — the batch form here
    is the oracle-checkable shape."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(*order_by)
    return df.withColumn(
        "count_window", ((F.row_number().over(w) - 1) / size).cast("long")
    )


def evicted_window_agg(
    df: DataFrame,
    keys: list[str],
    ts: str,
    size: str,
    value: str,
    keep_last_n: int | None = None,
    keep_last_seconds: int | None = None,
) -> DataFrame:
    """Evictors (flink-streaming-java/.../windowing/evictors/: CountEvictor,
    TimeEvictor), batch form: a tumbling window collects its elements in
    event order, the evictor drops all but the retained suffix BEFORE the
    aggregate — CountEvictor keeps the last ``keep_last_n`` elements,
    TimeEvictor keeps those within ``keep_last_seconds`` of the window's
    newest element. Aggregate = sum + count of the survivors.

    Implementation: windowed collect_list of (ts, value) structs sorted by
    time (array_sort on the struct order), then slice / filter JVM-side —
    the eviction is an array expression, no UDF. State per (key, window) is
    the window's element list, same as the reference's evicting window
    state."""
    if (keep_last_n is None) == (keep_last_seconds is None):
        raise ValueError("exactly one of keep_last_n / keep_last_seconds")
    if keep_last_n is not None and keep_last_n < 0:
        raise ValueError(f"keep_last_n must be >= 0, got {keep_last_n}")
    if keep_last_seconds is not None and keep_last_seconds < 0:
        # symmetric with keep_last_n: a negative horizon would silently
        # evict everything instead of failing fast (review finding)
        raise ValueError(f"keep_last_seconds must be >= 0, got {keep_last_seconds}")
    w = tumble(ts, size)
    collected = df.groupBy(*keys, w.alias("w")).agg(
        F.array_sort(F.collect_list(F.struct(F.col(ts).alias("t"), F.col(value).alias("v")))).alias("elems")
    )
    if keep_last_n is not None:
        if keep_last_n == 0:
            # F.slice start of -0 is 0, which Spark rejects — CountEvictor(0)
            # keeps nothing (parity with streaming/evictors.py)
            kept = F.slice("elems", 1, 0)
        else:
            kept = F.when(
                F.size("elems") > keep_last_n,
                F.slice("elems", -keep_last_n, keep_last_n),
            ).otherwise(F.col("elems"))
    else:
        newest = F.element_at(F.col("elems"), -1)["t"]
        horizon = newest - F.expr(f"INTERVAL {keep_last_seconds} SECONDS")
        # strict >: the reference TimeEvictor evicts timestamp <= cutoff
        # (TimeEvictor.java:32 keeps strictly newer elements)
        kept = F.filter("elems", lambda e: e["t"] > horizon)
    return collected.select(
        *keys,
        F.col("w.start").alias("w_start"),
        F.size(kept).alias("n_kept"),
        F.round(F.aggregate(kept, F.lit(0.0), lambda acc, e: acc + e["v"]), 2).alias("sum_kept"),
    )
