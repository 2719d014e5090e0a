"""Stream-stream interval join — SURVEY.md §2.3 time-bounded join row.

Reference: TimeBoundedStreamJoin (flink-table/.../runtime/join/
TimeBoundedStreamJoin.scala:55) / IntervalJoinOperator.java:89 — both sides
buffered in keyed MapState, rows expired by timers once the other side's
time passes the bound.

Spark: the identical construct is built in — a stream-stream join whose
condition carries an equi-key plus a time-range predicate; watermarks on both
sides let the state store evict exactly like the reference's timers. Outer
variants additionally require the watermark so null-padding can finalize
(Flink's NonWindowOuterJoin allows unbounded state instead — we adopt the
bounded-state discipline and document the constraint, SURVEY.md §7 hard
parts).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_delay: str = "0 seconds",
    right_delay: str = "0 seconds",
    how: str = "inner",
    lower_exclusive: bool = False,
    upper_exclusive: bool = False,
) -> DataFrame:
    """right.ts ∈ [left.ts - lower, left.ts + upper], watermarked both sides.

    Bounds are inclusive by default and flip strict with
    ``lower_exclusive``/``upper_exclusive`` (IntervalJoined
    .lowerBoundExclusive/.upperBoundExclusive, KeyedStream.java:478,488);
    None bounds are rejected loudly (IntervalJoinITCase.java:254,269).

    State growth is bounded by (watermark delay + interval width) per key —
    the same bound TimeBoundedStreamJoin enforces with its cleanup timers.
    """
    if lower is None or upper is None:
        raise ValueError("stream_interval_join requires BOTH bounds (between(lower, upper))")
    lw = left.withWatermark(left_ts, left_delay)
    rw = right.withWatermark(right_ts, right_delay)
    cond = None
    for lk, rk in keys:
        c = lw[lk] == rw[rk]
        cond = c if cond is None else (cond & c)
    lo_bound = lw[left_ts] - F.expr(f"INTERVAL {lower}")
    hi_bound = lw[left_ts] + F.expr(f"INTERVAL {upper}")
    lo = rw[right_ts] > lo_bound if lower_exclusive else rw[right_ts] >= lo_bound
    hi = rw[right_ts] < hi_bound if upper_exclusive else rw[right_ts] <= hi_bound
    rng = lo & hi
    cond = rng if cond is None else (cond & rng)
    return lw.join(rw, cond, how)
