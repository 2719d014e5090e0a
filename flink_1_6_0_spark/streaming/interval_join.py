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
) -> DataFrame:
    """right.ts ∈ [left.ts - lower, left.ts + upper], watermarked both sides.

    State growth is bounded by (watermark delay + interval width) per key —
    the same bound TimeBoundedStreamJoin enforces with its cleanup timers.
    """
    lw = left.withWatermark(left_ts, left_delay)
    rw = right.withWatermark(right_ts, right_delay)
    cond = None
    for lk, rk in keys:
        c = lw[lk] == rw[rk]
        cond = c if cond is None else (cond & c)
    rng = (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lower}")) & (
        rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}")
    )
    cond = rng if cond is None else (cond & rng)
    return lw.join(rw, cond, how)
