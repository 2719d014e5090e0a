"""Continuous (non-windowed) streaming aggregation — SURVEY.md §2.4 stream row.

Reference: GroupAggProcessFunction (flink-table/.../runtime/aggregate/
GroupAggProcessFunction.scala:39) — accumulators in ValueState, a retract +
new row emitted per update, idle state dropped after
StreamQueryConfig.withIdleStateRetentionTime (api/queryConfig.scala:72).

Spark: streaming groupBy().agg() in `update` mode is exactly this operator —
the state store holds the accumulators, each micro-batch emits changed rows
(the "new" half of Flink's retract+new pair; sinks that need the retract half
use foreachBatch merge, see plans.retraction). State TTL: Spark evicts
aggregation state by watermark, so idle-state retention maps to declaring a
rowtime + watermark on the grouping scope; without one, state is unbounded —
same as Flink with retention disabled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def continuous_group_agg(stream: DataFrame, keys: list[str | Column], aggs: list[Column]) -> DataFrame:
    """groupBy(keys).agg(aggs) intended for `update`-mode emission.

    The returned frame is sink-agnostic; pair with
    plans.retraction.infer_output_mode to pick append/update/complete per
    sink capability (the AccMode/retraction-deco phase analog).
    """
    return stream.groupBy(*keys).agg(*aggs)


def distinct_agg(
    stream: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    agg_alias: str = "n_distinct",
    idle_state_retention: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Streaming DISTINCT aggregate (DistinctAccumulator.scala — Flink keeps
    a per-key distinct map inside the accumulator; idle entries are dropped
    after StreamQueryConfig.withIdleStateRetentionTime, queryConfig.scala:72).

    Spark forbids count(DISTINCT) on streams, so the operator is the
    two-stage form with identical semantics: stateful dropDuplicates on the
    (group, value) pair — the distinct map, externalized to the state store —
    then an ordinary streaming count per group.

    State bound:

    - ``idle_state_retention=None``: one state entry per live (key, value),
      forever — Flink with retention disabled.
    - ``idle_state_retention='1 hour'`` (requires ``ts_col``): a watermark at
      that delay scopes ``dropDuplicatesWithinWatermark``, so a (key, value)
      pair unseen for the retention period is EVICTED from state — and, as
      the reference documents for expired idle state, a later reappearance
      is counted again (the idle-cleanup caveat in queryConfig.scala's own
      docs). The downstream count must then be read per-epoch rather than
      as an exact all-time distinct.
    """
    from pyspark.sql import functions as F

    proj = [*group_cols, distinct_col] + ([ts_col] if ts_col and idle_state_retention else [])
    ev = stream.select(*proj)
    if idle_state_retention:
        if not ts_col:
            raise ValueError("idle_state_retention requires ts_col (the rowtime column)")
        distinct = ev.withWatermark(ts_col, idle_state_retention).dropDuplicatesWithinWatermark(
            [*group_cols, distinct_col]
        )
    else:
        distinct = ev.dropDuplicates([*group_cols, distinct_col])
    return distinct.groupBy(*group_cols).agg(F.count("*").alias(agg_alias))
