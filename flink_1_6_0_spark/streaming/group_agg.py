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
