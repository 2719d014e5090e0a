"""OVER / analytic windows — SURVEY.md §2.6.

Reference: DataStreamOverAggregate.scala:45 with runtime classes
ProcTimeUnboundedOver / ProcTimeBoundedRowsOver:43 / ProcTimeBoundedRangeOver /
RowTimeUnboundedOver:254,295 / RowTimeBoundedRows/RangeOver. Flink 1.6 only
supports AGGREGATE functions over these frames (no RANK/ROW_NUMBER/LEAD/LAG —
absent from FunctionCatalog.scala:295-461); our batch engine exceeds that via
Spark's full window-function set (ranking lives in queries.windows tagged
'exceeds').

Builders return a WindowSpec; RANGE frames order by an epoch-seconds column
because Spark's rangeBetween needs a numeric ordering key.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec


def rows_unbounded(partition_by: list[str | Column], order_by: list[str | Column]) -> WindowSpec:
    """ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW (RowTimeUnboundedOver.scala:254)."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def rows_bounded(partition_by: list[str | Column], order_by: list[str | Column], preceding: int) -> WindowSpec:
    """ROWS BETWEEN n PRECEDING AND CURRENT ROW (ProcTime/RowTimeBoundedRowsOver)."""
    return Window.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(-preceding, Window.currentRow)


def range_bounded_seconds(partition_by: list[str | Column], epoch_order: str | Column, preceding_seconds: int) -> WindowSpec:
    """RANGE BETWEEN INTERVAL n PRECEDING AND CURRENT ROW over event time
    (RowTimeBoundedRangeOver.scala) — ordered by epoch seconds."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(epoch_order)
        .rangeBetween(-preceding_seconds, Window.currentRow)
    )


def range_unbounded(partition_by: list[str | Column], order_by: list[str | Column]) -> WindowSpec:
    """RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW (RowTimeUnboundedOver.scala:295) —
    peers (equal order keys) aggregate together, unlike the ROWS frame."""
    return (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
