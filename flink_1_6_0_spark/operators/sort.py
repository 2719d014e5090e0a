"""Sort / limit / top-k operators — SURVEY.md §2.7.

Reference: DataSetSort.scala:36 (range-partition + per-partition sort, then
offset/fetch), table.scala:692/777/798 (orderBy/offset/fetch),
DataSet.java:1401 (sortPartition), DataSet.java:574 (first(n)). Spark's
orderBy already does the range-partition + Tungsten-sort plan; the external
merge sort machinery (UnilateralSortMerger.java:61) is Tungsten's job.

Scale note: a global ORDER BY at 100 TB is a range shuffle — fine when
followed by fetch (TakeOrderedAndProject collapses it to a top-k per
partition + driver merge of k·P rows). first_n per group is a single hash
shuffle + in-partition window, no global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def order_by_offset_fetch(df: DataFrame, cols: list[Column | str], offset: int = 0, fetch: int | None = None) -> DataFrame:
    """ORDER BY ... OFFSET ... FETCH (table.scala:692,777,798; batch-only in
    the reference — our streaming layer documents the same restriction)."""
    out = df.orderBy(*cols)
    if offset:
        out = out.offset(offset)
    if fetch is not None:
        out = out.limit(fetch)
    return out


def sort_partition(df: DataFrame, cols: list[Column | str]) -> DataFrame:
    """Per-partition sort (DataSet.java:1401) — no shuffle."""
    return df.sortWithinPartitions(*cols)


def first_n(df: DataFrame, n: int, partition_by: list[str] | None = None, order_by: list[Column | str] | None = None) -> DataFrame:
    """first(n) per group / global (DataSet.java:574).

    With ``partition_by``: top-n rows per group by ``order_by`` (deterministic
    only if order_by is a total order within groups — same caveat as the
    reference, which takes an arbitrary n without order).
    """
    if not partition_by:
        return df.orderBy(*(order_by or [])).limit(n) if order_by else df.limit(n)
    w = Window.partitionBy(*partition_by).orderBy(*(order_by or partition_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
