"""Set operations — SURVEY.md §2.8.

Reference: table.scala:561-692 (minus/minusAll/union/unionAll/intersect/
intersectAll), DataSetUnion.scala / DataSetIntersect.scala:37 /
DataSetMinus.scala:37 (coGroup-based implementations). Spark implements all
six natively (union/distinct, intersect/intersectAll, except/exceptAll) —
these wrappers only pin the Flink names and semantics (column-by-position,
same arity/types, like Flink's requirement of identical field types).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """unionAll (table.scala:628) — bag union; stream union is multi-way."""
    return reduce(DataFrame.union, dfs)


def union(*dfs: DataFrame) -> DataFrame:
    """union (table.scala:608) — set union (dedup), batch only in the reference."""
    return union_all(*dfs).distinct()


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    """intersect (table.scala:650) — distinct rows present in both."""
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """intersectAll (table.scala:673) — multiset intersection (min multiplicity)."""
    return a.intersectAll(b)


def minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """minus / EXCEPT (table.scala:561)."""
    return a.subtract(b)


def minus_all(a: DataFrame, b: DataFrame) -> DataFrame:
    """minusAll / EXCEPT ALL (table.scala:586) — multiplicity max(n-m, 0)."""
    return a.exceptAll(b)
