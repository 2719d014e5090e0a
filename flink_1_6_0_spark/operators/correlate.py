"""UNNEST and UDTF correlate (lateral join) — SURVEY.md §2.9 UNNEST, §2.10 TableFunction.

Reference: LogicalUnnestRule (FlinkRuleSets.scala:120) for UNNEST of arrays/
multisets; TableFunction (functions/TableFunction.scala:82) applied via
``joinLateral`` / SQL ``LATERAL TABLE(f(x))``, planned as DataStreamCorrelate
(plan/nodes/datastream/DataStreamCorrelate.scala:38).

Spark mapping: a UDTF is a function column producing array<struct<...>>;
CROSS correlate = explode, LEFT OUTER correlate = explode_outer. This keeps
the whole correlate inside whole-stage codegen when the producing expression
is built-in; a python UDTF pays one Arrow hop for the array column only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def unnest(df: DataFrame, array_col: str | Column, alias: str = "elem", keep: list[str] | None = None, outer: bool = False) -> DataFrame:
    """UNNEST(array) — one output row per element."""
    c = F.col(array_col) if isinstance(array_col, str) else array_col
    ex = F.explode_outer(c) if outer else F.explode(c)
    cols = [F.col(k) for k in (keep or df.columns)]
    return df.select(*cols, ex.alias(alias))


def unnest_with_ordinality(df: DataFrame, array_col: str | Column, alias: str = "elem", pos_alias: str = "pos", keep: list[str] | None = None) -> DataFrame:
    """UNNEST WITH ORDINALITY (1-based position, matching Flink/SQL arrays)."""
    c = F.col(array_col) if isinstance(array_col, str) else array_col
    cols = [F.col(k) for k in (keep or df.columns)]
    out = df.select(*cols, F.posexplode(c).alias(pos_alias, alias))
    return out.withColumn(pos_alias, F.col(pos_alias) + 1)


def join_lateral(df: DataFrame, udtf_col: Column, aliases: list[str], keep: list[str] | None = None, outer: bool = False) -> DataFrame:
    """joinLateral / LATERAL TABLE(f(x)) (table.scala; DataStreamCorrelate.scala:38).

    ``udtf_col`` must evaluate to array<struct<...>> — the TableFunction's
    collected rows. CROSS drops rows whose array is empty/null; LEFT OUTER
    (``outer=True``) keeps them with null fields, exactly Flink's semantics.
    """
    cols = [F.col(k) for k in (keep or df.columns)]
    ex = F.explode_outer(udtf_col) if outer else F.explode(udtf_col)
    out = df.select(*cols, ex.alias("__t"))
    return out.select(*[F.col(k) for k in (keep or df.columns)], *[F.col(f"__t.{a}").alias(a) for a in aliases])
