"""Table API fluent façade — SURVEY.md §3.2 / §2.2.

Reference: flink-table/.../api/table.scala (1182 LoC) — the fluent relational
API (select :116, as :168, filter :224, where :253, groupBy :330, distinct
:361, join :390-470, leftOuterJoin :497, minus :561, union :608, intersect
:650, orderBy :692, offset :777, fetch :798, window :861, joinLateral) whose
calls build a LogicalNode tree that Calcite optimizes.

Here each call delegates straight to the DataFrame API — the same shape
(unresolved logical plan built fluently, optimized lazily by Catalyst), so
the façade is thin by design; its value is 1:1 name/semantics parity for a
reference user, including Flink's string-expression forms:

    t.select("a, b, a + b as s").where("a > 5").group_by("b").agg("count(a) as n")

String expressions parse through Spark SQL's expression parser (selectExpr /
F.expr), which accepts the Flink expression grammar's SQL-ish core.
"""

from __future__ import annotations

import re as _re
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_6_0_spark.operators.windows import session as _session
from flink_1_6_0_spark.operators.windows import tumble as _tumble
from flink_1_6_0_spark.operators.windows import hop as _hop


# case-insensitive trailing "AS alias" (alias = plain identifier, so an AS
# inside a trailing string literal or cast never matches)
_AS_ALIAS = _re.compile(r"^(.*\S)\s+as\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", _re.IGNORECASE | _re.DOTALL)


def _split_exprs(exprs: str) -> list[str]:
    """Top-level comma split, paren- AND quote-aware: a comma or paren inside
    a single-quoted literal is data ('' escapes toggle twice, netting out)."""
    out, depth, cur, in_q = [], 0, [], False
    for ch in exprs:
        if ch == "'":
            in_q = not in_q
        elif not in_q:
            depth += ch in "(["
            depth -= ch in ")]"
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


class Table:
    """Fluent wrapper; ``.df`` exposes the underlying DataFrame at any point."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- projection / filter (table.scala:116,224,253,168) -----------------
    def select(self, *fields: str | Column) -> "Table":
        if len(fields) == 1 and isinstance(fields[0], str) and "," in fields[0]:
            return Table(self.df.selectExpr(*_split_exprs(fields[0])))
        return Table(self.df.selectExpr(*fields) if all(isinstance(f, str) for f in fields) else self.df.select(*fields))

    def filter(self, predicate: str | Column) -> "Table":
        return Table(self.df.filter(predicate))

    where = filter

    def as_(self, *names: str) -> "Table":
        return Table(self.df.toDF(*names))

    def add_columns(self, exprs: str) -> "Table":
        out = self.df
        for e in _split_exprs(exprs):
            m = _AS_ALIAS.match(e)
            # the alias split must be TOP-level: a match whose expression side
            # has unbalanced parens (e.g. the AS inside "CAST(x AS INT)") is
            # not an alias
            if m and m.group(1).count("(") == m.group(1).count(")"):
                out = out.withColumn(m.group(2), F.expr(m.group(1)))
            else:
                out = out.withColumn(e, F.expr(e))
        return Table(out)

    def rename_columns(self, mapping: dict[str, str]) -> "Table":
        out = self.df
        for old, new in mapping.items():
            out = out.withColumnRenamed(old, new)
        return Table(out)

    def drop_columns(self, *cols: str) -> "Table":
        return Table(self.df.drop(*cols))

    # -- aggregation (table.scala:330,361) ----------------------------------
    def group_by(self, *fields: str) -> "GroupedTable":
        return GroupedTable(self.df, list(fields))

    def distinct(self) -> "Table":
        return Table(self.df.distinct())

    # -- joins (table.scala:390-555) ----------------------------------------
    def join(self, right: "Table", condition: str | Column | None = None, how: str = "inner") -> "Table":
        cond = F.expr(condition) if isinstance(condition, str) else condition
        return Table(self.df.join(right.df, cond, how) if cond is not None else self.df.crossJoin(right.df))

    def left_outer_join(self, right: "Table", condition: str | Column) -> "Table":
        return self.join(right, condition, "left")

    def right_outer_join(self, right: "Table", condition: str | Column) -> "Table":
        return self.join(right, condition, "right")

    def full_outer_join(self, right: "Table", condition: str | Column) -> "Table":
        return self.join(right, condition, "full")

    def join_lateral(self, udtf_col: Column, aliases: list[str], outer: bool = False) -> "Table":
        from flink_1_6_0_spark.operators.correlate import join_lateral

        return Table(join_lateral(self.df, udtf_col, aliases, outer=outer))

    # -- set ops (table.scala:561-692) ---------------------------------------
    def union(self, other: "Table") -> "Table":
        return Table(self.df.union(other.df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return Table(self.df.union(other.df))

    def intersect(self, other: "Table") -> "Table":
        return Table(self.df.intersect(other.df))

    def intersect_all(self, other: "Table") -> "Table":
        return Table(self.df.intersectAll(other.df))

    def minus(self, other: "Table") -> "Table":
        return Table(self.df.subtract(other.df))

    def minus_all(self, other: "Table") -> "Table":
        return Table(self.df.exceptAll(other.df))

    # -- sort / fetch (table.scala:692,777,798) -------------------------------
    def order_by(self, *fields: str | Column) -> "Table":
        def _dir(f):
            if isinstance(f, str):
                if f.endswith(".desc"):
                    return F.expr(f[: -len(".desc")]).desc()
                if f.endswith(".asc"):  # Flink's explicit-ascending spelling
                    return F.expr(f[: -len(".asc")]).asc()
            return f

        return Table(self.df.orderBy(*[_dir(f) for f in fields]))

    def offset(self, n: int) -> "Table":
        return Table(self.df.offset(n))

    def limit(self, offset: int, fetch: int | None = None) -> "Table":
        """table.scala limit(offset[, fetch]) — the deprecated-in-1.6 alias
        of offset/fetch; kept for surface parity."""
        out = self.offset(offset)
        return out.fetch(fetch) if fetch is not None else out

    def fetch(self, n: int) -> "Table":
        return Table(self.df.limit(n))

    # -- group windows (api/windows.scala:162,397) ----------------------------
    def window_tumble(self, ts: str, size: str, alias: str = "w") -> "GroupedTable":
        return GroupedTable(self.df, [], window_col=_tumble(ts, size).alias(alias), window_alias=alias)

    def window_hop(self, ts: str, slide: str, size: str, alias: str = "w") -> "GroupedTable":
        return GroupedTable(self.df, [], window_col=_hop(ts, slide, size).alias(alias), window_alias=alias)

    def window_session(self, ts: str, gap: str, alias: str = "w") -> "GroupedTable":
        return GroupedTable(self.df, [], window_col=_session(ts, gap).alias(alias), window_alias=alias)

    # -- OVER windows (api/windows.scala Over:397; §2.6) ----------------------
    def window_over(
        self,
        partition_by: list[str],
        order_by: list[str],
        preceding_rows: int | None = None,
        preceding_range_seconds: int | None = None,
    ) -> "OverWindowedTable":
        """Over.partitionBy(...).orderBy(...).preceding(...) — unbounded when
        neither bound is given; ROWS with ``preceding_rows``; RANGE (ordered
        by an epoch-seconds column) with ``preceding_range_seconds``."""
        from flink_1_6_0_spark.operators import over as _over

        if preceding_rows is not None:
            spec = _over.rows_bounded(partition_by, order_by, preceding_rows)
        elif preceding_range_seconds is not None:
            spec = _over.range_bounded_seconds(partition_by, order_by[0], preceding_range_seconds)
        else:
            spec = _over.rows_unbounded(partition_by, order_by)
        return OverWindowedTable(self.df, spec)

    # -- schema / sinks (table.scala getSchema/printSchema/insertInto/
    #    writeToSink) ---------------------------------------------------------
    def get_schema(self):
        """TableSchema accessor → the Spark StructType."""
        return self.df.schema

    def print_schema(self) -> None:
        self.df.printSchema()

    def insert_into(self, table_name: str) -> None:
        """table.scala insertInto: append into a registered sink table (the
        session catalog's saveAsTable plays the TableSink registry role)."""
        self.df.write.mode("append").saveAsTable(table_name)

    def write_to_sink(self, sink_fn) -> None:
        """table.scala writeToSink(TableSink): hand the frame to a sink
        callable (``sink_fn(df)`` configures/executes the write) — the
        DataStream facade's add_sink twin."""
        sink_fn(self.df)

    # -- terminal -------------------------------------------------------------
    def to_data_frame(self) -> DataFrame:
        return self.df

    def collect(self):
        """Eager materialization to the driver (DataSet.collect mirror).
        DEBUG-ONLY at scale: pulls every row into driver memory — never in a
        pipeline hot path; write to a sink or keep composing DataFrames."""
        return self.df.collect()

    def count(self) -> int:
        return self.df.count()


class GroupedTable:
    """groupBy(...) intermediate (table.scala GroupedTable / WindowGroupedTable)."""

    def __init__(self, df: DataFrame, keys: list[str], window_col: Column | None = None, window_alias: str = "w"):
        self._df = df
        self._keys = keys
        self._window_col = window_col
        self._window_alias = window_alias

    def group_by(self, *fields: str) -> "GroupedTable":
        return GroupedTable(self._df, list(fields), self._window_col, self._window_alias)

    def agg(self, *exprs: str | Column) -> Table:
        # same comma-list contract as Table.select: .agg('count(a) as n, sum(b) as s')
        cols = []
        for e in exprs:
            if isinstance(e, str):
                cols.extend(F.expr(x) for x in _split_exprs(e))
            else:
                cols.append(e)
        if self._window_col is not None:
            # rows the assigner gives NO window (NULL rowtime; the gap of a
            # slide>size hop) form a NULL group dropped after the aggregate,
            # matching Flink's zero-window case
            out = (
                self._df.groupBy(self._window_col, *self._keys)
                .agg(*cols)
                .filter(F.col(self._window_alias).isNotNull())
            )
            w = self._window_alias
            out = out.select(
                F.col(f"{w}.start").alias(f"{w}_start"),
                F.col(f"{w}.end").alias(f"{w}_end"),
                *[c for c in out.columns if c != w],
            )
            return Table(out)
        return Table(self._df.groupBy(*self._keys).agg(*cols))

    select = agg


class OverWindowedTable:
    """Table.window(Over...) analog: ``with_agg`` adds OVER-aggregate columns
    to every row (Flink 1.6 allows only aggregate functions in OVER —
    FunctionCatalog.scala:295-461; Spark's ranking functions also work here,
    exceeding the reference)."""

    def __init__(self, df: DataFrame, spec):
        self._df = df
        self._spec = spec

    def with_agg(self, **named_exprs: Column) -> Table:
        out = self._df
        for name, col in named_exprs.items():
            out = out.withColumn(name, col.over(self._spec))
        return Table(out)
