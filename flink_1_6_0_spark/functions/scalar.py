"""Flink-compatible scalar functions — SURVEY.md §2.9.

Reference: the SQL operator table in flink-table/.../validate/
FunctionCatalog.scala:295-461, runtime impls in runtime/functions/
ScalarFunctions.scala:31-185 and codegen/calls/BuiltInMethods.scala.

Nearly everything is a built-in pyspark.sql.functions call; this module pins
the handful of Flink-semantics differences:

- DIVIDE_INTEGER — Flink's integer `/` truncates (BuiltInMethods DIV);
  Spark's `/` on ints returns double.
- DATE_FORMAT — Flink uses MySQL patterns (%Y-%m-%d, DateFormatCallGen);
  Spark uses java.time patterns — translated here.
- ITEM — Flink array access is 1-based (like Spark element_at; NOT like
  getItem which is 0-based).
- ELEMENT — unwrap of a known-single-element array.
- SIMILAR TO — SQL regex (anchored, % and _ wildcards on top of POSIX).
- OVERLAPS — period intersection predicate.
- COT — absent in Spark; 1/tan.

Everything stays a Column expression — JVM-side, inside whole-stage codegen;
no python UDFs anywhere in this module.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


# -- arithmetic -------------------------------------------------------------


def divide_integer(a: str | Column, b: str | Column) -> Column:
    """Flink integer division: 7/2 = 3 (truncating toward zero, like Java —
    BuiltInMethods.DIV). Spark's `/` on integers returns double, so this uses
    exact decimal arithmetic: (a - a % b) / b with % truncation semantics
    matching Java's."""
    a, b = _c(a).cast("decimal(38,0)"), _c(b).cast("decimal(38,0)")
    return ((a - (a % b)) / b).cast("long")


def cot(col: str | Column) -> Column:
    """COT (FunctionCatalog.scala:330) — Spark lacks it; 1/tan."""
    return F.lit(1.0) / F.tan(_c(col))


def log_base(base, col: str | Column) -> Column:
    """LOG(b, x) (FunctionCatalog.scala:381)."""
    return F.log(base, _c(col))


# -- string -----------------------------------------------------------------


def position(substr: str | Column, s: str | Column) -> Column:
    """POSITION(sub IN str) — 1-based, 0 if absent (FunctionCatalog.scala:395)."""
    sub = F.lit(substr) if isinstance(substr, str) else substr
    return F.position(sub, _c(s))


def similar_to(col: str | Column, pattern: str) -> Column:
    """SIMILAR TO (FunctionCatalog.scala:341) — SQL regex: implicitly anchored,
    '%'/'_' wildcards, POSIX classes allowed. Translated to rlike."""
    rx = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "%":
            rx.append(".*")
        elif ch == "_":
            rx.append(".")
        elif ch == "\\" and i + 1 < len(pattern):
            rx.append(re.escape(pattern[i + 1]))
            i += 1
        elif ch in ".^$":
            # literal in SQL SIMILAR TO, special in Java regex — escape
            # (Calcite's SIMILAR TO translation does the same)
            rx.append(re.escape(ch))
        else:
            rx.append(ch)
        i += 1
    return _c(col).rlike("^" + "".join(rx) + "$")


# -- temporal ---------------------------------------------------------------

# MySQL pattern token → java.time pattern (DateFormatCallGen translation)
_MYSQL_TO_JAVA = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%c": "M",
    "%d": "dd",
    "%e": "d",
    "%H": "HH",
    "%k": "H",
    "%h": "hh",
    "%i": "mm",
    "%s": "ss",
    "%S": "ss",
    "%f": "SSSSSS",
    "%M": "MMMM",
    "%b": "MMM",
    "%W": "EEEE",
    "%a": "EEE",
    "%j": "DDD",
    "%T": "HH:mm:ss",
    "%p": "a",
}


def mysql_to_java_pattern(fmt: str) -> str:
    """Translate a MySQL DATE_FORMAT pattern to a java.time pattern."""
    out = []
    i = 0
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i : i + 2]
            if tok == "%%":
                out.append("%")
            elif tok in _MYSQL_TO_JAVA:
                out.append(_MYSQL_TO_JAVA[tok])
            else:
                raise ValueError(f"unsupported MySQL pattern token {tok!r}")
            i += 2
        else:
            # literal RUN quoted as one unit: per-char quoting would render
            # adjacent literals as 'h''o''u''r''s', which java.time reads as
            # h'o'u'r's ('' inside a quoted run is an ESCAPED quote)
            j = i
            while j < len(fmt) and fmt[j] != "%":
                j += 1
            run = fmt[i:j]
            if any(c.isalpha() for c in run) or "'" in run:
                out.append("'" + run.replace("'", "''") + "'")
            else:
                out.append(run)
            i = j
    return "".join(out)


def date_format(col: str | Column, mysql_fmt: str) -> Column:
    """Flink DATE_FORMAT(ts, '%Y-%m-%d') with MySQL patterns
    (DateFormatCallGen.scala) → Spark date_format with a java pattern."""
    return F.date_format(_c(col), mysql_to_java_pattern(mysql_fmt))


def timestamp_add(unit: str, n, ts: str | Column) -> Column:
    """TIMESTAMPADD (FunctionCatalog.scala:428)."""
    return F.timestamp_add(unit.upper(), F.lit(n) if isinstance(n, int) else n, _c(ts))


def overlaps(s1: str | Column, e1: str | Column, s2: str | Column, e2: str | Column) -> Column:
    """(s1, e1) OVERLAPS (s2, e2) (FunctionCatalog.scala:431) — true when the
    periods share any instant (closed-interval comparison, SQL standard).

    Each period is normalized first (Calcite's convertOverlaps sorts the
    endpoints so s <= e before comparing) — reversed-endpoint periods give
    the same answer as their sorted form."""
    lo1, hi1 = F.least(_c(s1), _c(e1)), F.greatest(_c(s1), _c(e1))
    lo2, hi2 = F.least(_c(s2), _c(e2)), F.greatest(_c(s2), _c(e2))
    return (lo1 <= hi2) & (lo2 <= hi1)


# -- collection -------------------------------------------------------------


def item(arr: str | Column, idx) -> Column:
    """ITEM / a[i] — 1-based array access (FunctionCatalog.scala:364;
    Flink arrays index from 1 like SQL; element_at matches)."""
    return F.element_at(_c(arr), idx)


def element(arr: str | Column) -> Column:
    """ELEMENT(arr) — unwrap a single-element array; NULL for empty, and (by
    documented divergence from Flink's runtime error) NULL for size > 1."""
    a = _c(arr)
    return F.when(F.size(a) == 1, F.element_at(a, 1))


def cardinality(col: str | Column) -> Column:
    """CARDINALITY of array/map (FunctionCatalog.scala:367)."""
    return F.size(_c(col))
