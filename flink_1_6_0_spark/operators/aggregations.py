"""Aggregation operators — SURVEY.md §2.4.

Reference: DataSet.java:339-638 (groupBy/aggregate/reduce/minBy/maxBy/first/
distinct), DataSetAggregate.scala:40 + AggregateUtil.scala (partial+final agg),
functions/aggfunctions/ (SUM/SUM0/AVG/COUNT/MIN/MAX/COLLECT/STDDEV/VAR).
Spark's HashAggregateExec already does map-side partial aggregation — the
DataSetPreAggFunction/DataSetFinalAggFunction split is free.

This module adds the Flink-specific shapes:
- COLLECT → multiset (Flink returns Map<elem, count>; we expose both a
  map-typed and a deterministic sorted-array form)
- SUM0 (null-safe sum returning 0 for empty groups)
- minBy/maxBy row-selection semantics
- an applyInPandas-based UDAF runner matching the AggregateFunction contract
  (create/accumulate/merge/getValue, AggregateFunction.scala:97)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def collect_multiset(col: str | Column) -> Column:
    """SQL COLLECT → multiset, i.e. Map<element, count>.

    Reference: CollectAggFunction.scala (MULTISET, MultisetTypeInfo maps to
    Map<E, Integer> — SURVEY.md §1.2). Implemented JVM-side: histogram via
    aggregate over collect_list would shuffle rows; instead callers should
    pre-aggregate counts. This expression form builds the map from a
    collect_list in one pass for moderate group sizes.
    """
    c = F.col(col) if isinstance(col, str) else col
    lst = F.collect_list(c)
    return F.map_from_arrays(
        F.array_distinct(lst),
        F.transform(F.array_distinct(lst), lambda x: F.size(F.filter(lst, lambda y: y == x))),
    )


def collect_multiset_sorted(col: str | Column) -> Column:
    """Deterministic multiset rendering: sorted array of 'value:count' strings
    (stable across engines — used by the oracle-checked queries)."""
    c = F.col(col) if isinstance(col, str) else col
    lst = F.collect_list(c.cast("string"))
    return F.array_sort(
        F.transform(
            F.array_distinct(lst),
            lambda x: F.concat_ws(":", x, F.size(F.filter(lst, lambda y: y == x)).cast("string")),
        )
    )


def sum0(col: str | Column) -> Column:
    """SUM0 — like SUM but 0 (not NULL) when all inputs are null/absent.
    Reference: Sum0AggFunction in functions/aggfunctions/."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.sum(c), F.lit(0))


def min_by(
    value: str | Column,
    ordering: str | Column,
    tie: Column | None = None,
    tie_asc: bool = True,
) -> Column:
    """minBy (DataSet.java:523) — value of ``value`` on the row minimizing
    ``ordering``. Flink's contract on ties is "the first encountered" —
    order-dependent and irreproducible under parallelism; pass ``tie`` (a
    secondary ordering column, compared after ``ordering`` via a struct)
    for a DETERMINISTIC refinement. Found by the r14 x10 gate: the 10x
    synthetic tier duplicates every extendedprice, so the untied form
    returned partition-order-dependent orderkeys.

    ``tie`` is always given in ASCENDING sense by default — smallest tie
    value wins — regardless of whether the struct is minimized or
    maximized (r14 ADVICE: max_by silently required callers to remember to
    negate; now both helpers negate internally as needed). Pass
    ``tie_asc=False`` for largest-tie-wins.

    CONSTRAINT: the tie column must be NUMERIC whenever the internal
    negation fires (max_by with tie_asc=True, min_by with tie_asc=False)
    — Spark's unary minus on a string casts to double and yields NULL,
    which would silently restore the nondeterminism ``tie`` exists to
    remove. Non-numeric ties are only valid in the direction that needs
    no negation — ENFORCED (r15 ADVICE): the negated branch raises at
    execution time if negation nulled a non-null tie (see
    :func:`_checked_neg`) instead of silently degrading."""
    if tie is not None:
        o = F.col(ordering) if isinstance(ordering, str) else ordering
        # min_by minimizes the struct: ascending tie = the raw column.
        return F.min_by(value, F.struct(o, tie if tie_asc else _checked_neg(tie)))
    return F.min_by(value, ordering)


def _checked_neg(tie: Column) -> Column:
    """``-tie`` that is LOUD about the documented numeric-tie constraint:
    a bare Column carries no dataType to validate eagerly, so enforce at
    execution time — if negation yields NULL while the input was non-null
    (exactly what ``-string`` does under non-ANSI casting), raise instead
    of silently restoring partition-order nondeterminism (r15 ADVICE).
    ``raise_error``'s NullType coerces into the struct field type, so the
    happy path's plan is unchanged beyond one null check per row."""
    neg = -tie
    return F.when(
        tie.isNotNull() & neg.isNull(),
        F.raise_error(
            F.lit(
                "min_by/max_by: tie column must be NUMERIC when the "
                "internal negation fires (tie_asc direction needs -tie); "
                "got a value unary minus cannot negate"
            )
        ),
    ).otherwise(neg)


def max_by(
    value: str | Column,
    ordering: str | Column,
    tie: Column | None = None,
    tie_asc: bool = True,
) -> Column:
    """maxBy (DataSet.java:559). ``tie``/``tie_asc`` as in :func:`min_by` —
    ascending tie sense by default; the struct is MAXIMIZED, so the
    ascending form negates the tie column internally."""
    if tie is not None:
        o = F.col(ordering) if isinstance(ordering, str) else ordering
        return F.max_by(value, F.struct(o, _checked_neg(tie) if tie_asc else tie))
    return F.max_by(value, ordering)


def distinct(df: DataFrame, *cols: str) -> DataFrame:
    """DataSet.distinct by fields or all (DataSet.java:596-638).

    Accepts Flink field EXPRESSIONS, including dotted nested paths like
    ``"nestedPojo.longNumber"`` (ExpressionKeys; DistinctITCase.java:208) —
    dropDuplicates only resolves top-level names, so nested keys are
    projected to hidden columns for the dedup and dropped afterwards."""
    if not cols:
        return df.distinct()
    top = set(df.columns)
    plain = [c for c in cols if c in top]
    nested = [c for c in cols if c not in top]
    if not nested:
        return df.dropDuplicates(plain)
    hidden = {c: f"__dk{i}" for i, c in enumerate(nested)}
    out = df
    for c, h in hidden.items():
        out = out.withColumn(h, F.col(c))
    return out.dropDuplicates(plain + list(hidden.values())).drop(*hidden.values())


def combine_group(df: DataFrame, keys: list[str], fn, schema) -> DataFrame:
    """GroupCombineFunction — DataSet.combineGroup (GroupCombineOperator.java,
    DataSet.java:678): a PARTIAL group reduce with NO shuffle and no
    completeness guarantee. ``fn(pdf) -> pdf`` runs over each key's rows
    *within an input partition/batch*; rows of one key may be combined in
    several independent calls (exactly Flink's contract — a combiner may run
    on any subset of a group, and the caller must still apply the final
    reduce after a groupBy). Spark mapping: ``mapInPandas`` so the partial
    stays map-side, mirroring the reference's chained combine driver.

    At scale this is the explicit form of what Catalyst's partial aggregate
    does for built-in aggs: shrink data BEFORE the exchange. Use it when the
    final reduce is a custom grouped-apply whose input would otherwise
    shuffle raw rows.
    """

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if keys:
                # dropna=False: Spark's groupBy keeps the NULL-key group, so
                # the partial combine must too (review finding: pandas'
                # dropna default silently discarded NULL-key rows)
                for _, g in pdf.groupby(keys, sort=False, dropna=False):
                    yield fn(g)
            else:
                yield fn(pdf)

    return df.mapInPandas(run, schema=schema)


def apply_udaf(df: DataFrame, group_cols: list[str], fn, schema) -> DataFrame:
    """AggregateFunction (UDAF) contract via grouped-map pandas.

    Reference: AggregateFunction.scala:97 — createAccumulator/accumulate/
    getValue. ``fn(key, pdf) -> pdf`` receives the whole group Arrow-batched;
    retract() is unnecessary in batch (only update-mode streaming needs it —
    see streaming.group_agg).
    """
    return df.groupBy(*group_cols).applyInPandas(fn, schema=schema)
