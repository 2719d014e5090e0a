"""Join operators — SURVEY.md §2.3.

Spark's built-in join machinery (BroadcastHash/ShuffledHash/SortMerge/
BroadcastNestedLoop + AQE) subsumes the reference's MutableHashTable
(flink-runtime/.../operators/hash/MutableHashTable.java:87) and merge
iterators wholesale; what this module adds are the *API shapes* the reference
exposes that Spark does not name directly:

- single-row join (DataSetSingleRowJoin.scala:42) — broadcast of a 1-row side
- coGroup (DataSet.java:1009, CoGroupOperator.java) — grouped dual-input
- interval/time-bounded join (TimeBoundedStreamJoin.scala:55,
  KeyedStream.java:414 / IntervalJoinOperator.java:89)
- windowed join (JoinedStreams.java:126 — where/equalTo/window/apply)
- semi/anti joins (reference reaches them only via IN/EXISTS subquery rewrite,
  FlinkRuleSets.scala:36-38; Spark has first-class join types)

Scale notes: single-row joins always broadcast (never shuffle the big side);
interval joins join on coarse time-buckets first so the range predicate is an
equi-join + residual filter rather than a nested loop. coGroup uses
pandas cogroup only when handed an opaque fn — the relational fast path stays
JVM-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def single_row_join(df: DataFrame, single_row: DataFrame, condition: Column | None = None) -> DataFrame:
    """Join an arbitrarily large input with a known-single-row input.

    Reference: DataSetSingleRowJoin.scala:42 — the single row ships as a
    broadcast set; theta conditions allowed. Spark: broadcast nested-loop /
    broadcast hash join, which is exactly `crossJoin(broadcast(...))` plus an
    optional residual filter — the big side never shuffles.
    """
    out = df.crossJoin(F.broadcast(single_row))
    return out.filter(condition) if condition is not None else out


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """IN / EXISTS subquery semantics (SubQueryRemoveRule, FlinkRuleSets.scala:36-38)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT IN / NOT EXISTS subquery semantics."""
    return left.join(right, on, "left_anti")


def co_group(
    left: DataFrame,
    right: DataFrame,
    left_keys: list[str],
    right_keys: list[str],
    fn=None,
    schema=None,
    sort_first: list[tuple[str, bool]] | None = None,
    sort_second: list[tuple[str, bool]] | None = None,
) -> DataFrame:
    """coGroup: for each key, hand both groups to a function (DataSet.java:1009).

    With an opaque ``fn`` this uses pandas cogroup (Arrow-batched). When the
    logic is relational (the common case in the reference's own usage), prefer
    expressing it as aggregate + full outer join — see queries.relational for
    that fast path.

    ``sort_first`` / ``sort_second`` are ``[(column, ascending), ...]`` —
    CoGroupOperator.sortFirstGroup/sortSecondGroup
    (CoGroupOperator.java:158,183; CoGroupGroupSortITCase.java): each group
    arrives at ``fn`` ordered by the given columns. The sort happens inside
    the per-group Arrow batch (pandas sort of one group), not as a global
    exchange — the same secondary-sort-on-the-grouped-data the reference's
    runtime performs. When either is given, ``fn`` must take
    ``(left_pdf, right_pdf)``.
    """
    if fn is None:
        raise ValueError("co_group requires fn; for relational co-grouping use agg + full outer join")
    if sort_first or sort_second:
        inner = fn

        def fn(lg, rg):  # noqa: F811 — sorted-group wrapper
            if sort_first and len(lg):
                lg = lg.sort_values(
                    [c for c, _ in sort_first], ascending=[a for _, a in sort_first]
                )
            if sort_second and len(rg):
                rg = rg.sort_values(
                    [c for c, _ in sort_second], ascending=[a for _, a in sort_second]
                )
            return inner(lg, rg)

    return (
        left.groupBy(*left_keys)
        .cogroup(right.groupBy(*right_keys))
        .applyInPandas(fn, schema=schema)
    )


def windowed_co_group(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    window: str,
    fn,
    schema,
) -> DataFrame:
    """Streaming windowed coGroup: coGroup().where().equalTo().window().apply()
    (CoGroupedStreams.java:126, DataStream.java:730).

    Unlike the windowed JOIN (inner, pairwise), coGroup hands the function
    BOTH groups for every (key, window) that appears on EITHER side — a
    per-window full-outer grouped apply. pandas cogroup gives exactly that
    contract: ``fn(key, left_pdf, right_pdf)`` with an empty frame for the
    absent side, mirroring CoGroupFunction(Iterable, Iterable, Collector).

    Scale: both sides shuffle once on the KEYS — the same exchange the
    reference's two-input window operator performs; Arrow moves each key's
    co-group as a batch, never row-at-a-time.

    r16 (guide §4.2 — fewer, larger Python crossings): the original form
    cogrouped on (window_start, keys), paying one Spark-level group + one
    Arrow transpose + one pandas-frame construction per (key, window) —
    ~0.7 ms of fixed overhead each, which dominated wall time at tens of
    thousands of tiny windows (cogroup_windowed: 22.7 s at sf0.01). Now the
    Spark cogroup runs per KEY and the window split happens INSIDE the
    Python worker with one pandas groupby per side; ``fn`` is still invoked
    once per (key, window) that appears on EITHER side, with the absent
    side as an empty frame carrying that side's full columns — the contract
    and the produced rows are identical (pinned by
    tests/test_datastream_api.py::test_windowed_co_group and the
    cogroup_windowed oracle; equivalence pin in
    test_datastream_api.py::test_windowed_co_group_batched_equivalence;
    the CoGroupJoinITCase golden drives the 2-arg fn form).
    Null timestamps never reach the worker: Spark's TimeWindowing rule
    compiles ``F.window(ts, ...)`` with an ``isnotnull(ts)`` filter, on
    this form and on the pre-r16 per-(key, window) groupBy form alike
    (pinned by test_windowed_co_group_null_ts_rows_never_fire). The
    worker-side groupby still keeps ``dropna=False`` and normalizes a NaT
    group key to None defensively (r16 ADVICE: pairing null groups through
    the pd.NaT singleton's object identity was fragile — NaT != NaT), so a
    future caller windowing by a pre-computed nullable column cannot
    double-fire the null window. Like applyInPandas
    itself, the user fn may take ``(left_pdf, right_pdf)`` or
    ``(key, left_pdf, right_pdf)`` — arity is inspected once up front, the
    same convention Spark applies to the cogroup function (bound methods
    count ``self`` and a 2-arg fn with an optional third default parameter
    reads as 3-arg, exactly as in Spark's own applyInPandas); a
    non-introspectable callable falls back to the documented 3-arg
    contract.

    Skew note (r16 ADVICE): grouping per KEY means one Arrow batch holds a
    key's whole history across all windows — a hot key over a long range
    materializes in one Python worker where the per-(key, window) form
    bounded memory per window. That is the deliberate trade for the
    O(keys) vs O(keys × windows) fixed-crossing win; when a single key's
    history can exceed worker memory, add a coarse time bucket to the
    Spark-side keys (group on (month_bucket, keys)) to cap batch size —
    the window split inside the worker is unaffected.
    """
    import inspect

    lw = left.withColumn("__w", F.window(F.col(left_ts), window)["start"])
    rw = right.withColumn("__w", F.window(F.col(right_ts), window)["start"])
    lkeys = [lk for lk, _ in keys]
    rkeys = [rk for _, rk in keys]
    try:
        takes_key = len(inspect.getfullargspec(fn).args) == 3
    except TypeError:  # non-introspectable callable: documented contract
        takes_key = True

    def per_key(key, lpdf, rpdf):
        import pandas as pd

        def groups(pdf):
            if not len(pdf):
                return {}
            # normalize the group key: NaT -> None so the two sides' null
            # windows pair by VALUE, not by NaT object identity
            return {
                (None if pd.isna(w) else w): g
                for w, g in pdf.groupby("__w", sort=False, dropna=False)
            }

        lg, rg = groups(lpdf), groups(rpdf)
        l_empty, r_empty = lpdf.iloc[0:0], rpdf.iloc[0:0]
        return pd.concat(
            [
                fn((w, *key), lg.get(w, l_empty), rg.get(w, r_empty))
                if takes_key
                else fn(lg.get(w, l_empty), rg.get(w, r_empty))
                for w in {*lg, *rg}
            ],
            ignore_index=True,
        )

    return lw.groupBy(*lkeys).cogroup(rw.groupBy(*rkeys)).applyInPandas(per_key, schema=schema)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    how: str = "inner",
    residual: Column | None = None,
    lower_exclusive: bool = False,
    upper_exclusive: bool = False,
) -> DataFrame:
    """Time-bounded join: right.ts ∈ [left.ts - lower, left.ts + upper].

    Reference: TimeBoundedStreamJoin.scala:55 / IntervalJoinOperator.java:89.
    ``lower``/``upper`` are SQL interval strings like ``'1 hour'``; bounds
    are INCLUSIVE by default (IntervalJoinITCase.java:356
    testBoundsAreInclusiveByDefault) and flip strict with
    ``lower_exclusive``/``upper_exclusive``
    (IntervalJoined.lowerBoundExclusive/upperBoundExclusive,
    KeyedStream.java:478,488; IntervalJoinITCase.java:284). None bounds are
    rejected loudly (IntervalJoinITCase.java:254,269).

    Batch form: equi-join on keys + range residual. Catalyst pushes the range
    condition into the join; with AQE the smaller side broadcasts. The
    streaming form (same condition + watermarks) lives in
    streaming.interval_join. Keys are REQUIRED — Flink's interval join is
    defined on keyed streams, and a keyless time-range join would compile
    to a nested-loop cartesian, exactly the blow-up the equi-key exists to
    prevent (review finding).
    """
    if not keys:
        raise ValueError("interval_join requires at least one equi-key pair")
    if lower is None or upper is None:
        raise ValueError("interval_join requires BOTH bounds (between(lower, upper))")
    cond = None
    for lk, rk in keys:
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    lo_bound = left[left_ts] - F.expr(f"INTERVAL {lower}")
    hi_bound = left[left_ts] + F.expr(f"INTERVAL {upper}")
    lo = right[right_ts] > lo_bound if lower_exclusive else right[right_ts] >= lo_bound
    hi = right[right_ts] < hi_bound if upper_exclusive else right[right_ts] <= hi_bound
    rng = lo & hi
    cond = rng if cond is None else (cond & rng)
    if residual is not None:
        # Flink's time-bounded join carries arbitrary remaining conditions
        # INSIDE the join (TimeBoundedStreamJoin.scala:55 otherCondition;
        # stream/sql JoinITCase.scala:508 `AND t1.id <> 'L-5'`): for outer
        # joins this decides null-padding vs dropping, so it cannot be a
        # post-filter.
        cond = cond & residual
    return left.join(right, cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join: the (skewed) left side gets a random salt in
    [0, salt), the (smaller) right side replicates ``salt``× — the hot key's
    rows spread over ``salt`` reducers instead of one.

    Reference analog: Flink 1.6 has no skew-join handling (PARTITION_HASH
    ships everything, ShipStrategyType.java:31-66) — this exceeds it. Note
    Spark's AQE skew-join (on by default in the session) handles most cases
    without salting; this operator is for deterministic pre-salting when the
    skew is known (e.g. a null-heavy foreign key) or AQE is unavailable.

    Only inner/left-side join types are legal: the right side is REPLICATED
    ``salt``×, so right/full outer would emit each unmatched right row once
    per replica.
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter", "leftsemi", "leftanti"):
        raise ValueError(f"salted_join replicates the right side; {how!r} would multiply unmatched right rows")
    salted_left = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["__salt"] == salted_right["__salt"]),
        how,
    )
    return out.drop("__salt")


def windowed_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    window: str,
    how: str = "inner",
) -> DataFrame:
    """Per-window equi-join: where/equalTo/window/apply (JoinedStreams.java:126).

    Both sides are bucketed into the same tumbling window; the join adds the
    window-start as an extra equi-key — a pure hash join, no range predicate.
    """
    lw = left.withColumn("__w", F.window(F.col(left_ts), window))
    rw = right.withColumn("__w", F.window(F.col(right_ts), window))
    cond = lw["__w"] == rw["__w"]
    for lk, rk in keys:
        cond = cond & (lw[lk] == rw[rk])
    joined = lw.join(rw, cond, how)
    hown = how.replace("_", "").lower()
    if hown in ("semi", "leftsemi", "anti", "leftanti"):
        # only left columns survive a semi/anti join — the left __w IS the
        # window column (previously the rename silently no-op'd and the
        # window vanished; review finding)
        return joined.withColumnRenamed("__w", "window")
    # outer joins: an unmatched row still belongs to ITS OWN window — take
    # whichever side is present (they are equal on matches by the join
    # condition; review finding: keeping only the right __w made every
    # unmatched left row's window NULL)
    return (
        joined.withColumn("window", F.coalesce(lw["__w"], rw["__w"]))
        .drop(lw["__w"])
        .drop(rw["__w"])
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of (point-in-time) join: for each left row, the single most recent
    right row with ``right_ts <= left_ts`` on the same key (``backward``;
    ``forward`` = earliest right row with ``right_ts >= left_ts``). The
    engine's extension tier — the reference expresses this only as a custom
    ProcessFunction over keyed state (per-key sorted MapState replay, the
    pattern its temporal-join docs sketch); here it is one declarative plan.

    Scale design: NOT a range join (no O(n·m) per-key pair explosion, no
    driver loop). Both sides are union-tagged into one stream, hash-shuffled
    once on the key, sorted per partition by (ts, side), and the right
    payload is carried forward with last(ignorenulls) over an
    unbounded-preceding window — one shuffle + one sort for any data size,
    the same asymptotics as a sort-merge join. Equal timestamps match
    (right sorts before left at ties, DuckDB ASOF's >= semantics).

    Determinism contract: if the right side has MULTIPLE rows at the same
    (key, ts), which one wins is sort-order dependent — pre-aggregate the
    right side to unique (key, ts) (as join_asof_events does) when a
    reproducible pick matters.

    The payload carries forward as ONE struct, not per-column fills: a
    matched right row must arrive whole even when some of its payload
    fields are NULL — per-column last(ignorenulls) would skip the NULL
    field and stitch together a chimera of different right rows (review
    finding; DuckDB ASOF / pandas merge_asof return the matched row's NULL
    faithfully, and so does this).
    """
    from pyspark.sql.types import StructField, StructType

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if not right_payload:
        raise ValueError("asof_join needs at least one right payload column")
    lcols = left.columns
    rstruct = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in right_payload]
    )
    # __side orders right rows BEFORE left rows at equal ts so ties match
    tagged_l = left.select(
        F.col(key).alias("__k"), F.col(left_ts).alias("__ts"), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rstruct).alias("__rrow"),
    )
    tagged_r = right.select(
        F.col(key).alias("__k"), F.col(right_ts).alias("__ts"), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c).alias(c) for c in right_payload]).alias("__rrow"),
    )
    from pyspark.sql import Window

    order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    unioned = tagged_l.unionByName(tagged_r)
    filled = unioned.select("*", F.last("__rrow", ignorenulls=True).over(w).alias("__frow"))
    out = filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__frow.{c}").alias(f"r_{c}") for c in right_payload],
    )
    return out
