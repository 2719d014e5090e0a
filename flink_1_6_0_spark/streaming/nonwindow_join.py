"""Non-windowed (unbounded) stream-stream outer join — SURVEY.md §7 hard part #2.

Reference: NonWindowLeftRightJoin / NonWindowFullJoin
(flink-table/.../runtime/join/NonWindow*.scala) — Flink joins two unbounded
streams with NO time bound: both sides accumulate in MapState forever (unless
idle-state retention trims them) and null-padded results retract when a match
later arrives.

Spark's built-in stream-stream outer join REQUIRES a watermark + time bound
(state must be finalizable). Two sanctioned forms:

1. ``bounded_outer_join`` — the Spark-native operator with an explicit,
   generous time bound. This is the recommended path: at 100 TB unbounded
   join state is an outage, not a feature; the bound makes state size
   (watermark delay + bound) × key-rate, same as Flink WITH idle-state
   retention configured. Semantics match Flink-with-retention exactly.

2. ``foreach_batch_outer_join`` — exact Flink semantics (no time bound) via
   incremental recompute: each micro-batch appends both sides to accumulating
   state tables and re-emits the full outer join (complete mode through
   foreachBatch). Correct retractions included — downstream sees the current
   full result each epoch, which is precisely the RetractStreamTableSink
   contract collapsed to upserts. Cost is O(accumulated state) per batch —
   usable for dimension-scale streams, documented as non-scalable for
   fact-scale ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_1_6_0_spark.streaming.interval_join import stream_interval_join


def bounded_outer_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    bound: str = "24 hours",
    delay: str = "1 minute",
    how: str = "left_outer",
) -> DataFrame:
    """Flink NonWindowOuterJoin ≈ Spark outer join with a declared bound
    (the idle-state-retention analog, made explicit)."""
    return stream_interval_join(
        left, right, keys, left_ts, right_ts, bound, bound, delay, delay, how
    )


def _write_epoch(side_df: DataFrame, path: str, epoch_id: int) -> None:
    """Idempotent per-epoch state write shared by the foreachBatch joins.

    foreachBatch is at-least-once: a retried epoch re-delivers the same
    rows. Writing each epoch into its own partition with DYNAMIC partition
    overwrite makes the state write idempotent — the retry rewrites
    partition __epoch=<id> instead of appending a duplicate."""
    import pyspark.sql.functions as F

    (
        side_df.withColumn("__epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(path)
    )


def _read_state(spark, path: str, schema) -> DataFrame:
    """Accumulated state table, or an EMPTY frame with the side's schema
    before its first write. Only the missing-path error is swallowed —
    a genuinely corrupt state path must surface, not silently skip an
    emission."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path).drop("__epoch")
    except AnalysisException:
        return spark.createDataFrame([], schema)


def _horizon_tracker():
    """Closure-held PER-SIDE event-time high-water marks for the foreachBatch
    joins ("l" / "r"), Flink-style: the retention horizon derives from the
    MINIMUM across inputs, so a side running ahead (backfill, replay) can
    never finalize the other side's fresh rows (review finding — a max-based
    horizon silently dropped every row of the lagging stream).

    foreachBatch handlers run on the driver, so a plain dict survives across
    epochs of one query run; after a restart it re-seeds from the first
    batch (a horizon that briefly lags only retains MORE state, never less —
    safe in the same way late-data capture's restart seed is)."""
    return {"l": None, "r": None}


def _advance_horizon(
    track: dict, batch: DataFrame, left_ts: str | None, right_ts: str | None
) -> None:
    """Advance each side's high-water mark from the union-tagged batch
    (one aggregate, split by the ``__side`` tag so identical column names on
    the two sides cannot cross-contaminate the marks)."""
    import pyspark.sql.functions as F

    aggs, sides = [], []
    if left_ts:
        aggs.append(F.max(F.when(F.col("__side") == "l", F.col(left_ts))))
        sides.append("l")
    if right_ts:
        aggs.append(F.max(F.when(F.col("__side") == "r", F.col(right_ts))))
        sides.append("r")
    if not aggs:
        return
    row = batch.agg(*aggs).first()
    for side, v in zip(sides, row):
        if v is not None and (track[side] is None or v > track[side]):
            track[side] = v


def _horizon_base(track: dict, need_right: bool):
    """The watermark the horizon cut derives from: min across the sides in
    play, or None (no trim yet) while any required side is unseen."""
    if track["l"] is None:
        return None
    if not need_right:
        return track["l"]
    if track["r"] is None:
        return None
    return min(track["l"], track["r"])


def _horizon_cut(max_ts, retention: float):
    """(high-water mark − retention), typed by the event-time column:
    int/float/Decimal event times subtract numerically (epoch seconds /
    logical ticks), datetimes subtract a timedelta. A plain DATE column is
    rejected eagerly — `date - timedelta(seconds=n)` silently floors to the
    same date for sub-day retention, a no-op trim the caller would never
    notice (review finding); cast to timestamp instead."""
    import datetime as dt
    from decimal import Decimal

    if isinstance(max_ts, bool):  # bool is an int subclass; never an event time
        raise TypeError("boolean event-time column")
    if isinstance(max_ts, Decimal):
        return max_ts - Decimal(str(retention))
    if isinstance(max_ts, (int, float)):
        return max_ts - retention
    if isinstance(max_ts, dt.datetime):
        return max_ts - dt.timedelta(seconds=retention)
    if isinstance(max_ts, dt.date):
        raise TypeError(
            "DATE-typed event time: sub-day retention would silently no-op; "
            "cast the column to timestamp"
        )
    raise TypeError(f"unsupported event-time type {type(max_ts).__name__}")


def _trim_left(ls: DataFrame, left_ts: str, horizon) -> DataFrame:
    """Retention trim: rows older than the horizon are FINAL — they already
    carried their last emission and drop out of both the per-epoch join and
    the re-emitted result. NULL event times are exempt (a row without event
    time is not subject to event-time retention — with no retention it was
    emitted null-padded, and enabling retention must not disappear it;
    review finding). The ts predicate reaches the parquet state scan
    (row-group min/max skipping), so old epochs cost a footer read, not a
    row scan."""
    import pyspark.sql.functions as F

    if horizon is None:
        return ls
    return ls.filter(F.col(left_ts).isNull() | (F.col(left_ts) >= F.lit(horizon)))


def _latest_per_key(df: DataFrame, key: str, ts: str) -> DataFrame:
    """One row per key: the latest by ``ts`` — the shared kernel of the
    dimension trim and the asof standing-version compaction."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(ts).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def _trim_right_dimension(rs: DataFrame, key: str, right_ts: str) -> DataFrame:
    """Dimension-table contract: only the LATEST version per key can ever
    match future left rows in an equi-join, so older versions are dead
    state. One bounded per-key window, state = |keys|, not |history|."""
    return _latest_per_key(rs, key, right_ts)


def foreach_batch_outer_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    join_fn,
    left_state_path: str,
    right_state_path: str,
    emit_fn,
    checkpoint: str,
    left_ts: str | None = None,
    left_retention: float | None = None,
    right_key: str | None = None,
    right_ts: str | None = None,
    right_is_dimension: bool = False,
):
    """Exact unbounded-state semantics: per epoch, append arrivals to the
    state tables, recompute ``join_fn(left_state, right_state)``, hand the
    full current result to ``emit_fn(result_df, epoch_id)`` (upsert contract).

    Implementation detail: Spark allows one foreachBatch per query, so the
    two streams are unioned with a side tag (``__side``) — both sides commit
    in the same epoch, keeping the recompute consistent.

    Unbounded-state default is the Flink parity mode, but on a long-running
    stream the per-epoch recompute is O(all history) — quadratic over the
    run (round-4 verdict #3). Two trims bound it:

    - ``left_retention`` (seconds, with ``left_ts``): left rows older than
      (retention horizon) are treated as FINAL — they stop being re-joined
      and re-emitted. This is exactly Flink's idle-state retention applied
      to the left map state. The horizon derives from the MIN of the two
      sides' event-time high-water marks when ``right_ts`` is also given
      (Flink's multi-input watermark rule — a backfilled right stream can
      never finalize live left rows); with only ``left_ts`` configured, the
      left clock alone drives finalization (caller's explicit opt-in).
      NULL event times are never trimmed.
    - ``right_is_dimension`` (with ``right_key`` + ``right_ts``): keeps only
      the latest row per key on the right — the dimension-table contract
      (older versions can never match again in an equi-join). Right state
      becomes |keys|, not |history|.
    """
    import pyspark.sql.functions as F

    if left_retention is not None and (left_retention <= 0 or not left_ts):
        raise ValueError("left_retention requires left_ts and a positive value")
    if right_is_dimension and not (right_key and right_ts):
        raise ValueError("right_is_dimension requires right_key and right_ts")

    spark = left_stream.sparkSession
    left_cols, right_cols = list(left_stream.columns), list(right_stream.columns)
    tagged = left_stream.withColumn("__side", F.lit("l")).unionByName(
        right_stream.withColumn("__side", F.lit("r")), allowMissingColumns=True
    )

    left_schema, right_schema = left_stream.schema, right_stream.schema
    track = _horizon_tracker()

    def handle(batch: DataFrame, epoch_id: int) -> None:
        lb = batch.filter(F.col("__side") == "l").select(*left_cols)
        rb = batch.filter(F.col("__side") == "r").select(*right_cols)
        if lb.take(1):
            _write_epoch(lb, left_state_path, epoch_id)
        if rb.take(1):
            _write_epoch(rb, right_state_path, epoch_id)
        if left_retention is not None:
            _advance_horizon(track, batch, left_ts, right_ts)
        # a side with no arrivals yet joins as an EMPTY relation — an outer
        # join_fn then null-pads the populated side immediately (Flink's
        # NonWindowLeftRightJoin behavior), instead of emitting nothing
        # until both sides have data
        ls = _read_state(spark, left_state_path, left_schema)
        rs = _read_state(spark, right_state_path, right_schema)
        if left_retention is not None:
            base = _horizon_base(track, need_right=bool(right_ts))
            if base is not None:
                ls = _trim_left(ls, left_ts, _horizon_cut(base, left_retention))
        if right_is_dimension:
            rs = _trim_right_dimension(rs, right_key, right_ts)
        emit_fn(join_fn(ls, rs), epoch_id)

    return (
        tagged.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )


def foreach_batch_asof_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    left_state_path: str,
    right_state_path: str,
    emit_fn,
    checkpoint: str,
    direction: str = "backward",
    retention: float | None = None,
):
    """STREAMING as-of (temporal) join — the event-time analog of a temporal
    table join: each epoch accumulates both sides in state tables and
    re-emits the full as-of result (upsert contract, like
    ``foreach_batch_outer_join``). A right row arriving late retroactively
    upgrades earlier left rows' matches in the next emission — the retract +
    new behavior an event-time temporal join requires, which Spark's native
    stream-stream joins (append-only, watermark-finalized) cannot express.

    Unbounded state is the parity default; ``retention`` (seconds) bounds
    the per-epoch recompute (round-4 verdict #3). The horizon is
    ``min(left high-water mark, right high-water mark) − retention`` —
    Flink's multi-input watermark rule, so a backfilled/ahead side never
    finalizes the other side's fresh rows — and no trim happens until both
    sides have produced an event time. Left rows older than the horizon are
    FINAL and drop out of the join and the emission (NULL event times are
    exempt). The right side trims direction-aware:

    - ``backward``: a right row older than the horizon can still be the
      standing "most recent version" for a retained left row, but only the
      LATEST such row per key matters. The standing rows live in a COMPACTED
      side table (``<right_state_path>_standing``) maintained incrementally:
      each epoch folds in only the rows that crossed the horizon since the
      last epoch (a row-group-skippable ts range), so per-epoch right-side
      cost is |keys| + in-retention rows — NOT a rescan of all history
      (review finding). After a driver restart the standing table re-seeds
      from full below-horizon history once, then returns to incremental.
    - ``forward``: a forward match needs right_ts ≥ left_ts ≥ horizon, so
      everything below the horizon is dead state — drop it outright.

    Without retention the scale boundary is O(accumulated state) per epoch —
    dimension-scale right sides or bounded replays; the recompute itself is
    the one-shuffle union-tag asof_join plan, never a range explosion.
    """
    import pyspark.sql.functions as F
    from pyspark.errors import AnalysisException

    from flink_1_6_0_spark.operators.joins import asof_join

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if retention is not None and retention <= 0:
        raise ValueError("retention must be positive")

    spark = left_stream.sparkSession
    left_cols, right_cols = list(left_stream.columns), list(right_stream.columns)
    tagged = left_stream.withColumn("__side", F.lit("l")).unionByName(
        right_stream.withColumn("__side", F.lit("r")), allowMissingColumns=True
    )

    left_schema, right_schema = left_stream.schema, right_stream.schema
    track = _horizon_tracker()
    standing_path = f"{right_state_path}_standing"

    def _standing_versions() -> list[int]:
        # enumerate v<N> subdirs via the Hadoop FS API so hdfs:///s3://
        # state paths behave the same as local ones
        base = spark._jvm.org.apache.hadoop.fs.Path(standing_path)
        fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(base):
            return []
        vs = []
        for st in fs.listStatus(base):
            nm = st.getPath().getName()
            if nm.startswith("v") and nm[1:].isdigit():
                vs.append(int(nm[1:]))
        return sorted(vs)

    def _delete_standing_before(v: int) -> None:
        base = spark._jvm.org.apache.hadoop.fs.Path(standing_path)
        fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
        for old in _standing_versions():
            if old < v:
                fs.delete(spark._jvm.org.apache.hadoop.fs.Path(f"{standing_path}/v{old}"), True)

    def _read_standing(version: int | None) -> DataFrame:
        if version is None:
            return spark.createDataFrame([], right_schema)
        try:
            return spark.read.parquet(f"{standing_path}/v{version}")
        except AnalysisException:
            return spark.createDataFrame([], right_schema)

    def _trim_right_asof(rs: DataFrame, horizon) -> DataFrame:
        if direction == "forward":
            return rs.filter(F.col(right_ts).isNull() | (F.col(right_ts) >= F.lit(horizon)))
        recent = rs.filter(F.col(right_ts) >= F.lit(horizon))
        # incremental standing compaction: prev standing (≤ |keys| rows) +
        # only the rows whose ts crossed into [prev_horizon, horizon)
        crossing = rs.filter(F.col(right_ts) < F.lit(horizon))
        lo = track.get("standing_lo")
        if lo is not None:
            crossing = crossing.filter(F.col(right_ts) >= F.lit(lo))
        # epoch-versioned standing files (ADVICE r6): the compaction WRITES
        # v<n+1> while its lineage READS v<n>, so a cache-evicted recompute
        # (e.g. emit_fn re-evaluating the join) can never race the overwrite
        # of its own input — no persist/count defensive materialization
        # needed. Older versions become unreferenced once the re-read below
        # swaps the emitted lineage onto v<n+1>, and are reclaimed
        # immediately. A write that dies mid-epoch leaves a partial v<n+1>,
        # which the restart path tolerates: standing_lo resets to None, so
        # the full below-horizon history is unioned back in and
        # _latest_per_key re-derives the exact standing set.
        versions = _standing_versions()
        cur = versions[-1] if versions else None
        standing = _latest_per_key(_read_standing(cur).unionByName(crossing), key, right_ts)
        new_v = (cur or 0) + 1
        standing.write.mode("overwrite").parquet(f"{standing_path}/v{new_v}")
        standing = spark.read.parquet(f"{standing_path}/v{new_v}")
        _delete_standing_before(new_v)
        track["standing_lo"] = horizon
        return recent.unionByName(standing)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        lb = batch.filter(F.col("__side") == "l").select(*left_cols)
        rb = batch.filter(F.col("__side") == "r").select(*right_cols)
        if lb.take(1):
            _write_epoch(lb, left_state_path, epoch_id)
        if rb.take(1):
            _write_epoch(rb, right_state_path, epoch_id)
        if retention is not None:
            _advance_horizon(track, batch, left_ts, right_ts)
        # missing sides read as EMPTY relations: asof_join against an empty
        # right side null-pads every left row (the outer as-of contract),
        # and an empty left side emits an empty result — no special cases
        ls = _read_state(spark, left_state_path, left_schema)
        rs = _read_state(spark, right_state_path, right_schema)
        if retention is not None:
            base = _horizon_base(track, need_right=True)
            if base is not None:
                horizon = _horizon_cut(base, retention)
                ls = _trim_left(ls, left_ts, horizon)
                rs = _trim_right_asof(rs, horizon)
        emit_fn(
            asof_join(ls, rs, key, left_ts, right_ts, right_payload, direction),
            epoch_id,
        )

    return (
        tagged.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )
