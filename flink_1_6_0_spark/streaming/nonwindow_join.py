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
    """Closure-held event-time high-water mark for the foreachBatch joins.

    foreachBatch handlers run on the driver, so a plain dict survives across
    epochs of one query run; after a restart it re-seeds from the first
    batch (a horizon that briefly lags only retains MORE state, never less —
    safe in the same way late-data capture's restart seed is)."""
    return {"max_ts": None}


def _advance_horizon(track: dict, batch: DataFrame, ts_cols: list[str]) -> None:
    """Advance the high-water mark to the max event time in this batch.
    ``F.greatest`` skips NULLs, so the union-tagged batch (where each row
    carries only its own side's timestamp) needs no per-side split."""
    import pyspark.sql.functions as F

    cols = list(dict.fromkeys(ts_cols))
    expr = F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 else F.col(cols[0])
    agg = batch.agg(F.max(expr)).first()[0]
    if agg is not None and (track["max_ts"] is None or agg > track["max_ts"]):
        track["max_ts"] = agg


def _horizon_cut(max_ts, retention: float):
    """(high-water mark − retention), for timestamp OR numeric event-time
    columns (epoch seconds / logical ticks work the same way)."""
    import datetime as dt

    if isinstance(max_ts, (int, float)):
        return max_ts - retention
    return max_ts - dt.timedelta(seconds=retention)


def _trim_left(ls: DataFrame, left_ts: str, track: dict, retention: float | None) -> DataFrame:
    """Retention trim: rows older than (high-water-mark − retention) are
    FINAL — they already carried their last emission and drop out of both
    the per-epoch join and the re-emitted result. The ts predicate reaches
    the parquet state scan (row-group min/max skipping), so old epochs cost
    a footer read, not a row scan."""
    import pyspark.sql.functions as F

    if retention is None or track["max_ts"] is None:
        return ls
    return ls.filter(F.col(left_ts) >= F.lit(_horizon_cut(track["max_ts"], retention)))


def _trim_right_dimension(rs: DataFrame, key: str, right_ts: str) -> DataFrame:
    """Dimension-table contract: only the LATEST version per key can ever
    match future left rows in an equi-join, so older versions are dead
    state. One bounded per-key window, state = |keys|, not |history|."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.col(right_ts).desc())
    return rs.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


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
      (event-time high-water mark − retention) are treated as FINAL — they
      stop being re-joined and re-emitted. This is exactly Flink's
      idle-state retention applied to the left map state.
    - ``right_is_dimension`` (with ``right_key`` + ``right_ts``): keeps only
      the latest row per key on the right — the dimension-table contract
      (older versions can never match again in an equi-join). Right state
      becomes |keys|, not |history|.
    """
    import pyspark.sql.functions as F

    spark = left_stream.sparkSession
    left_cols, right_cols = list(left_stream.columns), list(right_stream.columns)
    tagged = left_stream.withColumn("__side", F.lit("l")).unionByName(
        right_stream.withColumn("__side", F.lit("r")), allowMissingColumns=True
    )

    left_schema, right_schema = left_stream.schema, right_stream.schema
    track = _horizon_tracker()
    ts_cols = [c for c in (left_ts, right_ts) if c]

    def handle(batch: DataFrame, epoch_id: int) -> None:
        lb = batch.filter(F.col("__side") == "l").select(*left_cols)
        rb = batch.filter(F.col("__side") == "r").select(*right_cols)
        if lb.take(1):
            _write_epoch(lb, left_state_path, epoch_id)
        if rb.take(1):
            _write_epoch(rb, right_state_path, epoch_id)
        if left_retention is not None and ts_cols:
            _advance_horizon(track, batch, ts_cols)
        # a side with no arrivals yet joins as an EMPTY relation — an outer
        # join_fn then null-pads the populated side immediately (Flink's
        # NonWindowLeftRightJoin behavior), instead of emitting nothing
        # until both sides have data
        ls = _read_state(spark, left_state_path, left_schema)
        rs = _read_state(spark, right_state_path, right_schema)
        if left_retention is not None and left_ts:
            ls = _trim_left(ls, left_ts, track, left_retention)
        if right_is_dimension and right_key and right_ts:
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
    the per-epoch recompute (round-4 verdict #3): left rows older than
    (event-time high-water mark − retention) are FINAL and drop out of the
    join and the emission. The right side trims direction-aware:

    - ``backward``: a right row older than the horizon can still be the
      standing "most recent version" for a retained left row, but only the
      LATEST such row per key matters — keep rows ≥ horizon plus one
      latest-per-key row below it (state → |keys| + in-retention rows).
    - ``forward``: a forward match needs right_ts ≥ left_ts ≥ horizon, so
      everything below the horizon is dead state — drop it outright.

    Without retention the scale boundary is O(accumulated state) per epoch —
    dimension-scale right sides or bounded replays; the recompute itself is
    the one-shuffle union-tag asof_join plan, never a range explosion.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from flink_1_6_0_spark.operators.joins import asof_join

    spark = left_stream.sparkSession
    left_cols, right_cols = list(left_stream.columns), list(right_stream.columns)
    tagged = left_stream.withColumn("__side", F.lit("l")).unionByName(
        right_stream.withColumn("__side", F.lit("r")), allowMissingColumns=True
    )

    left_schema, right_schema = left_stream.schema, right_stream.schema
    track = _horizon_tracker()

    def _trim_right_asof(rs: DataFrame) -> DataFrame:
        if retention is None or track["max_ts"] is None:
            return rs
        horizon = _horizon_cut(track["max_ts"], retention)
        if direction == "forward":
            return rs.filter(F.col(right_ts) >= F.lit(horizon))
        recent = rs.filter(F.col(right_ts) >= F.lit(horizon))
        w = Window.partitionBy(key).orderBy(F.col(right_ts).desc())
        standing = (
            rs.filter(F.col(right_ts) < F.lit(horizon))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        return recent.unionByName(standing)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        lb = batch.filter(F.col("__side") == "l").select(*left_cols)
        rb = batch.filter(F.col("__side") == "r").select(*right_cols)
        if lb.take(1):
            _write_epoch(lb, left_state_path, epoch_id)
        if rb.take(1):
            _write_epoch(rb, right_state_path, epoch_id)
        if retention is not None:
            _advance_horizon(track, batch, [left_ts, right_ts])
        # missing sides read as EMPTY relations: asof_join against an empty
        # right side null-pads every left row (the outer as-of contract),
        # and an empty left side emits an empty result — no special cases
        ls = _read_state(spark, left_state_path, left_schema)
        rs = _read_state(spark, right_state_path, right_schema)
        if retention is not None:
            ls = _trim_left(ls, left_ts, track, retention)
            rs = _trim_right_asof(rs)
        emit_fn(asof_join(ls, rs, key, left_ts, right_ts, right_payload, direction), epoch_id)

    return (
        tagged.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .start()
    )
