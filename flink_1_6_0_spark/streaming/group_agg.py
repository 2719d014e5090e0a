"""Continuous (non-windowed) streaming aggregation — SURVEY.md §2.4 stream row.

Reference: GroupAggProcessFunction (flink-table/.../runtime/aggregate/
GroupAggProcessFunction.scala:39) — accumulators in ValueState, a retract +
new row emitted per update, idle state dropped after
StreamQueryConfig.withIdleStateRetentionTime (api/queryConfig.scala:72).

Spark: streaming groupBy().agg() in `update` mode is exactly this operator —
the state store holds the accumulators, each micro-batch emits changed rows
(the "new" half of Flink's retract+new pair; sinks that need the retract half
use foreachBatch merge, see plans.retraction). State TTL: Spark evicts
aggregation state by watermark, so idle-state retention maps to declaring a
rowtime + watermark on the grouping scope; without one, state is unbounded —
same as Flink with retention disabled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def continuous_group_agg(stream: DataFrame, keys: list[str | Column], aggs: list[Column]) -> DataFrame:
    """groupBy(keys).agg(aggs) intended for `update`-mode emission.

    The returned frame is sink-agnostic; pair with
    plans.retraction.infer_output_mode to pick append/update/complete per
    sink capability (the AccMode/retraction-deco phase analog).
    """
    return stream.groupBy(*keys).agg(*aggs)


def distinct_agg(
    stream: DataFrame,
    group_cols: list[str],
    distinct_col: str,
    agg_alias: str = "n_distinct",
    idle_state_retention: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Streaming DISTINCT aggregate (DistinctAccumulator.scala — Flink keeps
    a per-key distinct map inside the accumulator; idle entries are dropped
    after StreamQueryConfig.withIdleStateRetentionTime, queryConfig.scala:72).

    Spark forbids count(DISTINCT) on streams, so the operator is the
    two-stage form with identical semantics: stateful dropDuplicates on the
    (group, value) pair — the distinct map, externalized to the state store —
    then an ordinary streaming count per group.

    State bound:

    - ``idle_state_retention=None``: one state entry per live (key, value),
      forever — Flink with retention disabled.
    - ``idle_state_retention='1 hour'`` (requires ``ts_col``): a watermark at
      that delay scopes ``dropDuplicatesWithinWatermark``, so a (key, value)
      pair unseen for the retention period is EVICTED from state — and, as
      the reference documents for expired idle state, a later reappearance
      is counted again (the idle-cleanup caveat in queryConfig.scala's own
      docs). The downstream count must then be read per-epoch rather than
      as an exact all-time distinct.
    """
    from pyspark.sql import functions as F

    proj = [*group_cols, distinct_col] + ([ts_col] if ts_col and idle_state_retention else [])
    ev = stream.select(*proj)
    if idle_state_retention:
        if not ts_col:
            raise ValueError("idle_state_retention requires ts_col (the rowtime column)")
        distinct = ev.withWatermark(ts_col, idle_state_retention).dropDuplicatesWithinWatermark(
            [*group_cols, distinct_col]
        )
    else:
        distinct = ev.dropDuplicates([*group_cols, distinct_col])
    return distinct.groupBy(*group_cols).agg(F.count("*").alias(agg_alias))


def chained_group_agg(
    stream: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    downstream,
    state_dir: str,
    emit,
    compact_every: int = 16,
):
    """Retraction chain: an unbounded groupBy().agg() feeding ANOTHER
    aggregation — Flink's "count the counts" pipeline
    (RetractionITCase.scala:51 testWordCount: groupBy(word).sum →
    groupBy(count).count). The first aggregate's updates RETRACT their old
    value downstream (GroupAggProcessFunction.scala:39 emits retract+new;
    AccMode/retraction deco, retractionTraits.scala) — without retraction
    the second aggregate would keep counting every superseded first-level
    row.

    Spark forbids chaining two stateful aggregations in one streaming query,
    so the chain runs as foreachBatch with explicit first-level state:

    - each micro-batch appends its per-key PARTIAL aggregate into an
      idempotent per-epoch state partition (at-least-once safe — a retried
      epoch overwrites its own partition, nonwindow_join._write_epoch);
    - the current first-level table is the MERGE of all partials by key
      (``merge_aggs`` over ``partial_aggs``' aliases — sums/counts merge by
      sum, min/max by min/max);
    - ``downstream(first_level)`` — an arbitrary BATCH transform, e.g. the
      second groupBy — is recomputed on the merged table and handed to
      ``emit(result_df, epoch_id)``. Recomputation over the first-level
      table IS the retraction: a key's superseded value simply no longer
      exists in the merged state, so the second aggregate never sees it.

    Scale: per-batch partials are map-side-combined before the exchange
    (bytes per key, not rows); the merge shuffles only distinct first-level
    keys; downstream cost is bounded by first-level cardinality, which is
    what Flink's second GroupAggProcessFunction holds in state too. The
    per-epoch partial layout is COMPACTED every ``compact_every`` epochs:
    the merged table is folded into a snapshot partition (the negative
    __epoch namespace) and subsumed partials reclaimed, so state reads stay
    O(compact_every) partitions for arbitrarily long-running queries; every
    crash/retry interleaving is safe because reads prefer the newest
    snapshot and ignore anything it subsumes (deletion is space
    reclamation, not correctness). ``compact_every=0`` disables.

    ``keys=[]`` gives the non-keyed first stage
    (RetractionITCase.scala:99 testNonKeyedGroupByAndGroupBy).
    Returns the DataStreamWriter (caller names/starts the query).
    """
    import os
    import shutil

    from flink_1_6_0_spark.streaming.nonwindow_join import _write_epoch

    def _snapshot_epoch() -> int:
        """Newest snapshot's epoch (snapshots live in the NEGATIVE partition
        namespace: __epoch=-E holds the merged state as of epoch E), or -1."""
        best = -1
        for name in os.listdir(state_dir):
            if name.startswith("__epoch=-"):
                best = max(best, -int(name.split("=")[1]))
        return best

    def handle(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        part = (batch.groupBy(*keys) if keys else batch.groupBy()).agg(*partial_aggs)
        _write_epoch(part, state_dir, epoch_id)
        # Read rule: the newest snapshot (if any) plus only the partials
        # NEWER than it — everything older is already folded into the
        # snapshot. This keeps state reads O(compact_every) partitions and
        # makes every crash/retry interleaving safe: stale partials or an
        # older snapshot left behind by a partial compaction are simply
        # ignored, never double-counted.
        snap = _snapshot_epoch()
        raw = spark.read.parquet(state_dir)
        if snap >= 0:
            raw = raw.filter((F.col("__epoch") == -snap) | (F.col("__epoch") > snap))
        state = raw.drop("__epoch")
        merged = (state.groupBy(*keys) if keys else state.groupBy()).agg(*merge_aggs)
        if compact_every and epoch_id > 0 and epoch_id % compact_every == 0 and snap < epoch_id:
            # COMPACTION: fold everything <= this epoch into snapshot -E
            # (localCheckpoint severs the lineage from the files about to be
            # reclaimed), THEN reclaim subsumed partials and older snapshots.
            # A retry that crashed mid-reclaim re-runs against the already-
            # written snapshot, which the read rule prefers — deletion is
            # pure space reclamation, not correctness.
            merged = merged.localCheckpoint()
            _write_epoch(merged, state_dir, -epoch_id)
            for name in os.listdir(state_dir):
                if not name.startswith("__epoch="):
                    continue
                p = int(name.split("=")[1])
                if (0 <= p <= epoch_id) or (p < 0 and p != -epoch_id):
                    shutil.rmtree(os.path.join(state_dir, name), ignore_errors=True)
        emit(downstream(merged), epoch_id)

    return stream.writeStream.foreachBatch(handle)
