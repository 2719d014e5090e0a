"""Batch iterations — the DataSet API's bulk and delta iteration operators.

Reference: DataSet.iterate (flink-java/.../DataSet.java:1156 →
IterativeDataSet.closeWith(result[, terminationCriterion]),
IterativeDataSet.java:63,82) and DataSet.iterateDelta (DataSet.java:1206 →
DeltaIteration.closeWith(solutionSetDelta, newWorkset),
DeltaIteration.java:94). These are the primitives Gelly's iteration models
compile onto; the generic graph entry points (operators/graph.py
run_vertex_centric / run_gather_sum_apply / run_scatter_gather) are the
specialized forms.

Spark-first design: Spark has no feedback edges, so the loop runs on the
driver while ALL data stays distributed — each pass is a new DataFrame
lineage segment, truncated every ``checkpoint_interval`` passes
(localCheckpoint by default; 'reliable' = checkpoint to the checkpoint dir,
surviving executor loss like Flink's checkpointed iterations). The
per-iteration driver action (`isEmpty` on the termination criterion /
workset) mirrors the reference's synchronization barrier between
supersteps — it is a superstep boundary, not a data collect: only the
emptiness bit reaches the driver.

Scale notes: the delta iteration's solution-set upsert is one hash shuffle
per pass on the solution keys — the analog of the reference's indexed
solution set (DeltaIteration keeps the solution partitioned by key and
joins the delta in place). The workset is usually a small shrinking
frontier; Spark broadcasts it automatically under the join threshold, which
is exactly the behavior you want as the iteration converges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from flink_1_6_0_spark.operators.graph import _checkpoint


def iterate(
    df: DataFrame,
    step_fn,
    max_iterations: int,
    termination_fn=None,
    checkpoint_interval: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Bulk iteration (DataSet.java:1156; IterativeDataSet.closeWith).

    ``step_fn(df) -> df`` produces the next iteration's input (same schema).
    Terminates after ``max_iterations``, or earlier when
    ``termination_fn(prev, cur)`` returns an EMPTY DataFrame — the
    reference's termination-criterion contract (IterativeDataSet.java:82:
    "iteration is terminated once the termination criterion is empty")."""
    state = df
    for i in range(max_iterations):
        new_state = step_fn(state)
        if i % checkpoint_interval == checkpoint_interval - 1:
            new_state = _checkpoint(new_state, checkpoint_mode)
        if termination_fn is not None and termination_fn(state, new_state).isEmpty():
            return new_state
        state = new_state
    return state


def iterate_delta(
    solution: DataFrame,
    workset: DataFrame,
    step_fn,
    max_iterations: int,
    key_cols: list[str],
    checkpoint_interval: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Delta iteration (DataSet.java:1206; DeltaIteration.closeWith).

    ``step_fn(solution, workset) -> (solution_delta, new_workset)``. Each
    pass upserts ``solution_delta`` into the solution set by ``key_cols``
    (anti-join + union — the distributed form of the reference's indexed
    solution-set update) and feeds ``new_workset`` to the next pass.
    Terminates when the workset is empty (DeltaIteration's contract) or
    after ``max_iterations``. Returns the final solution set.

    The solution set is a HASH TABLE keyed on ``key_cols``
    (SolutionSetDuplicatesITCase.java:53 — r12 port-found fix): duplicate
    keys in the initial solution or in a delta collapse to ONE row per key,
    exactly as the reference's CompactingHashTable insert overwrites."""
    solution = solution.dropDuplicates(key_cols)
    for i in range(max_iterations):
        if workset.isEmpty():
            break
        delta, workset = step_fn(solution, workset)
        delta = delta.dropDuplicates(key_cols)
        solution = solution.join(delta, key_cols, "left_anti").unionByName(delta)
        if i % checkpoint_interval == checkpoint_interval - 1:
            solution = _checkpoint(solution, checkpoint_mode)
            workset = _checkpoint(workset, checkpoint_mode)
    return solution


def iterate_with_aggregator(
    df: DataFrame,
    step_fn,
    max_iterations: int,
    aggregator,
    convergence_fn,
    checkpoint_interval: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Bulk iteration with a registered AGGREGATOR and an aggregate-based
    convergence criterion — IterativeDataSet.registerAggregator /
    registerAggregationConvergenceCriterion (IterativeDataSet.java:95,120;
    AggregatorsITCase.java). Semantics mirrored exactly:

    - ``step_fn(df, prev_agg) -> df``: ``prev_agg`` is the PREVIOUS
      superstep's aggregate Row (None in superstep 1) — the
      ``IterationRuntimeContext.getPreviousIterationAggregate`` contract.
    - ``aggregator(df) -> 1-row DataFrame`` over the superstep's output:
      the distributed form of the reference's per-element
      ``aggr.aggregate(...)`` calls folded by the sync barrier (one
      map-side-combined global aggregate per superstep — bytes to the
      driver, not rows).
    - ``convergence_fn(superstep, agg_row) -> bool``: checked AFTER each
      superstep; when true the iteration stops WITH that superstep's
      result included (ConvergenceCriterion.isConverged — the converged
      superstep's output is the final state, AggregatorsITCase golden).
    """
    state = df
    prev_agg = None
    cached = None
    for i in range(1, max_iterations + 1):
        state = step_fn(state, prev_agg)
        if i % checkpoint_interval == 0:
            state = _checkpoint(state, checkpoint_mode)
        # the aggregate is an ACTION every superstep: cache the state first
        # so superstep i's work runs once, not once for the aggregate and
        # again inside superstep i+1's lineage (review finding). persist()
        # is lazy — the previous superstep's cache must stay alive until
        # the aggregator action has MATERIALIZED the new one, else step i
        # re-derives state i-1 from lineage; drain it only afterwards.
        state = state.persist()
        agg_row = aggregator(state).first()
        if cached is not None:
            cached.unpersist()
        cached = state
        if convergence_fn(i, agg_row):
            break
        prev_agg = agg_row
    # The returned DataFrame stays persisted on purpose: the aggregator
    # action already materialized it, so the caller's first action is a
    # cache read instead of a full re-run of the last lineage segment.
    # Callers that are done with it should .unpersist() it themselves.
    return state


def iterate_delta_with_aggregator(
    solution: DataFrame,
    workset: DataFrame,
    step_fn,
    max_iterations: int,
    key_cols: list[str],
    convergence_fn=None,
    checkpoint_interval: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Delta iteration with aggregators (DeltaIteration.registerAggregator /
    registerAggregationConvergenceCriterion, DeltaIteration.java:172,187).

    ``step_fn(solution, workset, prev_agg) -> (delta, new_workset, agg_df)``
    — the step computes the superstep's aggregate itself (a 1-row
    DataFrame), exactly where the reference's rich function would call
    ``aggr.aggregate``; the loop folds it, hands it to ``convergence_fn``
    and passes it into the next superstep as ``prev_agg``. Terminates on
    empty workset, convergence, or ``max_iterations``; the converged
    superstep's solution update is applied before returning."""
    prev_agg = None
    for i in range(1, max_iterations + 1):
        if workset.isEmpty():
            break
        delta, workset, agg_df = step_fn(solution, workset, prev_agg)
        solution = solution.join(delta, key_cols, "left_anti").unionByName(delta)
        if i % checkpoint_interval == 0:
            solution = _checkpoint(solution, checkpoint_mode)
            workset = _checkpoint(workset, checkpoint_mode)
        agg_row = agg_df.first() if agg_df is not None else None
        if convergence_fn is not None and convergence_fn(i, agg_row):
            break
        prev_agg = agg_row
    return solution
