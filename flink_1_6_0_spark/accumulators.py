"""Accumulators + broadcast variables — SURVEY.md §2 (DataSet API surface).

Reference: flink-core org/apache/flink/api/common/accumulators/ (IntCounter,
LongCounter, DoubleCounter, AverageAccumulator, Histogram, ListAccumulator —
added via RuntimeContext.addAccumulator, read from the JobExecutionResult)
and DataSet operator ``withBroadcastSet(dataset, name)`` →
``getRuntimeContext().getBroadcastVariable(name)``.

Two Spark substrates, chosen by where the metric lives:

- **Plan-side metrics** (the idiomatic path): ``pyspark.sql.Observation`` —
  metrics are Column aggregates evaluated DURING the action that consumes
  the DataFrame, with zero extra passes and zero Python in the row path.
  This is what a Flink counter in a map chain compiles to here.
- **Python-side accumulators**: for metrics incremented inside
  mapInPandas/applyInPandas user code, ``SparkContext.accumulator`` (and a
  dict-merging param for Histogram) — the direct RuntimeContext analog.

  **At-least-once caveat** (differs from the reference): Spark only
  guarantees exactly-once accumulator updates inside *actions*; updates made
  in *transformations* (which is where mapInPandas runs) can be re-applied
  when a task is retried or speculatively duplicated, so these counters can
  over-count under failure/speculation — unlike Flink's job-exact
  JobExecutionResult accumulators. When the count must be exact, use
  ``observe_metrics`` (plan-side, exactly-once by construction) or disable
  speculative execution (``spark.speculation=false``, the default) and
  accept retry-skew only on task failure.

Broadcast variables: Flink broadcast sets are small by contract (they are
materialized per task). ``broadcast_variable`` collects the DataFrame and
ships it via ``sc.broadcast`` for use inside Python functions; for
JVM-side joins use ``F.broadcast`` instead (no driver materialization).
"""

from __future__ import annotations

from pyspark import AccumulatorParam
from pyspark.sql import DataFrame, Observation, SparkSession


def observe_metrics(df: DataFrame, name: str, **exprs) -> tuple[DataFrame, Observation]:
    """Attach named Column-aggregate metrics to the frame — the plan-side
    accumulator: ``df2, obs = observe_metrics(df, "job", n=F.count(F.lit(1)),
    total=F.sum("x"))``; after any action on df2, ``obs.get`` holds the
    values (JobExecutionResult.getAccumulatorResult analog)."""
    obs = Observation(name)
    return df.observe(obs, *[c.alias(k) for k, c in exprs.items()]), obs


def int_counter(spark: SparkSession, initial: int = 0):
    """IntCounter/LongCounter (accumulators/IntCounter.java): ``acc.add(n)``
    inside Python row/batch functions; ``acc.value`` on the driver after the
    action."""
    return spark.sparkContext.accumulator(initial)


def double_counter(spark: SparkSession, initial: float = 0.0):
    return spark.sparkContext.accumulator(float(initial))


class _DictSumParam(AccumulatorParam):
    def zero(self, value):
        return dict(value)

    def addInPlace(self, a, b):
        for k, v in b.items():
            a[k] = a.get(k, 0) + v
        return a


def histogram(spark: SparkSession):
    """Histogram (accumulators/Histogram.java): integer bucket → count map;
    merge is per-bucket addition. ``acc.add({bucket: 1})`` per element."""
    return spark.sparkContext.accumulator({}, _DictSumParam())


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return list(value)

    def addInPlace(self, a, b):
        a.extend(b)
        return a


def list_accumulator(spark: SparkSession):
    """ListAccumulator: order-unstable element collection (the reference
    gives no order guarantee either)."""
    return spark.sparkContext.accumulator([], _ListParam())


class AverageAccumulator:
    """AverageAccumulator (accumulators/AverageAccumulator.java): running
    mean as a (sum, count) pair of counters."""

    def __init__(self, spark: SparkSession):
        self._sum = spark.sparkContext.accumulator(0.0)
        self._count = spark.sparkContext.accumulator(0)

    def add(self, value: float) -> None:
        """add(double) — one observation (AverageAccumulator.java contract)."""
        self._sum.add(float(value))
        self._count.add(1)

    @property
    def local_value(self) -> float:
        c = self._count.value
        return (self._sum.value / c) if c else 0.0


def broadcast_variable(df: DataFrame):
    """withBroadcastSet → getBroadcastVariable: the (small-by-contract)
    DataFrame as a driver-collected ``sc.broadcast`` of Rows, readable
    inside any Python function on the executors via ``.value``. The
    collect IS the reference semantics — Flink materializes the broadcast
    set in every task too; big sides belong in ``F.broadcast`` joins."""
    rows = df.collect()
    return df.sparkSession.sparkContext.broadcast(rows)
