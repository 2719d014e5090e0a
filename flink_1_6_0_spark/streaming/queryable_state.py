"""Queryable state — SURVEY.md §2.11 row.

Reference: flink-queryable-state / KeyedStream.asQueryableState
(KeyedStream.java:1004) — external point lookups into a running job's keyed
state.

Spark analog: sink the continuously-updated aggregate to an in-memory table
(`format("memory")`, complete/update mode); the table is queryable via SQL
from the same session while the stream runs — the same read-your-state
contract without a separate RPC layer. For cross-process access, swap the
memory sink for a parquet/foreachBatch-upsert sink behind the identical
``lookup`` API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class QueryableState:
    """asQueryableState(name): start the state-publishing query, then point-
    lookup by key while it runs."""

    def __init__(self, keyed_agg: DataFrame, name: str, mode: str = "complete"):
        self.name = name
        self.spark: SparkSession = keyed_agg.sparkSession
        self.query = (
            keyed_agg.writeStream.outputMode(mode).format("memory").queryName(name).start()
        )

    def lookup(self, key_col: str, key_value) -> list:
        """Point lookup into the current state (getKvState analog). Column
        predicate, not SQL-string interpolation — repr() of non-str/int keys
        (timestamps, bytes) is not valid SQL, and quoting by hand is an
        injection surface."""
        import pyspark.sql.functions as F

        return self.spark.table(self.name).filter(F.col(key_col) == key_value).collect()

    def stop(self) -> None:
        self.query.stop()
