"""Registered queries — the declared, oracle-checked surface of the engine.

Conventions (driver contract, see __spark_entry__.py):
- each query fn is ``(spark, sf_dir) -> DataFrame``;
- every computed column is aliased IDENTICALLY in the Spark code and in the
  DuckDB oracle SQL;
- floating-point aggregates are rounded on BOTH sides (Spark's partial-agg
  summation order differs from DuckDB's single-node order; rounding makes the
  value hash stable);
- result sets that use LIMIT carry a full deterministic ORDER BY (unique
  tiebreaker) so both engines select the same rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.catalog import normalize_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from a scale-factor dir (lazy parquet scan).

    Nanosecond-timestamp columns arrive as long (nanosAsLong) and are
    normalized to microsecond timestamps — matching DuckDB's ns→µs truncation.

    The nanosAsLong conf is set here defensively: the driver runs queries on a
    bare SparkSession (no session.py bootstrap), and without it any read of
    events.parquet (TIMESTAMP(NANOS)) dies with PARQUET_TYPE_ILLEGAL.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_table(name, spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")))
