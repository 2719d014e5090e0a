"""Query registry — the single source of truth for the declared surface.

Every operator claimed in SURVEY.md §2 gets a registered query: a Spark
callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py``, the pytest correctness
harness, and ``bench.py`` all read this registry, so a query is written once
and checked everywhere.

Column-name contract: the driver compares Spark vs oracle by sorting columns
by NAME before hashing — every computed column must carry the same alias on
both sides (see __spark_entry__ docstring).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the same parquet views, or None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Submodules whose import populates the registry.
_QUERY_MODULES = (
    "flink_1_6_0_spark.queries.tpch",
    "flink_1_6_0_spark.queries.tpch_full",
    "flink_1_6_0_spark.queries.relational",
    "flink_1_6_0_spark.queries.functions_sweep",
    "flink_1_6_0_spark.queries.windows",
    "flink_1_6_0_spark.queries.pipeline",
    "flink_1_6_0_spark.queries.pipeline_ext",
    "flink_1_6_0_spark.queries.streaming",
    "flink_1_6_0_spark.queries.graph",
    "flink_1_6_0_spark.queries.sql_surface",
)


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    description: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), bench, description or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return _REGISTRY


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
