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
    "flink_1_6_0_spark.queries.pipeline_prep",
    "flink_1_6_0_spark.queries.streaming",
    "flink_1_6_0_spark.queries.facade",
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


# The driver's hard correctness gate covers the FIRST 50 entries of
# ``queries()`` (round-1 evidence: CORRECTNESS_r01.json stopped at position 50,
# leaving §2.5–§2.13 with zero driver rows). This explicit head interleaves at
# least one representative of every SURVEY.md §2 family into that window; the
# remaining queries follow in module insertion order.
_PRIORITY_HEAD = (
    # --- round-4 rotation (VERDICT r3 task 2): the 9 round-3 queries the
    # driver has never checked move INTO the 50-wide window; the swapped-out
    # family-duplicates (tpch_q3/q6, window_session, stream_session_append,
    # scalar_temporal_sweep, stream_purging_trigger, over_ranking,
    # dedup_embedding_cosine, graph_pagerank) stay registered + loc-verified,
    # and every §2 family keeps >=1 representative in the window. ---
    # §2.4/§2.3 TPC-H core (agg, joins, semi/anti, exists-collapse)
    "tpch_q1", "tpch_q9", "tpch_q21",
    # §2.3 joins: outer, skew-salted, windowed-stream, interval, stream outer
    "join_full_outer", "join_skew_salted", "join_windowed_stream", "interval_join_events",
    "stream_outer_join",
    # §2.4 aggs: multiset, grouping sets, UDAF, fold, streaming DISTINCT agg
    "agg_multiset_collect", "agg_grouping_sets", "udaf_geomean", "fold_keyed",
    "stream_distinct_agg",
    # §2.8 set ops
    "setop_union_all",
    # §2.9 scalar function sweeps (string/math represent the family;
    # temporal/conditional/collection stay loc-verified outside the window)
    "scalar_string_sweep", "scalar_math_sweep",
    # §2.1 JSON format
    "json_props_extract",
    # §2.5 group windows (+count window, Flink SQL TUMBLE, windowAll) and the
    # streaming window family (session represented by stream_session_agg)
    "window_tumble",
    "window_count_tumble", "window_tumble_flink_sql", "window_all_tumble",
    "stream_evicted_window", "stream_continuous_trigger",
    "stream_hop_agg", "stream_session_agg",
    # §2.6 OVER windows (batch + the r3 streaming OVER)
    "over_rows_unbounded", "over_range_bounded", "stream_over_rows",
    # §2.7 sort/limit
    "sort_offset_fetch",
    # §2.2/§2.10 correlate + UDF/UDTF
    "unnest_tokens", "correlate_lateral_udtf", "udf_scalar_md5",
    # §2.11 streaming semantics (batch-replay-checked)
    "stream_tumble_agg", "stream_continuous_agg", "stream_interval_join",
    # §2.12 CEP (batch NFA + the r3 streaming NFA)
    "cep_funnel", "stream_cep_funnel",
    # §2.13 graph + ML
    "graph_connected_components", "ml_knn_join",
    # §2.3 windowed coGroup (round-3 facade add)
    "cogroup_windowed",
    # LLM-pipeline operators (+ r3 prep tier: PII, contamination, packing,
    # real decoders, embedding hygiene)
    "dedup_exact", "dedup_minhash_lsh",
    "ann_cosine_topk", "text_stats", "multimodal_decode",
    "text_pii_redact", "contamination_ngram", "pack_sequences",
    "multimodal_real_decode", "embedding_normalize",
)


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules and return the registry, priority head first."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _PRIORITY_HEAD if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_PRIORITY_HEAD names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY_HEAD}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
