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
    "flink_1_6_0_spark.queries.formats",
    "flink_1_6_0_spark.queries.lake",
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
    # --- round-7 rotation (r6 verdict task 1): after r6's fully-green 50/50
    # gate, 158 of 191 registered queries have driver evidence; 33 never had
    # any. This window rotates in ALL 33 — the text tier, the remaining
    # dedup/ann/sampling stragglers, and the five r6 additions (including the
    # drained oracle form of stream_incremental_dedup) — plus 17 stable
    # sentinels (>=1 per §2 family, all driver-green in r6). Green here means
    # FULL closure: every registered query driver-checked at least once.
    # Everything rotated out stays registered + locally oracle-verified. ---
    #
    # §2 sentinels (stable across rotations, all drv6-green):
    "tpch_q1",                 # §2.3/§2.4 join+agg core
    "stream_asof_join",        # §2.11 streaming join semantics
    "window_tumble",           # §2.5 group windows
    "over_rows_unbounded",     # §2.6 OVER windows
    "udaf_geomean",            # §2.10 UDF/UDAF contract
    "stream_cep_funnel",       # §2.12 CEP streaming NFA
    "dedup_minhash_lsh",       # LLM-pipeline dedup
    "multimodal_real_decode",  # multimodal plumbing
    "embedding_normalize",     # embedding hygiene (r4 red, drv6-green)
    "graph_triangle_count",    # §2.13 Gelly tier representative
    "sql_in_subquery",         # §2.3 SQL subquery rewrites
    "corpus_temperature_mix",  # corpus sampling tier
    "ann_ivf_topk",            # ANN tier
    "stream_tumble_agg",       # §2.5 streaming window agg (r6 perf outlier)
    #
    # text analysis tier (never driver-checked):
    "text_langid", "text_fingerprint", "text_quality",
    "text_repetition_filter", "text_segment_dedup", "text_perplexity_filter",
    "text_vocab_coverage", "text_length_outliers", "text_bpe_token_stats",
    "text_bpe_train", "tfidf_top_terms", "ngram_bigram_top20",
    # dedup / ANN stragglers:
    "dedup_ngram_jaccard", "dedup_summary_report", "dedup_cross_corpus_pairs",
    "ann_ivf_kmeans_topk", "embedding_pca_project",
    # sampling / sharding / reporting:
    "sample_stratified", "sample_n_per_source", "doc_shard_assign",
    "quality_filter_funnel", "dataset_summarize",
    # ML facade + misc:
    "ml_sos_outlier", "ml_quality_classifier", "pi_estimation",
    "multimodal_frame_sample", "stream_contamination", "cep_double_click",
    # round-6 additions (registered in r6, never driver-checked):
    "dedup_minhash_calibration", "contamination_eval_report",
    "corpus_token_budget", "corpus_version_diff", "stream_incremental_dedup",
    # round-7 additions (new ops need first driver evidence; they take the
    # slots of the dedup_incremental, window_count_evictor and
    # join_asof_forward sentinels — all drv6-green, their families untouched
    # or still represented (streaming asof keeps the stream_asof_join
    # sentinel, dedup keeps dedup_minhash_lsh, windows keep window_tumble).
    # With these three, green here = EVERY query registered at window-design
    # time driver-checked at least once. (Registered later in round 7, for
    # the ROUND-8 window: source_csv_roundtrip, source_orc_roundtrip,
    # source_avro_roundtrip — the §2.1 format paths' first driver oracle.)
    "pack_sequences_ffd", "corpus_e2e_pretrain", "skew_report_events",
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
