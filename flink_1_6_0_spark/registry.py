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
    # --- round-5 rotation (r4 verdict task 2): 117 of 186 registered queries
    # have driver evidence from rounds 1-4; 69 have never been driver-checked.
    # This window keeps 9 stable sentinels (>=1 per §2 family, all driver-green
    # in r4) and rotates in 41 of the 69 — the whole r4 Gelly tier, the
    # dedup/ann/corpus/sql_* groups, and the misc batch stragglers.
    # ROUND-6 NOTE: round 5 ended before the driver's correctness gate ran
    # (no CORRECTNESS_r05.json exists), so this window has produced no
    # evidence yet — it is kept VERBATIM for round 6 so the 41 rotated-in
    # queries finally get driver rows. The remaining 28 never-checked
    # queries move to the round-7 window:
    #   text_langid, text_fingerprint, text_quality, text_repetition_filter,
    #   text_segment_dedup, text_perplexity_filter, text_vocab_coverage,
    #   text_length_outliers, text_bpe_token_stats, text_bpe_train,
    #   dedup_ngram_jaccard, dedup_summary_report, dedup_cross_corpus_pairs,
    #   multimodal_frame_sample, embedding_pca_project, ann_ivf_kmeans_topk,
    #   sample_stratified, sample_n_per_source, tfidf_top_terms,
    #   ngram_bigram_top20, doc_shard_assign, quality_filter_funnel,
    #   ml_sos_outlier, ml_quality_classifier, dataset_summarize,
    #   pi_estimation, stream_contamination, cep_double_click.
    # Everything rotated out stays registered + locally oracle-verified. ---
    #
    # §2 sentinels (stable across rotations, all drv4-green):
    "tpch_q1",                 # §2.3/§2.4 join+agg core
    "stream_asof_join",        # §2.11 streaming join semantics
    "window_tumble",           # §2.5 group windows
    "over_rows_unbounded",     # §2.6 OVER windows
    "udaf_geomean",            # §2.10 UDF/UDAF contract
    "stream_cep_funnel",       # §2.12 CEP streaming NFA
    "dedup_minhash_lsh",       # LLM-pipeline dedup
    "multimodal_real_decode",  # multimodal plumbing
    "embedding_normalize",     # r4's one red — fixed shape, must prove green
    #
    # §2.13 Gelly tier (entire r4 addition, zero driver evidence until now):
    "graph_triangle_count", "graph_summarize", "graph_clustering_coeff",
    "graph_hits", "graph_label_propagation", "graph_sssp",
    "graph_community_detection", "graph_bipartite_projection",
    "graph_adamic_adar", "graph_vertex_metrics", "graph_avg_clustering",
    "graph_triadic_census", "graph_edge_metrics", "graph_generators",
    "graph_gen_rmat", "graph_api_pipeline", "graph_vertex_metrics_directed",
    "graph_lcc_directed", "graph_gcc_directed", "graph_transitive_closure",
    "graph_triadic_census_directed",
    # LLM-pipeline: incremental/simhash/cluster dedup, LSH/IVF/multiprobe ANN
    "dedup_incremental", "dedup_simhash", "dedup_cluster_canonical",
    "ann_lsh_topk", "ann_ivf_topk", "ann_multiprobe_topk",
    # corpus sampling / reporting tier
    "corpus_datacard", "corpus_temperature_mix",
    "corpus_quality_weighted_sample", "corpus_diversity_report",
    # §2.3 SQL subquery rewrites
    "sql_in_subquery", "sql_exists_correlated", "sql_scalar_correlated",
    "sql_not_in_subquery", "sql_having_groupagg",
    # misc batch stragglers (§2.6/§2.3/§2.5 variants + events analytics)
    "window_topn", "join_asof_forward", "over_rows_bounded",
    "events_cohort_retention", "window_count_evictor",
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
