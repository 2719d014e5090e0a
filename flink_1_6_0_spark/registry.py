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
    # DuckDB SQL over the same parquet views, or None. May also be a
    # CALLABLE ``(sf_dir: str) -> str`` resolved at check time (r15 ADVICE
    # + r15 verdict task 3: dedup_semantic_ml's oracle reads an
    # engine-materialized table whose path is TIER-KEYED on sf_dir — a
    # static string would bake one tier's path at import time and make
    # overlapping gates read each other's run). Use
    # :func:`resolve_oracle` instead of touching ``spec.oracle`` directly.
    oracle: "str | Callable[[str], str] | None"
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    description: str = ""
    # Optional trusted-reimplementation oracle for tiers where the SQL
    # oracle is cost-prohibitive (r14 verdict task 5: pack_sequences_ffd's
    # recursive CTE replays one step per document). Signature:
    # ``pyoracle(con: duckdb connection with table views) -> pandas
    # DataFrame``; an INDEPENDENT implementation (never imports the engine
    # kernel). scripts/oracle_check.py substitutes it for the SQL oracle
    # only when invoked with ``--py name,...`` — the driver gate and the
    # default path always use the SQL oracle.
    pyoracle: "Callable | None" = None


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


def resolve_oracle(spec: QuerySpec, sf_dir: str) -> str | None:
    """The oracle SQL for ``spec`` at ``sf_dir`` — evaluates callable
    oracles at check time (lazy: env/lake-root changes after import are
    seen, and the string can embed tier-keyed paths)."""
    return spec.oracle(sf_dir) if callable(spec.oracle) else spec.oracle


def query(
    name: str,
    oracle: "str | Callable[[str], str] | None" = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    description: str = "",
    pyoracle: "Callable | None" = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a declared query with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name, fn, oracle, tuple(tags), bench,
            description or (fn.__doc__ or ""), pyoracle,
        )
        return fn

    return deco


# The driver's hard correctness gate covers the FIRST 50 entries of
# ``queries()`` (round-1 evidence: CORRECTNESS_r01.json stopped at position 50,
# leaving §2.5–§2.13 with zero driver rows). Rounds 2–8 maintained a static
# priority head; round 8's window silently failed to rotate (the r8 verdict's
# headline finding), so from round 9 the head is DERIVED: stable §2-family
# sentinels, then this round's explicit re-seats (kernels whose code changed),
# then every registered query that has NEVER appeared in a driver
# CORRECTNESS_r*.json, then everything else stalest-evidence-first. A new
# query is automatically in the next window; forgetting to rotate is no
# longer possible.

# >=1 representative per SURVEY §2 family, stable across rotations.
_SENTINELS = (
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
    "stream_tumble_agg",       # §2.5 streaming window agg
)

# Queries whose kernels changed since their last driver evidence — re-seated
# for fresh rows this round (r11: the four de-vacuated TPC-H queries —
# q2/q8 dialect-tolerant p_type prefix + q8's data-derived subject nation,
# q10's returns-era date window, q11's mean-relative threshold; plus the
# graph queries routing through _checkpoint's lazy reliable-persist path,
# whose r10 drain-timing changed after r10's rotation list was frozen —
# the r10 ADVICE re-seat).
# r15 window. Preflight against r14: every r13 rotation name appears in
# CORRECTNESS_r14.json (verified — stream_over_proctime_rows,
# stream_proctime_sort, over_range_bounded, ml_sos_outlier, text_bpe_train
# all have fresh r14 rows), so the r13 re-seats rotate OUT. r15 re-seats
# cover this round's query/oracle diffs:
_ROTATE_IN = (
    # r15: rows-only -> hash-checked upgrade (materialized kmeans||
    # assignment + pair-step oracle) — the driver must record its FIRST
    # value-checked rows for the registry's last no_oracle entry
    "dedup_semantic_ml",
    # r15: EMB_CAP md5 slice gates added (exact no-op at sf0.01, but the
    # query fns and oracle strings changed) — fresh rows prove the no-op
    "dedup_semantic", "ml_sos_outlier",
    # r15: min_by/max_by tie now passed in ascending sense (caller updated)
    "agg_min_max_by",
    # r15: oracle's merged-session windows re-ordered on (rt, event_id)
    # after the x100 tie-split find
    "stream_session_window_kernel",
)


def _evidence_rounds() -> dict[str, int]:
    """query name -> latest driver round whose CORRECTNESS_r{N}.json contains
    it. Reads the repo root next to this package; missing/corrupt files are
    ignored (a fresh clone simply treats everything as never-checked)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue  # a non-dict top level is corrupt for our purposes —
            # the docstring promises corrupt files are IGNORED, and
            # registration must not depend on untracked working-dir files
        names = data.keys()
        for n in names:
            latest[n] = max(latest.get(n, -1), rnd)
    return latest


def load_all() -> dict[str, QuerySpec]:
    """Import all query modules and return the registry: sentinels, re-seats,
    never-driver-checked (registration order), then stalest-evidence-first."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    missing = [n for n in _SENTINELS + _ROTATE_IN if n not in _REGISTRY]
    if missing:
        raise KeyError(f"priority names not registered: {missing}")
    evidence = _evidence_rounds()
    reg_names = list(_REGISTRY)
    head = list(_SENTINELS) + [n for n in _ROTATE_IN if n not in _SENTINELS]
    head += [n for n in reg_names if n not in evidence and n not in head]
    idx = {n: i for i, n in enumerate(reg_names)}
    rest = sorted(
        (n for n in reg_names if n not in head),
        key=lambda n: (evidence.get(n, -1), idx[n]),
    )
    return {n: _REGISTRY[n] for n in head + rest}


def get(name: str) -> QuerySpec:
    load_all()
    return _REGISTRY[name]
