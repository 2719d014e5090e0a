"""REAL TPC-H data via DuckDB's bundled dbgen — the true-sf1 bench point.

The tpch extension is statically bundled in the DuckDB wheel, so a genuine
TPC-H scale factor is generatable fully offline (round-9 verdict corrected
the earlier no-network claim). This gives the TPC-H query family a bench and
oracle point with the REAL value distributions — selectivity of q19's
predicates, q21's supplier skew — that the key-shifted ×10 replica
(sources/scale_synth.py) preserves only in plan shape, not in data.

The emitted tables are projected to TESTDATA.md's trimmed schema (the column
subset + types the whole repo queries against), so every registered TPC-H
query and its DuckDB oracle run unchanged against the generated directory:

    lineitem(l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
             l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE,
             l_discount DOUBLE, l_tax DOUBLE, l_returnflag, l_linestatus,
             l_shipdate TIMESTAMP)
    orders(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus,
           o_totalprice DOUBLE, o_orderdate TIMESTAMP, o_orderpriority)
    customer(c_custkey BIGINT, c_name, c_nationkey INT, c_acctbal DOUBLE,
             c_mktsegment)
    part(p_partkey BIGINT, p_name, p_brand, p_type, p_size INT,
         p_retailprice DOUBLE)
    supplier(s_suppkey BIGINT, s_name, s_nationkey INT, s_acctbal DOUBLE)
    nation(n_nationkey INT, n_name, n_regionkey INT)
    region(r_regionkey INT, r_name)

Scale note: generation is a one-time, cached, single-node step (the same
role dbgen plays for the reference's own TPC-H harness); everything the
engine does with the output is ordinary parquet scanning that partitions
like any other input.
"""

from __future__ import annotations

import os

from flink_1_6_0_spark.sources.partitioned import _lake_root, _publish

# DuckDB-side projections onto the trimmed repo schema. VARCHAR columns need
# no cast; DECIMAL -> DOUBLE and DATE -> TIMESTAMP match the testdata parquet
# types exactly (timestamp[us] in parquet).
_PROJECTIONS = {
    "lineitem": (
        "CAST(l_orderkey AS BIGINT) AS l_orderkey, "
        "CAST(l_partkey AS BIGINT) AS l_partkey, "
        "CAST(l_suppkey AS BIGINT) AS l_suppkey, "
        "CAST(l_linenumber AS INT) AS l_linenumber, "
        "CAST(l_quantity AS DOUBLE) AS l_quantity, "
        "CAST(l_extendedprice AS DOUBLE) AS l_extendedprice, "
        "CAST(l_discount AS DOUBLE) AS l_discount, "
        "CAST(l_tax AS DOUBLE) AS l_tax, "
        "l_returnflag, l_linestatus, "
        "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate"
    ),
    "orders": (
        "CAST(o_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(o_custkey AS BIGINT) AS o_custkey, "
        "o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice, "
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, o_orderpriority"
    ),
    "customer": (
        "CAST(c_custkey AS BIGINT) AS c_custkey, c_name, "
        "CAST(c_nationkey AS INT) AS c_nationkey, "
        "CAST(c_acctbal AS DOUBLE) AS c_acctbal, c_mktsegment"
    ),
    "part": (
        "CAST(p_partkey AS BIGINT) AS p_partkey, p_name, p_brand, p_type, "
        "CAST(p_size AS INT) AS p_size, "
        "CAST(p_retailprice AS DOUBLE) AS p_retailprice"
    ),
    "supplier": (
        "CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, "
        "CAST(s_nationkey AS INT) AS s_nationkey, "
        "CAST(s_acctbal AS DOUBLE) AS s_acctbal"
    ),
    "nation": (
        "CAST(n_nationkey AS INT) AS n_nationkey, n_name, "
        "CAST(n_regionkey AS INT) AS n_regionkey"
    ),
    "region": "CAST(r_regionkey AS INT) AS r_regionkey, r_name",
}


def generate(sf: float, out: str) -> None:
    """dbgen the given scale factor into ``out`` as one parquet per table,
    projected to the trimmed repo schema (non-atomic; callers wanting
    cache/publish semantics use :func:`tpch_dir`)."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    try:
        con.execute("LOAD tpch")
        con.execute(f"CALL dbgen(sf={sf})")
        for table, proj in _PROJECTIONS.items():
            con.execute(
                f"COPY (SELECT {proj} FROM {table} ORDER BY 1) "
                f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
            )
    finally:
        con.close()


def tpch_dir(sf: float = 1.0) -> str:
    """Materialize (once per sf + schema version) a real TPC-H directory and
    return its path. Cached under the lake root with the same atomic-publish
    protocol as every other materialization (sources/partitioned.py)."""
    # v1 in the key: bump when _PROJECTIONS changes so stale caches miss
    tag = f"tpch_dbgen_v1_sf{sf}".replace(".", "_")
    dest = os.path.join(_lake_root(), tag)
    if os.path.isfile(os.path.join(dest, "_SUCCESS")):
        return dest
    tmp = f"{dest}.tmp.{os.getpid()}"
    generate(sf, tmp)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    _publish(tmp, dest)
    return dest
