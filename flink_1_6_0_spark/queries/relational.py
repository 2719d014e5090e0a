"""Batch relational coverage — SURVEY.md §2.2-2.4, §2.7-2.8, §2.10.

One oracle-checked query per operator family: outer/theta/cross/single-row/
semi/anti joins, coGroup, distinct aggregates, grouping sets, min_by/max_by,
first-n per group, multiset COLLECT, stddev/var, set ops (incl. ALL
variants), sort+offset+fetch, UNNEST, lateral correlate (UDTF), scalar UDF,
and a pandas UDAF.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.operators import aggregations as agg_ops
from flink_1_6_0_spark.operators import correlate as corr_ops
from flink_1_6_0_spark.operators import joins as join_ops
from flink_1_6_0_spark.operators import setops as set_ops
from flink_1_6_0_spark.operators import sort as sort_ops
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query

# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name,
           o.n_orders
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 0) c
    FULL JOIN (SELECT o_custkey, count(*) AS n_orders
               FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    tags=("batch", "join"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer equi-join with null padding both sides (DataSet.java:948,
    DataSetJoin.scala:398 REPARTITION_SORT_MERGE outer path)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0).select("c_custkey", "c_name")
    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"), "c_name", "n_orders"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("batch", "join"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (DataSet.java:841); count(col) skips the null-padded side."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_theta_residual",
    oracle="""
    SELECT p_brand,
           count(*) AS n,
           round(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey AND l_quantity > p_size
    GROUP BY p_brand
    """,
    tags=("batch", "join"),
)
def join_theta_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + non-equi residual predicate (DataSetJoin.scala:51 theta
    residuals; Catalyst evaluates the residual inside the hash join).
    Revenue sums in exact integer basis points (the tpch_q1 unit-sum trick):
    the r14 x10 gate caught the float form — summing ~250k doubles per
    group accumulates enough fold-order error to flip the 2nd decimal."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part")
    rev_bp = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + F.lit(0.5)
    ).cast("long")
    return (
        l.join(p, (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(rev_bp).cast("double") / 10000.0, 2).alias("revenue"),
        )
    )


@query(
    "join_single_row",
    oracle="""
    SELECT l_returnflag, count(*) AS n_above_avg
    FROM lineitem, (SELECT avg(l_extendedprice) AS avg_price FROM lineitem)
    WHERE l_extendedprice > avg_price
    GROUP BY l_returnflag
    """,
    tags=("batch", "join"),
)
def join_single_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-row (scalar subquery) join — DataSetSingleRowJoin.scala:42; the
    1-row aggregate broadcasts, the fact table never shuffles for the join."""
    l = T(spark, sf_dir, "lineitem")
    avg_row = l.agg(F.avg("l_extendedprice").alias("avg_price"))
    return (
        join_ops.single_row_join(l, avg_row, F.col("l_extendedprice") > F.col("avg_price"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_above_avg"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    tags=("batch", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left semi join (SubQueryRemoveRule, FlinkRuleSets.scala:36-38)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return join_ops.semi_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
    tags=("batch", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left anti join."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    return join_ops.anti_join(c, o, c.c_custkey == o.o_custkey).select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
    tags=("batch", "join"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (DataSet.java:1056 cross) — both sides tiny dims, so
    this is a broadcast nested-loop; never do this with two fact tables."""
    r = T(spark, sf_dir, "region").select("r_name")
    n = T(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "cogroup_customer_orders",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           coalesce(c.n_cust, 0)   AS n_cust,
           coalesce(o.n_orders, 0) AS n_orders
    FROM (SELECT c_custkey, count(*) AS n_cust FROM customer GROUP BY c_custkey) c
    FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    tags=("batch", "join", "udf"),
)
def cogroup_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coGroup (DataSet.java:1009): both inputs grouped on key, the function
    sees both bags. Arrow-batched pandas cogroup; per-key groups stay small
    (orders-per-customer), so this scales horizontally with key count."""

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        key = left["c_custkey"].iloc[0] if len(left) else right["o_custkey"].iloc[0]
        return pd.DataFrame({"custkey": [key], "n_cust": [len(left)], "n_orders": [len(right)]})

    c = T(spark, sf_dir, "customer").select("c_custkey")
    o = T(spark, sf_dir, "orders").select("o_custkey")
    return join_ops.co_group(
        c, o, ["c_custkey"], ["o_custkey"], fn, schema="custkey long, n_cust long, n_orders long"
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS distinct_supp,
           round(sum(DISTINCT l_quantity), 2) AS sum_distinct_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("batch", "agg"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (AggregateExpandDistinctAggregatesRule.JOIN,
    FlinkRuleSets.scala:158; stream DistinctAccumulator)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("distinct_supp"),
            F.round(F.sum_distinct(F.col("l_quantity")), 2).alias("sum_distinct_qty"),
            F.count("*").alias("n"),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag, l_linestatus) AS gid,
           count(*) AS n,
           round(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("batch", "agg"),
    bench=True,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE + GROUPING_ID (DecomposeGroupingSetRule, FlinkRuleSets.scala:151;
    GROUPING/GROUPING_ID FunctionCatalog.scala:346-348). Spark computes the
    expanded sets in one pass (Expand operator) instead of the reference's
    per-set aggregate + union."""
    return (
        T(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            # exact integer-cent sum (x10-gate float class, fixed proactively)
            F.round(
                F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")).cast("double") / 100.0, 2
            ).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


@query(
    "agg_min_max_by",
    oracle="""
    WITH r AS (
      SELECT l_returnflag, l_orderkey, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey) AS rmax,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice ASC, l_orderkey) AS rmin
      FROM lineitem)
    SELECT l_returnflag,
           max(CASE WHEN rmax = 1 THEN l_orderkey END) AS top_order,
           max(CASE WHEN rmin = 1 THEN l_orderkey END) AS bottom_order,
           round(max(l_extendedprice), 2) AS max_price
    FROM r GROUP BY l_returnflag
    """,
    tags=("batch", "agg"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minBy/maxBy row selection (DataSet.java:523,559). Flink's tie rule
    is "first encountered" (order-dependent); this query pins the
    DETERMINISTIC refinement — lowest orderkey among tied prices — via the
    struct tie-break, so the result is reproducible on any partitioning.
    The r14 x10 gate caught the untied form: duplicated prices in the
    synthetic scale-up made both engines pick arbitrary (different) rows."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            agg_ops.max_by(
                "l_orderkey", "l_extendedprice", tie=F.col("l_orderkey")
            ).alias("top_order"),
            agg_ops.min_by(
                "l_orderkey", "l_extendedprice", tie=F.col("l_orderkey")
            ).alias("bottom_order"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


@query(
    "agg_first_n_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
    FROM lineitem
    QUALIFY row_number() OVER (
      PARTITION BY l_returnflag
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) <= 3
    """,
    tags=("batch", "agg", "sort"),
)
def agg_first_n_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first(n) per group (DataSet.java:574) as a deterministic top-n."""
    l = T(spark, sf_dir, "lineitem")
    top = sort_ops.first_n(
        l,
        3,
        partition_by=["l_returnflag"],
        order_by=[F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
    )
    return top.select(
        "l_returnflag", "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )


@query(
    "agg_multiset_collect",
    oracle="""
    SELECT o_orderpriority,
           array_to_string(list_sort(list(o_orderstatus || ':' || cnt::varchar)), ',')
             AS statuses
    FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
          FROM orders GROUP BY o_orderpriority, o_orderstatus)
    GROUP BY o_orderpriority
    """,
    tags=("batch", "agg"),
)
def agg_multiset_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL COLLECT → multiset (CollectAggFunction.scala; MULTISET type maps to
    element→count — rendered as one sorted comma-joined 'value:count' string so
    the hash is engine-stable AND the driver canonicalizer (pandas sort_values,
    which can't sort list cells) never sees an array column)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.concat_ws(",", agg_ops.collect_multiset_sorted("o_orderstatus")).alias("statuses")
        )
    )


@query(
    "agg_stddev_var",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_discount), 6) AS stddev_s,
           round(stddev_pop(l_discount), 6)  AS stddev_p,
           round(var_samp(l_discount), 6)    AS var_s,
           round(var_pop(l_discount), 6)     AS var_p
    FROM lineitem GROUP BY l_linestatus
    """,
    tags=("batch", "agg"),
)
def agg_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STDDEV_POP/SAMP, VAR_POP/SAMP (FunctionCatalog.scala:350-360;
    AggregateReduceFunctionsRule rewrites them to SUM/COUNT — Spark has native
    implementations)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_discount"), 6).alias("stddev_s"),
            F.round(F.stddev_pop("l_discount"), 6).alias("stddev_p"),
            F.round(F.var_samp("l_discount"), 6).alias("var_s"),
            F.round(F.var_pop("l_discount"), 6).alias("var_p"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.8)
# ---------------------------------------------------------------------------

_H1 = ("1996-01-01 00:00:00", "1996-07-01 00:00:00")
_H2 = ("1996-07-01 00:00:00", "1997-01-01 00:00:00")


def _order_slice(spark, sf_dir, lo, hi):
    return (
        T(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
    )


@query(
    "setop_union_all",
    oracle=f"""
    SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_H1[0]}' AND o_orderdate < TIMESTAMP '{_H1[1]}'
    UNION ALL
    SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
      WHERE o_orderdate >= TIMESTAMP '{_H2[0]}' AND o_orderdate < TIMESTAMP '{_H2[1]}'
    """,
    tags=("batch", "setop"),
    bench=True,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionAll (table.scala:628, DataSetUnion.scala)."""
    return set_ops.union_all(_order_slice(spark, sf_dir, *_H1), _order_slice(spark, sf_dir, *_H2))


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("batch", "setop"),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect (table.scala:650, DataSetIntersect.scala:37)."""
    y96 = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y97 = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return set_ops.intersect(y96, y97)


def _supp_slice(spark, sf_dir, lo, hi):
    return (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
        )
        .select("l_suppkey")
    )


_SUPP_SLICE_SQL = """
SELECT l_suppkey FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
"""


@query(
    "setop_intersect_all",
    oracle=(
        _SUPP_SLICE_SQL.format(lo=_H1[0], hi=_H1[1])
        + " INTERSECT ALL "
        + _SUPP_SLICE_SQL.format(lo=_H2[0], hi=_H2[1])
    ),
    tags=("batch", "setop"),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersectAll (table.scala:673) — multiset min-multiplicity."""
    return set_ops.intersect_all(_supp_slice(spark, sf_dir, *_H1), _supp_slice(spark, sf_dir, *_H2))


@query(
    "setop_except_all",
    oracle=(
        _SUPP_SLICE_SQL.format(lo=_H1[0], hi=_H1[1])
        + " EXCEPT ALL "
        + _SUPP_SLICE_SQL.format(lo=_H2[0], hi=_H2[1])
    ),
    tags=("batch", "setop"),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minusAll / EXCEPT ALL (table.scala:586, DataSetMinus.scala:37)."""
    return set_ops.minus_all(_supp_slice(spark, sf_dir, *_H1), _supp_slice(spark, sf_dir, *_H2))


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
    tags=("batch", "setop"),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minus / EXCEPT (table.scala:561)."""
    y96 = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    y97 = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_custkey")
    return set_ops.minus(y96, y97)


# ---------------------------------------------------------------------------
# Sort / offset / fetch (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@query(
    "sort_offset_fetch",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    OFFSET 100 LIMIT 50
    """,
    tags=("batch", "sort"),
)
def sort_offset_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + OFFSET + FETCH (table.scala:692,777,798; DataSetSort.scala:36).
    Range-partitioned sort; the offset+limit collapse driver-side to a top-150."""
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = sort_ops.order_by_offset_fetch(
        o, [F.desc("o_totalprice"), F.col("o_orderkey")], offset=100, fetch=50
    )
    return out.select("o_orderkey", F.round("o_totalprice", 2).alias("price"))


# ---------------------------------------------------------------------------
# UNNEST / correlate / UDx (SURVEY.md §2.9 UNNEST, §2.10)
# ---------------------------------------------------------------------------


@query(
    "unnest_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token
          FROM documents WHERE doc_id % 10 = 0) t
    GROUP BY token
    """,
    tags=("batch", "correlate"),
)
def unnest_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST of an array (LogicalUnnestRule, FlinkRuleSets.scala:120) →
    explode; stays in whole-stage codegen (split is a JVM expression)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    tokens = corr_ops.unnest(d.select(F.split("text", " ").alias("toks")), "toks", alias="token", keep=[])
    return tokens.groupBy("token").agg(F.count("*").alias("n"))


@query(
    "correlate_lateral_udtf",
    oracle="""
    SELECT doc_id, word, length(word) AS wlen
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 20) t
    """,
    tags=("batch", "correlate"),
)
def correlate_lateral_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableFunction via joinLateral (TableFunction.scala:82,
    DataStreamCorrelate.scala:38): the UDTF emits (word, wlen) rows per input
    row; expressed as an array<struct> column + explode so Catalyst keeps it
    codegen'd."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    udtf_col = F.transform(
        F.split("text", " "), lambda w: F.struct(w.alias("word"), F.length(w).cast("bigint").alias("wlen"))
    )
    return corr_ops.join_lateral(d, udtf_col, ["word", "wlen"], keep=["doc_id"])


@query(
    "udf_scalar_md5",
    oracle="""
    SELECT c_custkey, substr(md5(c_name), 1, 8) AS name_hash FROM customer
    """,
    tags=("batch", "udf"),
)
def udf_scalar_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ScalarFunction (ScalarFunction.scala:47) as an Arrow-vectorized pandas
    UDF — the slow path done the fast way (one Arrow hop, no per-row pickle)."""

    @F.pandas_udf("string")
    def md5_prefix(s: pd.Series) -> pd.Series:
        return s.map(lambda v: hashlib.md5(v.encode()).hexdigest()[:8])

    return T(spark, sf_dir, "customer").select(
        "c_custkey", md5_prefix(F.col("c_name")).alias("name_hash")
    )


@query(
    "udaf_geomean",
    oracle="""
    SELECT l_returnflag, round(exp(avg(ln(l_extendedprice))), 4) AS geomean_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("batch", "udf", "agg"),
)
def udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AggregateFunction UDAF (AggregateFunction.scala:97) — geometric mean.
    Expressed with built-in exp/avg/ln so it aggregates JVM-side with partial
    aggregation (the applyInPandas route exists in operators.aggregations for
    genuinely opaque accumulators; built-ins win whenever semantics allow)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.exp(F.avg(F.log("l_extendedprice"))), 4).alias("geomean_price"))
    )


@query(
    "agg_conditional_ratio",
    oracle="""
    SELECT round(100.0 * sum(CASE WHEN p_type IN ('type1', 'type2')
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("batch", "agg"),
)
def agg_conditional_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (CASE inside SUM) —
    one join + one global agg, no second pass."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").isin("type1", "type2"), rev).otherwise(F.lit(0.0))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count("*").alias("n"),
        )
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("batch", "agg", "exceeds"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEEDS the reference (no PIVOT in Flink 1.6): orders status × priority
    matrix via .pivot() — one pass, grouped hash agg with pivoted columns."""
    out = (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0)
    )
    return out.select(
        "o_orderpriority",
        F.col("F").alias("f_cnt"),
        F.col("O").alias("o_cnt"),
        F.col("P").alias("p_cnt"),
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n,
           round(CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS rev
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("batch", "join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join (exceeds the reference — Flink 1.6's
    PARTITION_HASH has no skew handling): the salt spreads any hot orderkey
    over 8 reducers; the result is identical to the plain equi-join, which is
    exactly what the oracle states."""
    from flink_1_6_0_spark.operators.joins import salted_join

    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = salted_join(l, o, "l_orderkey", "o_orderkey", salt=8)
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            # exact integer-cent sum: 1.2M-row money groups at the x10 tier
            # sit on the same fold-order knife edge join_theta_residual fell
            # off (fixed proactively r14)
            F.round(
                F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")).cast("double") / 100.0, 2
            ).alias("rev"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_windowed_stream",
    oracle="""
    SELECT a.event_id AS click_id, b.event_id AS purchase_id
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id
     AND time_bucket(INTERVAL 1 HOUR, a.ts) = time_bucket(INTERVAL 1 HOUR, b.ts)
    ORDER BY click_id, purchase_id
    """,
    tags=("batch", "join", "window"),
)
def join_windowed_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed join (JoinedStreams.java:126 where/equalTo/window/apply):
    clicks ⋈ purchases of the same user inside the same 1-hour tumbling
    window — the window-start is just an extra equi-key, so the physical
    plan stays a pure hash join (no range predicate)."""
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("b_event_id"), F.col("user_id").alias("b_user_id"), F.col("ts").alias("b_ts")
    )
    out = join_ops.windowed_join(
        clicks, buys, [("user_id", "b_user_id")], "ts", "b_ts", "1 hour"
    )
    return out.select(
        F.col("event_id").alias("click_id"), F.col("b_event_id").alias("purchase_id")
    ).orderBy("click_id", "purchase_id")


# ---------------------------------------------------------------------------
# As-of (point-in-time) join — engine extension tier
# ---------------------------------------------------------------------------


@query(
    "join_asof_events",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purch AS (SELECT user_id, ts, max(event_id) AS event_id, round(max(value), 2) AS value
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id AS click_id, c.user_id,
           p.event_id AS r_event_id, p.value AS r_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("batch", "join", "asof"),
    bench=True,
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's most recent
    prior-or-simultaneous purchase (the reference's temporal/point-in-time
    pattern, realized as one union-tag + window-fill plan — no range join;
    see operators/joins.asof_join). The right side is pre-deduped to unique
    (user_id, ts) so the as-of pick is deterministic in both engines."""
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"), F.round(F.max("value"), 2).alias("value"))
    )
    out = join_ops.asof_join(
        clicks, purch, key="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id", "value"], direction="backward",
    )
    return out.select(
        F.col("event_id").alias("click_id"), "user_id", "r_event_id", "r_value"
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH clicks AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
    purch AS (SELECT user_id, ts, max(event_id) AS event_id, round(max(value), 2) AS value
              FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
    SELECT c.event_id AS click_id, c.user_id,
           p.event_id AS r_event_id, p.value AS r_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    tags=("batch", "join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click paired with the user's next
    simultaneous-or-later purchase (the look-ahead direction of
    operators/joins.asof_join — same union-tag + window-fill plan with the
    sort reversed; DuckDB's ASOF with ts <= ts is the native oracle)."""
    e = T(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"), F.round(F.max("value"), 2).alias("value"))
    )
    out = join_ops.asof_join(
        clicks, purch, key="user_id", left_ts="ts", right_ts="ts",
        right_payload=["event_id", "value"], direction="forward",
    )
    return out.select(
        F.col("event_id").alias("click_id"), "user_id", "r_event_id", "r_value"
    )
