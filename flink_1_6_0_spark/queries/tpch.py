"""TPC-H-style headline queries (BASELINE.md benchmark set items 1-2).

Mirrors the reference's own TPC-H examples:
- Q3 — flink-examples-table/.../TPCHQuery3Table.scala:89-116 (filter + 2
  equi-joins + group agg + order by)
- Q10 — flink-examples-batch/.../relational/TPCHQuery10.java (4-way join +
  group agg + top-N)
- Q1 — the canonical groupBy-two-cols + 8 aggregates pricing summary.

Scale notes: each query is a straight declarative plan — Catalyst pushes the
date/segment filters into the parquet scans, prunes columns, and (with AQE)
broadcasts the dimension sides of the joins. No collects, no UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query

# ---------------------------------------------------------------------------
# Q1 — pricing summary. Reference capability: DataSet groupBy().aggregate
# (flink-java/.../DataSet.java:339-384) / SQL batch agg
# (flink-table/.../plan/nodes/dataset/DataSetAggregate.scala:40).
# ---------------------------------------------------------------------------

# Order-independent sums WITHOUT leaving whole-stage codegen's long-sum path:
# raw double sums flipped a cent-rounding boundary on real dbgen data (q1's
# sum_charge at sf10 — round-10 oracle run), and per-term DECIMAL sums fixed
# that but ran ~5x slower (sum(decimal(18,x)) widens past the long-backed
# precision). Instead each term — a product of <=2dp factors, so exactly
# representable at 2/4/6 decimals — is scaled to an integer (cents /
# basis-points / micro-units), rounded (the double sits within ~1e-7 of the
# true integer, so both engines round to the SAME long), and summed as
# BIGINT: exact, associative, and still a codegen long sum. The final
# value = round(double(sum)/scale, k) is computed from identical longs on
# both engines, so it cannot diverge. The integer conversion is
# floor(x*scale + 0.5) — NOT round(): Spark's ROUND routes doubles through
# BigDecimal per row, which benchmarked ~2.4x slower than the double-sum
# era, while floor stays in codegen. floor+half is exact here because every
# term is non-negative and within ~1e-7 of its true scaled integer. Overflow headroom: charge micro-units
# sum to ~1.8e18 at sf10's largest group — safe through roughly sf40 per
# group against the 9.2e18 long range (switch to decimal or hi/lo split
# sums beyond that).
_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  round(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty,
  round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
  round(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS sum_disc_price,
  round(CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0, 2) AS sum_charge,
  round(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_qty,
  round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_price,
  round(CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 4) AS avg_disc,
  count(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("tpch_q1", oracle=_Q1_ORACLE, tags=("batch", "agg"), bench=True)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))

    def as_units(col, scale):
        return F.floor(col * scale + F.lit(0.5)).cast("long")

    qty_c = F.sum(as_units(F.col("l_quantity"), 100))
    price_c = F.sum(as_units(F.col("l_extendedprice"), 100))
    disc_c = F.sum(as_units(F.col("l_discount"), 100))
    dp_bp = F.sum(as_units(disc_price, 10_000))
    charge_u = F.sum(as_units(charge, 1_000_000))
    cnt = F.count("*")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(qty_c.cast("double") / 100.0, 2).alias("sum_qty"),
            F.round(price_c.cast("double") / 100.0, 2).alias("sum_base_price"),
            F.round(dp_bp.cast("double") / 10_000.0, 2).alias("sum_disc_price"),
            F.round(charge_u.cast("double") / 1_000_000.0, 2).alias("sum_charge"),
            F.round(qty_c.cast("double") / 100.0 / cnt, 4).alias("avg_qty"),
            F.round(price_c.cast("double") / 100.0 / cnt, 4).alias("avg_price"),
            F.round(disc_c.cast("double") / 100.0 / cnt, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority. Reference: TPCHQuery3Table.scala:89-116; SQL batch
# join DataSetJoin.scala:51. (The testdata schema has no o_shippriority;
# o_orderpriority stands in.)
# ---------------------------------------------------------------------------

_Q3_ORACLE = """
SELECT
  l_orderkey,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("tpch_q3", oracle=_Q3_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1997-03-15 00:00:00").cast("timestamp")
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting. Reference: TPCHQuery10.java (4-way join +
# group agg + top-N).
# ---------------------------------------------------------------------------

_Q10_ORACLE = """
SELECT
  c_custkey,
  c_name,
  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
  round(c_acctbal, 2) AS c_acctbal,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("tpch_q10", oracle=_Q10_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 window sits in early 1995: dbgen assigns R/A return flags only to
    receipts before mid-1995, and the synthetic testdata's order dates start
    1995-01-01 — this quarter is the overlap where BOTH dialects yield
    returned lines, keeping the query non-vacuous on real distributions
    (spec's own 1993-10-01 quarter predates the synthetic data entirely)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", F.round("c_acctbal", 2).alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join + group agg (exercises join
# reordering + multi-dim broadcast).
# ---------------------------------------------------------------------------

_Q5_ORACLE = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation    ON s_nationkey = n_nationkey
JOIN region    ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("tpch_q5", oracle=_Q5_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style 6-way join (local supplier volume). The region/nation dims
    broadcast; the customer⋈orders⋈lineitem⋈supplier chain shuffles on its
    keys with AQE free to reorder."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: pure scan + filter + global agg (the
# pushdown/pruning stress case: 4 columns read, 3 filters pushed).
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@query("tpch_q6", oracle=_Q6_ORACLE, tags=("batch", "agg"), bench=True)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-style filter-heavy global aggregate — single pruned scan, all three
    predicates pushed to parquet, no shuffle beyond the 1-row final agg."""
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")), 2).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Q2-style — minimum-cost supplier. Reference capability: nested/correlated
# aggregate subquery over a join tree (flink-table batch SQL; the classic
# TPC-H Q2 shape). The testdata has no partsupp table, so supply cost is
# derived from lineitem: min unit price per (part, supplier). The correlated
# "cheapest in region" subquery becomes a window-min over p_partkey — same
# semantics, one shuffle instead of a re-join.
# ---------------------------------------------------------------------------

_Q2_ORACLE = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, round(min(l_extendedprice / l_quantity), 4) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_brand, supplycost
FROM part
JOIN supply   ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size <= 15 AND p_type LIKE 'SMALL%' AND r_name = 'EUROPE'
  AND supplycost = (
    SELECT min(ps2.supplycost) FROM supply ps2
    JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("tpch_q2", oracle=_Q2_ORACLE, tags=("batch", "join", "subquery"), bench=True)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-style min-cost supplier. The correlated scalar subquery (cheapest
    European supplier per part) is computed with a window MIN over the
    already-joined frame — Catalyst would otherwise rewrite the subquery into
    the same self-join; the window form shuffles the (small) eligible set
    once on p_partkey. Dims broadcast."""
    from pyspark.sql import Window

    # Prefix match, not equality: synthetic testdata uses single-word types
    # ("SMALL") while real dbgen emits "SMALL PLATED COPPER"-style — the
    # prefix hits both dialects, so the query is non-vacuous on real
    # distributions too (r10 verdict finding).
    p = T(spark, sf_dir, "part").filter((F.col("p_size") <= 15) & F.col("p_type").startswith("SMALL"))
    # The part predicate is per-part, so it commutes with the per-(part,supp)
    # aggregate AND the per-part window min: semi-join lineitem against the
    # filtered part keys FIRST — the groupBy shuffle then carries only the
    # eligible parts' rows instead of the whole table (at 100 TB this is the
    # difference between shuffling the full fact table and a slice of it).
    l = T(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4).alias("supplycost")
    )
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        supply.join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), supply.l_partkey == p.p_partkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "supplycost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two trading blocs. Reference capability:
# multi-way join + disjunctive cross-table predicate + year() bucketing
# (flink-table batch SQL). Adapted to regions (the synthetic supplier table
# is too thin at sf0.001 for a specific nation pair to trade).
# ---------------------------------------------------------------------------

_Q7_ORACLE = """
SELECT supp_region, cust_region, l_year,
       CAST(round(sum(CAST(volume AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM (
  SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2, region r1, region r2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
    AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
    AND ((r1.r_name = 'AFRICA' AND r2.r_name = 'AMERICA')
      OR (r1.r_name = 'AMERICA' AND r2.r_name = 'AFRICA'))
    AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 23:59:59'
) shipping
GROUP BY supp_region, cust_region, l_year
ORDER BY supp_region, cust_region, l_year
"""


@query("tpch_q7", oracle=_Q7_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style bidirectional trade volume. The nation→region lookups
    broadcast twice (supplier side, customer side); the disjunctive bloc
    predicate lands AFTER both joins, which Catalyst keeps as a post-join
    filter on two already-broadcast columns (cheap); the fact chain shuffles
    on its join keys; year() bucketing is JVM-side."""
    win_lo = F.lit("1995-01-01 00:00:00").cast("timestamp")
    win_hi = F.lit("1996-12-31 23:59:59").cast("timestamp")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_shipdate").between(win_lo, win_hi))
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region")
    # Both sides of the bloc disjunction live in {AFRICA, AMERICA}: restrict
    # each geo dim to those regions BEFORE touching the fact chain, so the
    # supplier broadcast join drops out-of-bloc lineitem early and the
    # customer-side shuffle carries only bloc customers.
    r = r.filter(F.col("r_name").isin("AFRICA", "AMERICA"))
    supp_geo = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    cust_geo = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    bloc = (
        (F.col("supp_region") == "AFRICA") & (F.col("cust_region") == "AMERICA")
    ) | ((F.col("supp_region") == "AMERICA") & (F.col("cust_region") == "AFRICA"))
    return (
        # broadcast the bloc-supplier map BEFORE the orders shuffle: the
        # map-side inner join drops out-of-bloc lineitem first, so the big
        # l⋈o exchange carries ~40% of the rows it otherwise would
        l.join(F.broadcast(supp_geo), l.l_suppkey == supp_geo.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cust_geo, o.o_custkey == cust_geo.c_custkey)
        .filter(bloc)
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_region", "cust_region", "l_year")
        # exact per-term DECIMAL(18,4) before the sum: the product of 2dp
        # price × 2dp discount has <=4 decimal digits, so the cast is exact
        # and the sum becomes order-independent — real-distribution dbgen
        # data landed the double-sum on a cent-rounding boundary (round-10
        # oracle run), a flip no partitioning change should be able to cause
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_region", "cust_region", "l_year")
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers. Reference capability: IN-subquery with
# grouped HAVING (flink-table batch SQL; semi-join rewrite,
# DataSetJoin.scala semi path).
# ---------------------------------------------------------------------------

_Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum(l_quantity) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


@query("tpch_q18", oracle=_Q18_ORACLE, tags=("batch", "join", "subquery"), bench=True)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style large-volume customers. o_orderkey is unique, so the HAVING
    subquery's per-order SUM *is* the final total_qty: ONE lineitem scan,
    one map-side-combined agg shuffle, HAVING filter, then the tiny
    surviving order set joins orders and customer (broadcast under AQE) —
    instead of scanning lineitem twice (semi join + re-aggregation)."""
    l = T(spark, sf_dir, "lineitem")
    big_orders = (
        l.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("total_qty")).filter(F.col("total_qty") > 300)
    )
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    return (
        big_orders.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )
