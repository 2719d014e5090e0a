"""TPC-H completion — the 14 query shapes not already in queries/tpch.py.

With queries/tpch.py (Q1/Q2/Q3/Q5/Q6/Q7/Q10/Q18) this gives the engine the
full 22-query TPC-H relational surface, adapted to the driver's TPC-H-ish
schema (TESTDATA.md): there is no partsupp table (supply cost is derived as
min unit price per (part, supplier), as in Q2), and lineitem has no
commitdate/receiptdate/shipmode (lateness is expressed against o_orderdate;
priority buckets stand in for ship modes).

Reference capability anchors (what each shape exercises in the reference):
- EXISTS / NOT EXISTS decorrelation — flink-table
  FlinkRuleSets.scala (SubQueryRemoveRule), DataSetJoin semi/anti paths.
- scalar subqueries — DataSetSingleRowJoin.scala.
- conditional aggregation / CASE — code-gen'd Calc + aggregate
  (DataSetCalc.scala, DataSetAggregate.scala).
- left outer join + two-level aggregate — DataSetJoin.scala outer path.

Scale notes: every query is declarative (no UDFs, no collects). Dimension
sides broadcast; fact-fact joins shuffle on their keys with AQE free to
re-plan; scalar subqueries become broadcast nested-loop joins of 1-row
aggregates (no driver round-trip).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query

# ---------------------------------------------------------------------------
# Q4 — order priority checking. EXISTS(correlated, cross-column predicate)
# → left-semi join with a join condition spanning both sides.
# Lateness stand-in: a lineitem shipped >60 days after the order date.
# ---------------------------------------------------------------------------

_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("tpch_q4", oracle=_Q4_ORACLE, tags=("batch", "subquery", "semi-join"))
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS becomes a left-semi join whose condition references both sides
    (l_shipdate > o_orderdate + 60 days) — Spark evaluates it as a semi
    hash-join on o_orderkey with the residual cross-side predicate."""
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    l = T(spark, sf_dir, "lineitem")
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: ratio-of-conditional-sum over a 7-way join.
# ---------------------------------------------------------------------------

_Q8_ORACLE = """
SELECT o_year,
       round(CAST(sum(CAST(CASE WHEN nation = (SELECT min(n_name) FROM nation) THEN volume ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
    AND p_type LIKE 'ECONOMY%'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("tpch_q8", oracle=_Q8_ORACLE, tags=("batch", "join", "agg"))
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share of one supplier nation inside one customer region.
    Both geography lookups broadcast (nation×region are tiny); the
    customer-region restriction is a broadcast semi join on o_custkey, so the
    big lineitem⋈orders shuffle carries only surviving rows.

    Dialect tolerance (r10 verdict): the subject nation is min(n_name) —
    a 1-row broadcast, not a driver collect — instead of a name literal,
    and the part filter is a type-family prefix match, so the numerator is
    non-zero on both the synthetic ("NATION_i"/"ECONOMY") and real dbgen
    ("BRAZIL"/"ECONOMY ANODIZED STEEL") dialects."""
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_america = (
        T(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nat = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(T(spark, sf_dir, "nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type").startswith("ECONOMY")).select("p_partkey")
    subject = T(spark, sf_dir, "nation").agg(F.min("n_name").alias("subject_nation"))
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    )
    l = T(spark, sf_dir, "lineitem")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_america), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), F.col("l_suppkey") == F.col("s_suppkey"))
        .crossJoin(F.broadcast(subject))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == F.col("subject_nation"), volume)
                    .otherwise(F.lit(0.0))
                    .cast("decimal(18,4)")
                ).cast("double")
                / F.sum(volume.cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit. Supply cost derived (no partsupp): min unit
# price per (part, supplier), as in queries/tpch.py Q2.
# ---------------------------------------------------------------------------

_Q9_ORACLE = """
WITH supply AS (
  SELECT l_partkey AS sp_partkey, l_suppkey AS sp_suppkey,
         min(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY 1, 2
)
SELECT nation, o_year,
       CAST(round(sum(CAST(amount AS DECIMAL(30, 6))), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) - supplycost * l_quantity AS amount
  FROM lineitem
  JOIN supply   ON sp_partkey = l_partkey AND sp_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE 'red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("tpch_q9", oracle=_Q9_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per year over 'red%' parts. The supply-cost
    sub-aggregate reuses the same lineitem scan (Spark caches the file
    listing; the two scans both prune to the needed columns). The part filter
    broadcasts; the supply agg shrinks via map-side partial agg before its
    shuffle on (partkey, suppkey)."""
    l = T(spark, sf_dir, "lineitem")
    p = T(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    # The partkey filter commutes with the (partkey, suppkey) groupBy, so the
    # supply-cost aggregate only needs red-part rows — ~10x less shuffle than
    # aggregating the full table (the oracle states it over full lineitem;
    # results for red parts are identical).
    red_l = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    # Window MIN instead of a separate groupBy + re-join: one shuffle on
    # (partkey, suppkey) and ONE scan of lineitem. No rounding: MIN of an
    # IEEE division is bit-identical across engines, while round(double, 4)
    # boundary behavior is not.
    w = Window.partitionBy("l_partkey", "l_suppkey")
    with_cost = red_l.withColumn(
        "supplycost", F.min(F.col("l_extendedprice") / F.col("l_quantity")).over(w)
    )
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col("supplycost") * F.col(
        "l_quantity"
    )
    return (
        with_cost.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            # Sum in exact decimal: double summation order differs between
            # engines, and the price-minus-cost amounts cancel enough for the
            # last ulp to cross a cent-rounding boundary.
            F.round(F.sum(F.col("amount").cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.desc("o_year"))
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: grouped HAVING against a scalar subquery over the
# same derivation (fraction-of-total threshold).
# ---------------------------------------------------------------------------

_Q11_ORACLE = """
WITH asia_lines AS (
  SELECT l_partkey, l_extendedprice
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
SELECT l_partkey AS p_partkey,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS part_value
FROM asia_lines
GROUP BY l_partkey
HAVING CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
     > (SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) * 2.0
               / count(DISTINCT l_partkey)
        FROM asia_lines)
ORDER BY part_value DESC, p_partkey
"""


@query("tpch_q11", oracle=_Q11_ORACLE, tags=("batch", "subquery", "agg"))
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction-of-total HAVING. The scalar total is a 1-row aggregate
    broadcast into a nested-loop join (no driver collect); the per-part and
    total aggregates share one scan of the region-restricted lines.

    Threshold is mean-relative (parts above 2x the mean part value) rather
    than a fixed fraction of the grand total: the spec's 0.0001/SF numerator
    shrinks with scale factor precisely so the passing set stays meaningful —
    a fixed fraction over a growing part population returns 0 rows at dbgen
    sf1+ (r10 verdict finding). 2x-mean is the same "significant share"
    intent expressed scale-invariantly: non-vacuous at synthetic
    sf0.001/0.01/0.1 AND dbgen sf1/sf10."""
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    lines = (
        T(spark, sf_dir, "lineitem")
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("l_partkey", "l_extendedprice")
    )
    per_part = lines.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("v_raw")
    )
    # count("*") over per_part == count(DISTINCT l_partkey) over the lines —
    # reusing the grouped frame avoids a second distinct aggregation.
    total = per_part.agg(
        (F.sum("v_raw").cast("double") * 2.0 / F.count("*")).alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("v_raw") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("v_raw", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — priority buckets (ship-mode stand-in): conditional counts per
# return flag for lines shipped within a year window.
# ---------------------------------------------------------------------------

_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("tpch_q12", oracle=_Q12_ORACLE, tags=("batch", "join", "agg"))
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = T(spark, sf_dir, "orders")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution: LEFT OUTER join with an extra
# join-condition predicate, then a two-level aggregate.
# ---------------------------------------------------------------------------

_Q13_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@query("tpch_q13", oracle=_Q13_ORACLE, tags=("batch", "join", "agg"), bench=True)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-equi part of the outer-join condition (priority filter) stays
    in the join, NOT a post-filter — pushing it below the join would turn
    no-match customers into dropped rows instead of count 0."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# Q14 — promo revenue: conditional-sum ratio over a fact⋈dim join.
# ---------------------------------------------------------------------------

_Q14_ORACLE = """
SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


@query("tpch_q14", oracle=_Q14_ORACLE, tags=("batch", "join", "agg"))
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)).cast("decimal(18,4)")).cast("double")
                / F.sum(rev.cast("decimal(18,4)")).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: derived revenue view + scalar MAX subquery equality.
# ---------------------------------------------------------------------------

_Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("tpch_q15", oracle=_Q15_ORACLE, tags=("batch", "subquery", "agg"))
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAX scalar subquery is a 1-row broadcast joined back to the
    (rounded) revenue view — equality on the 2-decimal rounded value is
    engine-stable, unlike raw float sums."""
    l = T(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2
        )
        .cast("double")
        .alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = T(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier diversity per part attribute: NOT IN subquery + COUNT
# DISTINCT over grouped part attributes.
# ---------------------------------------------------------------------------

_Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#15' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("tpch_q16", oracle=_Q16_ORACLE, tags=("batch", "subquery", "agg"))
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null key list = broadcast left-anti join."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#15")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad_supp = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    l = T(spark, sf_dir, "lineitem").join(
        F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: correlated AVG subquery per part.
# ---------------------------------------------------------------------------

_Q17_ORACLE = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND p_size < 10
  AND l_quantity < (
    SELECT 0.5 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey)
"""


@query("tpch_q17", oracle=_Q17_ORACLE, tags=("batch", "subquery", "window"))
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated per-part AVG becomes a window aggregate over the
    part-restricted lines: after the broadcast part-filter join, every
    remaining row's partition holds exactly the subquery's l2 set, so one
    window pass replaces a self-join + re-shuffle."""
    p = T(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 10)
    ).select("p_partkey")
    l = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue: disjunction of cross-table conjunctions.
# ---------------------------------------------------------------------------

_Q19_ORACLE = """
SELECT CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@query("tpch_q19", oracle=_Q19_ORACLE, tags=("batch", "join"), bench=True)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive cross-table predicate. Catalyst extracts the common
    per-table implications (p_brand IN (...), p_size <= 15, l_quantity
    BETWEEN 1 AND 30) and pushes them into both scans; the full disjunction
    evaluates as the join residual."""
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem")
    cond = (
        (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")), 2
            )
            .cast("double")
            .alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion: nested IN subqueries (part-name list →
# grouped HAVING over shipments → supplier membership).
# ---------------------------------------------------------------------------

_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING sum(l_quantity) > 100)
ORDER BY s_suppkey
"""


@query("tpch_q20", oracle=_Q20_ORACLE, tags=("batch", "subquery", "semi-join"))
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two nested INs = two chained semi joins; the inner one is evaluated
    first against the shrunken (red-parts, one-year) lineitem slice so the
    grouped HAVING aggregates the minimum number of rows."""
    red_parts = (
        T(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    )
    shipped = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(shipped), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting: EXISTS + correlated NOT EXISTS
# (the only late supplier on a multi-supplier order).
# ---------------------------------------------------------------------------

_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders, nation, region
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@query("tpch_q21", oracle=_Q21_ORACLE, tags=("batch", "subquery", "agg"), bench=True)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS/NOT EXISTS pair collapsed into ONE per-order aggregate pass:
    count distinct suppliers and distinct LATE suppliers per finished order;
    qualifying orders have >=2 suppliers but exactly 1 late one. That turns
    two correlated subqueries (two extra joins against lineitem) into a
    single reduced-size semi join — the same decorrelation the reference's
    Calcite rules aim for, chosen manually for one shuffle less."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = l.join(o, F.col("o_orderkey") == F.col("l_orderkey")).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    # Single pass: annotate each line with its order's distinct-supplier and
    # distinct-late-supplier counts via window collect_sets — one shuffle on
    # l_orderkey and ONE scan of lineitem, instead of a groupBy + semi join
    # that materializes the l⋈o frame twice.
    w = Window.partitionBy("l_orderkey")
    annotated = lo.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        annotated.filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(asia_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity: scalar AVG subquery + anti join
# (customers above average balance with no recent orders).
# ---------------------------------------------------------------------------

_Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS ab FROM customer
  WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
)
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > ab
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '1999-06-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


@query("tpch_q22", oracle=_Q22_ORACLE, tags=("batch", "subquery", "anti-join"))
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS = left-anti join against the date-restricted orders slice;
    the scalar average broadcasts as a 1-row frame (no collect)."""
    nations = (1, 3, 5, 7, 9, 11, 13)
    c = T(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(*nations))
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("ab")
    )
    recent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-06-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(F.broadcast(recent), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,2)")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
