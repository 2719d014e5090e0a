"""Pure-SQL surface queries — the reference's sqlQuery() entry point
(TableEnvironment.scala:646) exercised with subquery shapes that Calcite
rewrites via SubQueryRemoveRule + RelDecorrelator (FlinkRuleSets.scala:36-38,
StreamTableEnvironment.scala:819). Catalyst's RewritePredicateSubquery /
decorrelation handles all of them; these queries prove the SQL text path
(not just the DataFrame API) end-to-end.

The same ANSI SQL runs on both engines, so oracle == query text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_1_6_0_spark.catalog import TABLES
from flink_1_6_0_spark.queries import T
from flink_1_6_0_spark.registry import query


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from flink_1_6_0_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    for t in ("customer", "orders", "lineitem", "part", "supplier", "nation", "region"):
        te.register_table(t, T(spark, sf_dir, t))
    return te.sql(text)


_IN_SUBQ = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders
  WHERE o_orderstatus = 'F' AND o_totalprice > 250000)
"""


@query("sql_in_subquery", oracle=_IN_SUBQ, tags=("batch", "sql", "join"))
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → semi join via the SQL text path."""
    return _sql(spark, sf_dir, _IN_SUBQ)


_EXISTS_CORR = """
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
"""


@query("sql_exists_correlated", oracle=_EXISTS_CORR, tags=("batch", "sql", "join"))
def sql_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS → decorrelated semi join (TPC-H Q4 shape)."""
    return _sql(spark, sf_dir, _EXISTS_CORR)


_SCALAR_CORR = """
SELECT p_partkey, p_brand
FROM part
WHERE p_retailprice > (
  SELECT 1.05 * avg(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = part.p_brand)
"""


@query("sql_scalar_correlated", oracle=_SCALAR_CORR, tags=("batch", "sql", "join"))
def sql_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-group average comparison) →
    decorrelated aggregate + join."""
    return _sql(spark, sf_dir, _SCALAR_CORR)


_NOT_IN = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey NOT IN (
  SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 49 AND l_discount > 0.09)
"""


@query("sql_not_in_subquery", oracle=_NOT_IN, tags=("batch", "sql", "join"))
def sql_not_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → null-aware anti join."""
    return _sql(spark, sf_dir, _NOT_IN)


_HAVING_SUBQ = """
SELECT o_orderkey, round(sum_qty, 2) AS sum_qty
FROM (
  SELECT o_orderkey, sum(l_quantity) AS sum_qty
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey
  HAVING sum(l_quantity) > 180) t
"""


@query("sql_having_groupagg", oracle=_HAVING_SUBQ, tags=("batch", "sql", "agg"))
def sql_having_groupagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING through SQL (TPC-H Q18 shape)."""
    return _sql(spark, sf_dir, _HAVING_SUBQ)
