"""Ports of TimeAttributesITCase.scala — access and materialization of time
attributes (flink-table/src/test/scala/org/apache/flink/table/runtime/stream/
TimeAttributesITCase.scala).

Replayed as finite-stream batch semantics (the suite's own convention for
append-only finite inputs, same as tests/test_stream_sql_itcases.py): rowtime
is a TimestampType column built from the element's millisecond timestamp
(`assignTimestampsAndWatermarks(new TimestampWithEqualWatermark())`),
proctime is plans.time_attributes.with_proctime. Expected values compare on
unix_millis (the reference compares the string rendering of the same
instants).

The headline semantics pinned here: `w.rowtime` / TUMBLE_ROWTIME is
window.end − 1 ms and is itself a valid rowtime for a CASCADED second window
(testMultiWindow and the three MultiWindowSql variants).

Not ported (JVM type-system concerns with no Spark analog, declared here):
testCalcMaterializationWithPojoType/testPojoSupport (POJO field-order
mapping), testTableSourceWithTimeIndicators (DefinedRowtimeAttribute
TableSource plumbing — the rowtime/proctime descriptor path is pinned in
test_sources/test_plans instead), and the two atomic-type variants collapse
into one port (Spark has no atomic-vs-composite distinction).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from flink_1_6_0_spark.functions.udf import register_table_function
from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql
from flink_1_6_0_spark.plans.time_attributes import with_proctime
from flink_1_6_0_spark.table_api import Table

# TimeAttributesITCase.scala:52 — (timestamp ms, int, double, float, bigdec, string)
DATA = [
    (1, 1, 1.0, 1.0, 1, "Hi"),
    (2, 2, 2.0, 2.0, 2, "Hallo"),
    (3, 2, 2.0, 2.0, 2, "Hello"),
    (4, 5, 5.0, 5.0, 5, "Hello"),
    (7, 3, 3.0, 3.0, 3, "Hello"),
    (8, 3, 3.0, 3.0, 3, "Hello world"),
    (16, 4, 4.0, 4.0, 4, "Hello world"),
]


@pytest.fixture()
def table_df(spark):
    df = spark.createDataFrame(
        DATA, "ts long, int int, double double, float float, bigdec int, string string"
    )
    return df.select(
        F.timestamp_millis(F.col("ts")).alias("rowtime"),
        "int", "double", "float",
        F.col("bigdec").cast("decimal(10,0)").alias("bigdec"), "string",
    )


def ms(df, *cols):
    out = df
    for c in cols:
        out = out.withColumn(c, F.unix_millis(F.col(c)))
    return out


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_atomic_rowtime_access(spark):
    """TimeAttributesITCase.scala:61/:93 testAtomicType1+2 — a bare stream of
    longs becomes (rowtime, proctime); rowtime materializes as the original
    instants, proctime is filterable."""
    df = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 7, 8, 16]], "l long")
    t = with_proctime(df.withColumn("rowtime", F.timestamp_millis(F.col("l"))))
    out = t.filter(F.col("proctime").cast("long") >= 0).select("l", F.unix_millis("rowtime").alias("rt"))
    assert rows(out) == [(1, 1), (2, 2), (3, 3), (4, 4), (7, 7), (8, 8), (16, 16)]


def test_calc_materialization_floor_ceil(table_df):
    """TimeAttributesITCase.scala:125/:155 testCalcMaterialization(2) —
    rowtime survives a calc; floor/ceil to DAY materialize real timestamps."""
    t = (
        table_df.filter(F.unix_millis("rowtime") > 4)
        .select(
            "rowtime",
            F.date_trunc("day", F.col("rowtime")).alias("fl"),
            # ceil(DAY): next day boundary unless already on one
            (F.timestamp_millis(
                ((F.unix_millis("rowtime") + 86400000 - 1) / 86400000).cast("long") * 86400000
            )).alias("ce"),
        )
    )
    assert rows(ms(t, "rowtime", "fl", "ce")) == [
        (7, 0, 86400000),
        (8, 0, 86400000),
        (16, 0, 86400000),
    ]


def test_table_sink_with_rowtime(table_df, tmp_path):
    """TimeAttributesITCase.scala:182 testTableSink — the materialized
    rowtime row travels through a real sink unchanged."""
    t = table_df.filter(F.unix_millis("rowtime") > 4).select(
        "rowtime", F.date_trunc("day", F.col("rowtime")).alias("fl")
    )
    Table(t).write_to_sink(lambda df: df.write.parquet(f"{tmp_path}/sink"))
    back = t.sparkSession.read.parquet(f"{tmp_path}/sink")
    assert rows(ms(back, "rowtime", "fl")) == [(7, 0), (8, 0), (16, 0)]


def test_table_function_with_time_attributes(spark, table_df):
    """TimeAttributesITCase.scala:206 testTableFunction — a UDTF consuming
    (rowtime as long, proctime as timestamp, string): rowtime arrives as its
    millisecond value, proctime as a real post-epoch timestamp
    (TimeIndicatorConversionTest.scala:401 TableFunc)."""
    def func(time1, time2, s):
        yield (f"{time1}{'true' if time2.timestamp() > 0 else 'false'}{s}",)

    register_table_function(spark, "TableFunc", func, "s string")
    with_proctime(table_df).createOrReplaceTempView("T_taf")
    sql = rewrite_flink_sql(
        "SELECT rowtime, s FROM T_taf, "
        "LATERAL TABLE(TableFunc(unix_millis(rowtime), proctime, string)) AS T(s)"
    )
    out = ms(spark.sql(sql), "rowtime")
    assert rows(out) == [
        (1, "1trueHi"),
        (2, "2trueHallo"),
        (3, "3trueHello"),
        (4, "4trueHello"),
        (7, "7trueHello"),
        (8, "8trueHello world"),
        (16, "16trueHello world"),
    ]


def test_window_after_table_function(spark, table_df):
    """TimeAttributesITCase.scala:244 testWindowAfterTableFunction — rowtime
    stays a valid window time after the correlate; w.rowtime = end - 1ms."""
    def func(time1, time2, s):
        yield (f"{time1}{'true' if time2.timestamp() > 0 else 'false'}{s}",)

    register_table_function(spark, "TableFunc2", func, "s string")
    with_proctime(table_df).createOrReplaceTempView("T_waf")
    sql = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime, INTERVAL '0.005' SECOND) AS wr, COUNT(s) AS n "
        "FROM (SELECT rowtime, s FROM T_waf, "
        "      LATERAL TABLE(TableFunc2(unix_millis(rowtime), proctime, string)) AS T(s)) "
        "GROUP BY TUMBLE(rowtime, INTERVAL '0.005' SECOND)"
    )
    assert rows(ms(spark.sql(sql), "wr")) == [(4, 4), (9, 2), (19, 1)]


def test_union_preserves_rowtime(table_df):
    """TimeAttributesITCase.scala:275 testUnion — unionAll keeps the rowtime
    attribute; every instant appears twice."""
    t = Table(table_df).union_all(Table(table_df)).select("rowtime").to_data_frame()
    got = [r[0] for r in rows(ms(t, "rowtime"))]
    assert got == [1, 1, 2, 2, 3, 3, 4, 4, 7, 7, 8, 8, 16, 16]


def test_window_with_aggregation_on_rowtime(spark, table_df):
    """TimeAttributesITCase.scala:312 — COUNT(rowtime) grouped by a 3ms
    tumble: the rowtime attribute is aggregable."""
    table_df.createOrReplaceTempView("MyTable_taitc")
    sql = rewrite_flink_sql(
        "SELECT COUNT(rowtime) AS n FROM MyTable_taitc "
        "GROUP BY TUMBLE(rowtime, INTERVAL '0.003' SECOND)"
    )
    assert sorted(r[0] for r in spark.sql(sql).collect()) == [1, 2, 2, 2]


def test_multi_window_table_api(table_df):
    """TimeAttributesITCase.scala:341 testMultiWindow — w.rowtime (end-1ms)
    of a 2ms tumble feeds a second 4ms tumble."""
    first = (
        Table(table_df)
        .window_tumble("rowtime", "2 milliseconds", alias="w")
        .group_by()
        .agg("count(`int`) as `int`")
        .to_data_frame()
        .select(
            F.timestamp_millis(F.unix_millis(F.col("w_end")) - 1).alias("rowtime"),
            "int",
        )
    )
    second = (
        Table(first)
        .window_tumble("rowtime", "4 milliseconds", alias="w2")
        .group_by()
        .agg("count(`int`) as n")
        .to_data_frame()
        .select(
            (F.unix_millis(F.col("w2_end")) - 1).alias("wr"),
            F.unix_millis(F.col("w2_end")).alias("we"),
            "n",
        )
    )
    assert rows(second) == [(3, 4, 2), (7, 8, 2), (11, 12, 1), (19, 20, 1)]


def test_multi_window_sql_no_aggregation(spark, table_df):
    """TimeAttributesITCase.scala:374 — TUMBLE_ROWTIME cascades through two
    SQL windows with no aggregate columns."""
    table_df.createOrReplaceTempView("T_mw0")
    w1 = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime, INTERVAL '0.002' SECOND) AS rowtime, "
        "TUMBLE_END(rowtime, INTERVAL '0.002' SECOND) AS endtime FROM T_mw0 "
        "GROUP BY TUMBLE(rowtime, INTERVAL '0.002' SECOND)"
    )
    spark.sql(w1).createOrReplaceTempView("T_mw1")
    w2 = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime, INTERVAL '0.004' SECOND) AS wr, "
        "TUMBLE_END(rowtime, INTERVAL '0.004' SECOND) AS we FROM T_mw1 "
        "GROUP BY TUMBLE(rowtime, INTERVAL '0.004' SECOND)"
    )
    assert rows(ms(spark.sql(w2), "wr", "we")) == [(3, 4), (7, 8), (11, 12), (19, 20)]


def test_multi_window_sql_with_aggregation(spark, table_df):
    """TimeAttributesITCase.scala:413 — the same cascade as a single nested
    SQL query with COUNT at both levels."""
    table_df.createOrReplaceTempView("T_mwa")
    sql = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime, INTERVAL '0.004' SECOND) AS wr, "
        "TUMBLE_END(rowtime, INTERVAL '0.004' SECOND) AS we, COUNT(`int`) AS `int` "
        "FROM ( "
        "  SELECT COUNT(`int`) AS `int`, "
        "  TUMBLE_ROWTIME(rowtime, INTERVAL '0.002' SECOND) AS rowtime "
        "  FROM T_mwa GROUP BY TUMBLE(rowtime, INTERVAL '0.002' SECOND) "
        ") GROUP BY TUMBLE(rowtime, INTERVAL '0.004' SECOND)"
    )
    assert rows(ms(spark.sql(sql), "wr", "we")) == [
        (3, 4, 2), (7, 8, 2), (11, 12, 1), (19, 20, 1)
    ]


def test_multi_window_sql_with_aggregation_renamed(spark, table_df):
    """TimeAttributesITCase.scala:452 — the cascade with the inner rowtime
    RENAMED (rowtime1 → rowtime2): the attribute follows the alias."""
    table_df.select(F.col("rowtime").alias("rowtime1"), "int").createOrReplaceTempView("T_mwa2")
    sql = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime2, INTERVAL '0.004' SECOND) AS wr, "
        "TUMBLE_END(rowtime2, INTERVAL '0.004' SECOND) AS we, COUNT(`int`) AS `int` "
        "FROM ( "
        "  SELECT TUMBLE_ROWTIME(rowtime1, INTERVAL '0.002' SECOND) AS rowtime2, "
        "  COUNT(`int`) AS `int` "
        "  FROM T_mwa2 GROUP BY TUMBLE(rowtime1, INTERVAL '0.002' SECOND) "
        ") GROUP BY TUMBLE(rowtime2, INTERVAL '0.004' SECOND)"
    )
    assert rows(ms(spark.sql(sql), "wr", "we")) == [
        (3, 4, 2), (7, 8, 2), (11, 12, 1), (19, 20, 1)
    ]


def test_sql_window_rowtime(spark, table_df):
    """TimeAttributesITCase.scala:627 testSqlWindowRowtime — TUMBLE_ROWTIME
    alone renders end − 1ms."""
    table_df.createOrReplaceTempView("T_swr")
    sql = rewrite_flink_sql(
        "SELECT TUMBLE_ROWTIME(rowtime, INTERVAL '0.003' SECOND) AS wr FROM T_swr "
        "GROUP BY TUMBLE(rowtime, INTERVAL '0.003' SECOND)"
    )
    assert sorted(r[0] for r in ms(spark.sql(sql), "wr").collect()) == [2, 5, 8, 17]
