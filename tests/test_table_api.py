"""Table API façade + async I/O tests (SURVEY.md §3.2, §2.11)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_6_0_spark.streaming.async_io import async_enrich
from flink_1_6_0_spark.table_api import Table


def _t3(spark) -> Table:
    # the reference's canonical small 3-tuple fixture (StreamTestData.scala:34)
    rows = [(1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world")]
    return Table(spark.createDataFrame(rows, "a int, b long, c string"))


def test_select_where_string_exprs(spark):
    out = _t3(spark).select("a, c, a + 1 as a1").where("a > 1").to_data_frame()
    assert {(r.a, r.a1) for r in out.collect()} == {(2, 3), (3, 4)}


def test_group_by_agg(spark):
    out = _t3(spark).group_by("b").agg("count(a) as n", "sum(a) as s").to_data_frame()
    assert {(r.b, r.n, r.s) for r in out.collect()} == {(1, 1, 1), (2, 2, 5)}


def test_join_and_setops(spark):
    t = _t3(spark)
    other = Table(t.df.selectExpr("a as a2", "c as c2"))
    joined = t.join(other, "a = a2").select("a, c2").to_data_frame()
    assert joined.count() == 3
    assert t.union_all(t).count() == 6
    assert t.union(t).count() == 3
    assert t.minus_all(t).count() == 0
    assert t.intersect(t).count() == 3


def test_order_offset_fetch(spark):
    out = _t3(spark).order_by("a.desc").offset(1).fetch(1).to_data_frame()
    assert [r.a for r in out.collect()] == [2]


def test_window_tumble_fluent(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1.0), ("2024-01-01 00:40:00", 2.0), ("2024-01-01 01:10:00", 4.0)],
        "ts string, v double",
    ).selectExpr("cast(ts as timestamp) ts", "v")
    out = Table(df).window_tumble("ts", "1 hour").agg("sum(v) as s").to_data_frame()
    assert sorted(r.s for r in out.collect()) == [3.0, 4.0]


def test_rename_add_drop(spark):
    t = _t3(spark).add_columns("a * 2 as a2").rename_columns({"c": "text"}).drop_columns("b")
    assert set(t.df.columns) == {"a", "text", "a2"}


def test_async_enrich_ordered(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "x long")
    out = async_enrich(df, lambda v: f"svc:{v * 2}", "x", "enriched", capacity=8)
    rows = out.orderBy("x").collect()
    assert [r.enriched for r in rows] == [f"svc:{i * 2}" for i in range(20)]


def test_async_enrich_failure_yields_null(spark):
    def flaky(v):
        if v == 3:
            raise RuntimeError("boom")
        return str(v)

    df = spark.createDataFrame([(i,) for i in range(5)], "x long")
    out = async_enrich(df, flaky, "x", "e").orderBy("x").collect()
    assert [r.e for r in out] == ["0", "1", "2", None, "4"]


def test_table_api_over_window(spark):
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.table_api import Table

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)], "k long, seq long, v double"
    )
    out = (
        Table(df)
        .window_over(["k"], ["seq"])
        .with_agg(running_sum=F.sum("v"), running_n=F.count("*"))
        .to_data_frame()
    )
    got = {(r.k, r.seq, r.running_sum, r.running_n) for r in out.collect()}
    assert got == {(1, 1, 10.0, 1), (1, 2, 30.0, 2), (1, 3, 60.0, 3), (2, 1, 5.0, 1)}

    bounded = (
        Table(df)
        .window_over(["k"], ["seq"], preceding_rows=1)
        .with_agg(s2=F.sum("v"))
        .to_data_frame()
    )
    got2 = {(r.k, r.seq, r.s2) for r in bounded.collect()}
    assert got2 == {(1, 1, 10.0), (1, 2, 30.0), (1, 3, 50.0), (2, 1, 5.0)}


def test_limit_schema_and_sinks(spark, sf_dir, tmp_path):
    """table.scala surface parity: limit(offset, fetch), getSchema,
    insertInto (catalog sink), writeToSink (callable sink)."""
    from flink_1_6_0_spark.queries import T
    from flink_1_6_0_spark.table_api import Table

    t = Table(T(spark, sf_dir, "nation")).order_by("n_nationkey")
    lim = t.limit(5, 3)
    assert [r["n_nationkey"] for r in lim.df.collect()] == [5, 6, 7]
    assert t.get_schema()["n_name"].dataType.typeName() == "string"

    out = str(tmp_path / "sinkout")
    t.fetch(2).write_to_sink(lambda df: df.write.parquet(out))
    assert spark.read.parquet(out).count() == 2

    spark.sql("DROP TABLE IF EXISTS nation_sink")
    try:
        t.fetch(3).insert_into("nation_sink")
        assert spark.table("nation_sink").count() == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_sink")


def test_split_exprs_quote_aware(spark, sf_dir):
    from flink_1_6_0_spark.queries import T
    """Commas/parens inside string literals are data, not separators."""
    from flink_1_6_0_spark.table_api import Table, _split_exprs

    assert _split_exprs("'a,b' as s, c") == ["'a,b' as s", "c"]
    assert _split_exprs("instr(a, '(') , b") == ["instr(a, '(')", "b"]
    t = Table(T(spark, sf_dir, "region"))
    row = t.select("'a,b' as s, r_name").df.limit(1).collect()[0]
    assert row["s"] == "a,b"


def test_grouped_agg_comma_list_and_order_by_asc(spark, sf_dir):
    from flink_1_6_0_spark.queries import T
    from flink_1_6_0_spark.table_api import Table

    t = Table(T(spark, sf_dir, "nation"))
    out = t.group_by("n_regionkey").agg("count(n_name) as n, max(n_name) as m")
    assert set(out.df.columns) == {"n_regionkey", "n", "m"}
    asc = t.order_by("n_name.asc").df.limit(3).collect()
    desc = t.order_by("n_name.desc").df.limit(3).collect()
    assert [r["n_name"] for r in asc] == sorted(r["n_name"] for r in asc)
    assert asc[0]["n_name"] != desc[0]["n_name"]


def test_register_parquet_normalizes_events_ts(spark, sf_dir):
    import os

    from flink_1_6_0_spark.session import TableEnvironment

    env = TableEnvironment(spark)
    df = env.register_parquet("events_reg_test", os.path.join(sf_dir, "events.parquet"))
    assert df.schema["ts"].dataType.typeName() == "timestamp"  # not ntz/bigint


def test_env_scan_list_explain_sql_update(spark, tmp_path):
    from flink_1_6_0_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    te.register_table("te_src", spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    assert "te_src" in te.list_tables()
    t = te.scan("te_src")
    assert t.count() == 2
    assert "Scan" in te.explain(t)
    # sqlUpdate appends into a (V2-writable) saved table
    spark.sql("DROP TABLE IF EXISTS te_sink")
    (tmp_path / "te_sink").mkdir()
    spark.sql(f"CREATE TABLE te_sink (id BIGINT, s STRING) USING parquet LOCATION '{tmp_path}/te_sink'")
    te.sql_update("INSERT INTO te_sink SELECT id, s FROM te_src WHERE id > 1")
    assert spark.table("te_sink").count() == 1
    # parenthesized query form — valid in both Flink and Spark; the paren
    # group must NOT be consumed as a column list (r4 ADVICE)
    te.sql_update("INSERT INTO te_sink (SELECT id, s FROM te_src WHERE id = 1)")
    assert spark.table("te_sink").count() == 2
    # explicit column list still works
    te.sql_update("INSERT INTO te_sink (id, s) SELECT id, s FROM te_src WHERE id = 1")
    assert spark.table("te_sink").count() == 3
    # a ')' inside a string literal must not derail the outer-paren strip
    # (review finding: the depth scan skips quoted regions)
    te.sql_update(
        "INSERT INTO te_sink (SELECT id, concat(')', s) AS s FROM te_src WHERE id = 2)"
    )
    assert spark.table("te_sink").count() == 4
    assert spark.sql("SELECT count(*) c FROM te_sink WHERE s = ')b'").collect()[0]["c"] == 1
    # a ')' inside a DOUBLE-quoted literal must not close the depth scan
    # early (ADVICE r6: '"' was missing from the quote-skip set)
    te.sql_update(
        'INSERT INTO te_sink (SELECT id, concat(")", s) AS s FROM te_src WHERE id = 1)'
    )
    assert spark.table("te_sink").count() == 5
    assert spark.sql("SELECT count(*) c FROM te_sink WHERE s = ')a'").collect()[0]["c"] == 1
    # doubly-wrapped query: the strip loops until no outer pair remains
    te.sql_update("INSERT INTO te_sink ((SELECT id, s FROM te_src WHERE id = 2))")
    assert spark.table("te_sink").count() == 6
    spark.sql("DROP TABLE te_sink")


def test_descriptor_connect_csv_with_rowtime(spark, tmp_path):
    from flink_1_6_0_spark.descriptors import Csv, FileSystem, Rowtime, Schema
    from flink_1_6_0_spark.session import TableEnvironment

    p = tmp_path / "ev.csv"
    p.write_text("1,2024-01-01 00:00:00\n2,2024-01-01 00:00:05\n")
    te = TableEnvironment(spark)
    df = (
        te.connect(FileSystem().path(str(p)))
        .with_format(Csv().field("id", "LONG").field("ts", "SQL_TIMESTAMP"))
        .with_schema(
            Schema()
            .field("id", "LONG")
            .field("ts", "SQL_TIMESTAMP")
            .rowtime(Rowtime().timestamps_from_field("ts").watermarks_periodic_bounded(2000))
        )
        .register_table_source("desc_events")
    )
    assert [f.name for f in df.schema.fields] == ["id", "ts"]
    assert spark.sql("SELECT count(*) AS n FROM desc_events").collect()[0].n == 2
    assert te.rowtime_of("desc_events") == ("ts", "2.0 seconds")


def test_descriptor_connect_json(spark, tmp_path):
    from flink_1_6_0_spark.descriptors import FileSystem, Json, Schema
    from flink_1_6_0_spark.session import TableEnvironment

    p = tmp_path / "d.json"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    te = TableEnvironment(spark)
    df = (
        te.connect(FileSystem().path(str(p)))
        .with_format(Json())
        .with_schema(Schema().field("a", "LONG").field("b", "STRING"))
        .register_table_source("desc_json")
    )
    assert df.count() == 2 and dict(df.collect()) == {1: "x", 2: "y"}
