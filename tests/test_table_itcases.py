"""Golden-output ports of the reference's batch Table/SQL ITCases
(flink-table/src/test/.../runtime/batch/sql/*.scala).

Each test runs the reference's SQL (modulo documented dialect mappings —
Calcite UNNEST becomes LATERAL VIEW explode, etc.) over the canonical
CollectionDataSets fixtures and asserts the exact expected row multiset
from its ``compareResultAsText`` call, translated from the Scala expected
string into Python tuples (null -> None). SURVEY.md §5 layer 4 for the
relational tier, mirroring tests/test_cep_itcases.py for CEP."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tenv(spark):
    """Register the CollectionDataSets fixtures as temp views:
    - T3: get3TupleDataSet (21 rows) as (a, b, c)
    - SMALL3: getSmall3TupleDataSet (3 rows) as (a, b, c)
    - T5: get5TupleDataSet (15 rows) as (d, e, f, g, h)
    (CollectionDataSets.scala:50,64,75 — same rows as StreamTestData)."""
    rows3 = [
        (1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world"),
        (4, 3, "Hello world, how are you?"), (5, 3, "I am fine."),
        (6, 3, "Luke Skywalker"),
    ] + [
        (i, {7: 4, 8: 4, 9: 4, 10: 4, 11: 5, 12: 5, 13: 5, 14: 5, 15: 5}.get(i, 6), f"Comment#{i - 6}")
        for i in range(7, 22)
    ]
    rows5 = [
        (1, 1, 0, "Hallo", 1),
        (2, 2, 1, "Hallo Welt", 2),
        (2, 3, 2, "Hallo Welt wie", 1),
        (3, 4, 3, "Hallo Welt wie gehts?", 2),
        (3, 5, 4, "ABC", 2),
        (3, 6, 5, "BCD", 3),
        (4, 7, 6, "CDE", 2),
        (4, 8, 7, "DEF", 1),
        (4, 9, 8, "EFG", 1),
        (4, 10, 9, "FGH", 2),
        (5, 11, 10, "GHI", 1),
        (5, 12, 11, "HIJ", 3),
        (5, 13, 12, "IJK", 3),
        (5, 14, 13, "JKL", 2),
        (5, 15, 14, "KLM", 2),
    ]
    spark.createDataFrame(rows3, "a int, b long, c string").createOrReplaceTempView("T3")
    spark.createDataFrame(rows3[:3], "a int, b long, c string").createOrReplaceTempView("SMALL3")
    spark.createDataFrame(rows5, "d int, e long, f int, g string, h long").createOrReplaceTempView("T5")
    return spark


def _key(t):
    return tuple((v is None, v) for v in t)


def rows_of(df):
    return sorted((tuple(r) for r in df.collect()), key=_key)


def exp(rows):
    return sorted((tuple(r) for r in rows), key=_key)


# ---------------------------------------------------------------------------
# JoinITCase.scala (batch/sql) — equi/theta/outer/single-row joins + UNNEST
# ---------------------------------------------------------------------------


def test_inner_join(tenv):
    """JoinITCase.scala:42."""
    got = tenv.sql("SELECT c, g FROM SMALL3, T5 WHERE b = e")
    assert rows_of(got) == exp([
        ("Hi", "Hallo"), ("Hello", "Hallo Welt"), ("Hello world", "Hallo Welt"),
    ])


def test_inner_join_with_filter(tenv):
    """JoinITCase.scala:60."""
    got = tenv.sql("SELECT c, g FROM SMALL3, T5 WHERE b = e AND b < 2")
    assert rows_of(got) == exp([("Hi", "Hallo")])


def test_inner_join_with_non_equi_predicate(tenv):
    """JoinITCase.scala:80."""
    got = tenv.sql("SELECT c, g FROM T3, T5 WHERE b = e AND a < 6 AND h < b")
    assert rows_of(got) == exp([
        ("Hello world, how are you?", "Hallo Welt wie"),
        ("I am fine.", "Hallo Welt wie"),
    ])


def test_inner_join_with_multiple_keys(tenv):
    """JoinITCase.scala:100."""
    got = tenv.sql("SELECT c, g FROM T3, T5 WHERE a = d AND b = h")
    assert rows_of(got) == exp([
        ("Hi", "Hallo"), ("Hello", "Hallo Welt"),
        ("Hello world", "Hallo Welt wie gehts?"), ("Hello world", "ABC"),
        ("I am fine.", "HIJ"), ("I am fine.", "IJK"),
    ])


def test_inner_join_with_alias(tenv):
    """JoinITCase.scala:123 — Table5 re-aliased so its LONG h column is
    named c; the projection list quotes an exotic column name."""
    tenv.sql("SELECT d, e, f, g, h AS c FROM T5").createOrReplaceTempView("Table5x")
    got = tenv.sql(
        "SELECT Table5x.c, T.`1-_./Ü` FROM "
        "(SELECT a, b, c AS `1-_./Ü` FROM T3) AS T, Table5x "
        "WHERE a = d AND a < 4"
    )
    assert rows_of(got) == exp([
        (1, "Hi"), (2, "Hello"), (1, "Hello"),
        (2, "Hello world"), (2, "Hello world"), (3, "Hello world"),
    ])


@pytest.mark.parametrize("proj", ["COUNT(g), COUNT(b)", "COUNT(b), COUNT(g)"])
def test_inner_join_with_aggregation(tenv, proj):
    """JoinITCase.scala:143,:164."""
    got = tenv.sql(f"SELECT {proj} FROM SMALL3, T5 WHERE a = d")
    assert rows_of(got) == [(6, 6)]


def test_full_outer_join(tenv):
    """JoinITCase.scala:185."""
    got = tenv.sql("SELECT c, g FROM SMALL3 FULL OUTER JOIN T5 ON b = e")
    assert rows_of(got) == exp(
        [("Hi", "Hallo"), ("Hello", "Hallo Welt"), ("Hello world", "Hallo Welt")]
        + [(None, g) for g in (
            "Hallo Welt wie", "Hallo Welt wie gehts?", "ABC", "BCD", "CDE",
            "DEF", "EFG", "FGH", "GHI", "HIJ", "IJK", "JKL", "KLM",
        )]
    )


def test_left_outer_join(tenv):
    """JoinITCase.scala:208 — T5 LEFT OUTER JOIN SMALL3."""
    got = tenv.sql("SELECT c, g FROM T5 LEFT OUTER JOIN SMALL3 ON b = e")
    assert rows_of(got) == exp(
        [("Hi", "Hallo"), ("Hello", "Hallo Welt"), ("Hello world", "Hallo Welt")]
        + [(None, g) for g in (
            "Hallo Welt wie", "Hallo Welt wie gehts?", "ABC", "BCD", "CDE",
            "DEF", "EFG", "FGH", "GHI", "HIJ", "IJK", "JKL", "KLM",
        )]
    )


def test_right_outer_join(tenv):
    """JoinITCase.scala:230."""
    got = tenv.sql("SELECT c, g FROM SMALL3 RIGHT OUTER JOIN T5 ON b = e")
    assert rows_of(got) == exp(
        [("Hi", "Hallo"), ("Hello", "Hallo Welt"), ("Hello world", "Hallo Welt")]
        + [(None, g) for g in (
            "Hallo Welt wie", "Hallo Welt wie gehts?", "ABC", "BCD", "CDE",
            "DEF", "EFG", "FGH", "GHI", "HIJ", "IJK", "JKL", "KLM",
        )]
    )


def test_cross_join_with_left_single_row_input(tenv):
    """JoinITCase.scala:252."""
    got = tenv.sql("SELECT * FROM (SELECT count(*) FROM SMALL3) CROSS JOIN SMALL3")
    assert rows_of(got) == exp([
        (3, 1, 1, "Hi"), (3, 2, 2, "Hello"), (3, 3, 2, "Hello world"),
    ])


def test_cross_join_with_right_single_row_input(tenv):
    """JoinITCase.scala:267."""
    got = tenv.sql("SELECT * FROM SMALL3 CROSS JOIN (SELECT count(*) FROM SMALL3)")
    assert rows_of(got) == exp([
        (1, 1, "Hi", 3), (2, 2, "Hello", 3), (3, 2, "Hello world", 3),
    ])


def test_cross_join_with_empty_single_row_input(tenv):
    """JoinITCase.scala:284."""
    got = tenv.sql(
        "SELECT * FROM SMALL3 CROSS JOIN (SELECT count(*) FROM SMALL3 HAVING count(*) < 0)"
    )
    assert got.count() == 0


def test_left_null_right_join(tenv):
    """JoinITCase.scala:297 — an empty single-row derived table on the
    build side of a theta RIGHT JOIN."""
    got = tenv.sql(
        "SELECT d, cnt FROM "
        "(SELECT cnt FROM (SELECT COUNT(*) AS cnt FROM SMALL3) WHERE cnt < 0) "
        "RIGHT JOIN T5 ON d < cnt"
    )
    assert rows_of(got) == exp(
        [(1, None)] + [(2, None)] * 2 + [(3, None)] * 3 + [(4, None)] * 4 + [(5, None)] * 5
    )


def test_left_single_right_join_equal_predicate(tenv):
    """JoinITCase.scala:325."""
    got = tenv.sql(
        "SELECT d, cnt FROM (SELECT COUNT(*) AS cnt FROM SMALL3) RIGHT JOIN T5 ON cnt = d"
    )
    assert rows_of(got) == exp(
        [(1, None)] + [(2, None)] * 2 + [(3, 3)] * 3 + [(4, None)] * 4 + [(5, None)] * 5
    )


def test_left_single_right_join_not_equal_predicate(tenv):
    """JoinITCase.scala:353."""
    got = tenv.sql(
        "SELECT d, cnt FROM (SELECT COUNT(*) AS cnt FROM SMALL3) RIGHT JOIN T5 ON cnt > d"
    )
    assert rows_of(got) == exp(
        [(1, 3)] + [(2, 3)] * 2 + [(3, None)] * 3 + [(4, None)] * 4 + [(5, None)] * 5
    )


def test_right_null_left_join(tenv):
    """JoinITCase.scala:381."""
    got = tenv.sql(
        "SELECT a, cnt FROM SMALL3 LEFT JOIN "
        "(SELECT cnt FROM (SELECT COUNT(*) AS cnt FROM T5) WHERE cnt < 0) ON cnt > a"
    )
    assert rows_of(got) == exp([(1, None), (2, None), (3, None)])


def test_right_single_left_join_equal_predicate(tenv):
    """JoinITCase.scala:409."""
    got = tenv.sql(
        "SELECT d, cnt FROM T5 LEFT JOIN (SELECT COUNT(*) AS cnt FROM SMALL3) ON cnt = d"
    )
    assert rows_of(got) == exp(
        [(1, None)] + [(2, None)] * 2 + [(3, 3)] * 3 + [(4, None)] * 4 + [(5, None)] * 5
    )


def test_right_single_left_join_not_equal_predicate(tenv):
    """JoinITCase.scala:434."""
    got = tenv.sql(
        "SELECT d, cnt FROM T5 LEFT JOIN (SELECT COUNT(*) AS cnt FROM SMALL3) ON cnt < d"
    )
    assert rows_of(got) == exp(
        [(1, None)] + [(2, None)] * 2 + [(3, None)] * 3 + [(4, 3)] * 4 + [(5, 3)] * 5
    )


def test_right_single_left_join_two_fields(tenv):
    """JoinITCase.scala:446."""
    got = tenv.sql(
        "SELECT d, cnt, cnt2 FROM T5 LEFT JOIN "
        "(SELECT COUNT(*) AS cnt, COUNT(*) AS cnt2 FROM SMALL3) AS x ON d = cnt"
    )
    assert rows_of(got) == exp(
        [(1, None, None)] + [(2, None, None)] * 2 + [(3, 3, 3)] * 3
        + [(4, None, None)] * 4 + [(5, None, None)] * 5
    )


def test_cross_with_unnest(tenv):
    """JoinITCase.scala:471 — Calcite ``UNNEST(T.c) AS A (s)`` maps to
    Spark's LATERAL VIEW explode."""
    tenv.createDataFrame(
        [(1, 1, ["Hi", "w"]), (2, 2, ["Hello", "k"]), (3, 2, ["Hello world", "x"])],
        "a int, b long, c array<string>",
    ).createOrReplaceTempView("UT")
    got = tenv.sql("SELECT a, s FROM UT LATERAL VIEW explode(c) A AS s")
    assert rows_of(got) == exp([
        (1, "Hi"), (1, "w"), (2, "Hello"), (2, "k"), (3, "Hello world"), (3, "x"),
    ])


def test_join_with_unnest_of_tuple(tenv):
    """JoinITCase.scala:494 — unnest an array of (int, string) structs with
    a correlated residual predicate."""
    tenv.createDataFrame(
        [
            (1, [(12, "45.6"), (2, "45.612")]),
            (2, [(13, "41.6"), (1, "45.2136")]),
            (3, [(18, "42.6")]),
        ],
        "a int, b array<struct<x: int, y: string>>",
    ).createOrReplaceTempView("UTT")
    got = tenv.sql(
        "SELECT a, A.s.x AS x, A.s.y AS y FROM "
        "(SELECT a, b FROM UTT WHERE a < 3) tf "
        "LATERAL VIEW explode(tf.b) A AS s WHERE A.s.x > a"
    )
    assert rows_of(got) == exp([
        (1, 12, "45.6"), (1, 2, "45.612"), (2, 13, "41.6"),
    ])


# ---------------------------------------------------------------------------
# AggregateITCase.scala (batch/sql). Calcite's integer AVG truncates toward
# zero, so integer avg columns carry an explicit CAST here (Spark's avg is
# always DOUBLE); the window queries run the VERBATIM Flink SQL through the
# rewrite_flink_sql frontend. The two UDAGG columns (countFun,
# wAvgWithMergeAndReset) are dropped from the window aggregates — the UDAF
# contract is covered by test_udf_ml.py — keeping the golden values of the
# remaining columns.
# ---------------------------------------------------------------------------

from datetime import datetime

from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql


def _ts(s):
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S.%f")


@pytest.fixture(scope="module")
def t3ts(tenv):
    """T3 with ts = a seconds (AggregateITCase's toTimestamp(x._1 * 1000))."""
    tenv.sql(
        "SELECT a, b, c, CAST(a AS TIMESTAMP) AS ts FROM T3"
    ).createOrReplaceTempView("T3TS")
    return tenv


def test_aggregation_types(tenv):
    """AggregateITCase.scala:45."""
    got = tenv.sql(
        "SELECT sum(a), min(a), max(a), count(a), CAST(avg(a) AS INT) FROM T3"
    )
    assert rows_of(got) == [(231, 1, 21, 21, 11)]


def test_aggregation_data_types(tenv):
    """AggregateITCase.scala:99 — mixed numeric widths + string min/max +
    literal aggregates + decimal sum."""
    tenv.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, "Hello"), (2, 2, 2, 2, 2.0, 2.0, "Ciao")],
        "a tinyint, b smallint, c int, d long, e float, f double, g string",
    ).createOrReplaceTempView("AggTypes")
    got = tenv.sql(
        "SELECT CAST(avg(a) AS TINYINT), CAST(avg(b) AS SMALLINT), "
        "CAST(avg(c) AS INT), CAST(avg(d) AS LONG), avg(e), avg(f), count(g), "
        "min(g), min('Ciao'), max(g), max('Ciao'), sum(CAST(f AS DECIMAL(10,1))) "
        "FROM AggTypes"
    )
    row = rows_of(got)[0]
    assert row[:7] == (1, 1, 1, 1, 1.5, 1.5, 2)
    assert row[7:11] == ("Ciao", "Ciao", "Hello", "Ciao")
    assert float(row[11]) == 3.0


def test_table_projection_agg(tenv):
    """AggregateITCase.scala:120."""
    tenv.createDataFrame(
        [(1, 1), (2, 2)], "a tinyint, b smallint"
    ).createOrReplaceTempView("Proj2")
    got = tenv.sql(
        "SELECT CAST(avg(a) AS TINYINT), sum(a), count(a), "
        "CAST(avg(b) AS SMALLINT), sum(b) FROM Proj2"
    )
    assert rows_of(got) == [(1, 3, 2, 1, 3)]


def test_table_aggregation_with_arithmetic(tenv):
    """AggregateITCase.scala:139."""
    tenv.createDataFrame(
        [(1.0, "Hello"), (2.0, "Ciao")], "a float, b string"
    ).createOrReplaceTempView("Arith2")
    got = tenv.sql("SELECT avg(a + 2) + 2, count(b) + 5 FROM Arith2")
    assert rows_of(got) == [(5.5, 7)]


def test_aggregation_with_two_count(tenv):
    """AggregateITCase.scala:158."""
    tenv.createDataFrame(
        [(1.0, "Hello"), (2.0, "Ciao")], "a float, b string"
    ).createOrReplaceTempView("TwoCount")
    got = tenv.sql("SELECT count(a), count(b) FROM TwoCount")
    assert rows_of(got) == [(2, 2)]


def test_aggregation_after_projection(tenv):
    """AggregateITCase.scala:177."""
    tenv.createDataFrame(
        [(1, 1, 1, 1, 1.0, 1.0, "Hello"), (2, 2, 2, 2, 2.0, 2.0, "Ciao")],
        "x1 tinyint, x2 smallint, x3 int, x4 long, x5 float, x6 double, x7 string",
    ).createOrReplaceTempView("Proj7")
    got = tenv.sql(
        "SELECT CAST(avg(a) AS TINYINT), sum(b), count(c) FROM "
        "(SELECT x1 as a, x2 as b, x3 as c FROM Proj7)"
    )
    assert rows_of(got) == [(1, 3, 2)]


def test_distinct_aggregate(tenv):
    """AggregateITCase.scala:198."""
    got = tenv.sql("SELECT sum(a) as sa, count(distinct c) as b FROM T3")
    assert rows_of(got) == [(231, 21)]


def test_grouped_distinct_aggregate(tenv):
    """AggregateITCase.scala:216."""
    got = tenv.sql(
        "SELECT b, CAST(avg(distinct a) AS INT) as av, count(c) as cnt FROM T3 GROUP BY b"
    )
    assert rows_of(got) == exp([
        (6, 18, 6), (5, 13, 5), (4, 8, 4), (3, 5, 3), (2, 2, 2), (1, 1, 1),
    ])


def test_grouping_set_aggregate(tenv):
    """AggregateITCase.scala:235 — Calcite's GROUP_ID() numbering over
    GROUPING SETS (b, c) equals Spark's grouping_id() bitmask here."""
    got = tenv.sql(
        "SELECT b, c, CAST(avg(a) AS INT) as av, grouping_id() as g FROM T3 "
        "GROUP BY GROUPING SETS (b, c)"
    )
    by_b = [(b, None, av, 1) for b, av in [(6, 18), (5, 13), (4, 8), (3, 5), (2, 2), (1, 1)]]
    by_c = [
        (None, c, av, 2) for c, av in
        [("Luke Skywalker", 6), ("I am fine.", 5), ("Hi", 1),
         ("Hello world, how are you?", 4), ("Hello world", 3), ("Hello", 2)]
        + [(f"Comment#{i}", i + 6) for i in range(1, 16)]
    ]
    assert rows_of(got) == exp(by_b + by_c)


def test_tumble_window_aggregate(t3ts):
    """AggregateITCase.scala:310 (b, SUM(a) columns) — verbatim TUMBLE SQL
    through the frontend."""
    q = rewrite_flink_sql(
        "SELECT b, SUM(a) FROM T3TS GROUP BY b, TUMBLE(ts, INTERVAL '3' SECOND)"
    )
    got = t3ts.sql(q)
    assert rows_of(got.select("b", "sum(a)")) == exp([
        (1, 1), (2, 2), (2, 3), (3, 9), (3, 6), (4, 15), (4, 19),
        (5, 11), (5, 39), (5, 15), (6, 33), (6, 57), (6, 21),
    ])


def test_tumble_window_with_properties(t3ts):
    """AggregateITCase.scala:398 — TUMBLE_START/END/ROWTIME accessors."""
    q = rewrite_flink_sql(
        "SELECT b, COUNT(a) AS cnt, "
        "TUMBLE_START(ts, INTERVAL '5' SECOND) AS ws, "
        "TUMBLE_END(ts, INTERVAL '5' SECOND) AS we, "
        "TUMBLE_ROWTIME(ts, INTERVAL '5' SECOND) AS rt "
        "FROM T3TS GROUP BY b, TUMBLE(ts, INTERVAL '5' SECOND)"
    )
    got = t3ts.sql(q)
    expected = [
        (1, 1, "1970-01-01 00:00:00.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (2, 2, "1970-01-01 00:00:00.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (3, 1, "1970-01-01 00:00:00.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (3, 2, "1970-01-01 00:00:05.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (4, 3, "1970-01-01 00:00:05.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (4, 1, "1970-01-01 00:00:10.0", "1970-01-01 00:00:15.0", "1970-01-01 00:00:14.999"),
        (5, 4, "1970-01-01 00:00:10.0", "1970-01-01 00:00:15.0", "1970-01-01 00:00:14.999"),
        (5, 1, "1970-01-01 00:00:15.0", "1970-01-01 00:00:20.0", "1970-01-01 00:00:19.999"),
        (6, 4, "1970-01-01 00:00:15.0", "1970-01-01 00:00:20.0", "1970-01-01 00:00:19.999"),
        (6, 2, "1970-01-01 00:00:20.0", "1970-01-01 00:00:25.0", "1970-01-01 00:00:24.999"),
    ]
    assert rows_of(got) == exp([
        (b, n, _ts(ws), _ts(we), _ts(rt)) for b, n, ws, we, rt in expected
    ])


def test_hop_window_aggregate(t3ts):
    """AggregateITCase.scala:444 (b, SUM(a) columns) — HOP(2s slide, 4s size)."""
    q = rewrite_flink_sql(
        "SELECT b, SUM(a) FROM T3TS "
        "GROUP BY b, HOP(ts, INTERVAL '2' SECOND, INTERVAL '4' SECOND)"
    )
    got = t3ts.sql(q)
    assert rows_of(got.select("b", "sum(a)")) == exp([
        (1, 1), (1, 1), (2, 5), (2, 5), (3, 9), (3, 15), (3, 6),
        (4, 7), (4, 24), (4, 27), (4, 10),
        (5, 11), (5, 36), (5, 54), (5, 29),
        (6, 33), (6, 70), (6, 78), (6, 41),
    ])


def test_hop_window_with_properties(t3ts):
    """AggregateITCase.scala:466 — HOP_START/END/ROWTIME."""
    q = rewrite_flink_sql(
        "SELECT b, COUNT(a) AS cnt, "
        "HOP_START(ts, INTERVAL '5' SECOND, INTERVAL '10' SECOND) AS ws, "
        "HOP_END(ts, INTERVAL '5' SECOND, INTERVAL '10' SECOND) AS we, "
        "HOP_ROWTIME(ts, INTERVAL '5' SECOND, INTERVAL '10' SECOND) AS rt "
        "FROM T3TS GROUP BY b, HOP(ts, INTERVAL '5' SECOND, INTERVAL '10' SECOND)"
    )
    got = t3ts.sql(q)
    expected = [
        (1, 1, "1969-12-31 23:59:55.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (2, 2, "1969-12-31 23:59:55.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (3, 1, "1969-12-31 23:59:55.0", "1970-01-01 00:00:05.0", "1970-01-01 00:00:04.999"),
        (1, 1, "1970-01-01 00:00:00.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (2, 2, "1970-01-01 00:00:00.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (3, 3, "1970-01-01 00:00:00.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (4, 3, "1970-01-01 00:00:00.0", "1970-01-01 00:00:10.0", "1970-01-01 00:00:09.999"),
        (3, 2, "1970-01-01 00:00:05.0", "1970-01-01 00:00:15.0", "1970-01-01 00:00:14.999"),
        (4, 4, "1970-01-01 00:00:05.0", "1970-01-01 00:00:15.0", "1970-01-01 00:00:14.999"),
        (5, 4, "1970-01-01 00:00:05.0", "1970-01-01 00:00:15.0", "1970-01-01 00:00:14.999"),
        (4, 1, "1970-01-01 00:00:10.0", "1970-01-01 00:00:20.0", "1970-01-01 00:00:19.999"),
        (5, 5, "1970-01-01 00:00:10.0", "1970-01-01 00:00:20.0", "1970-01-01 00:00:19.999"),
        (6, 4, "1970-01-01 00:00:10.0", "1970-01-01 00:00:20.0", "1970-01-01 00:00:19.999"),
        (5, 1, "1970-01-01 00:00:15.0", "1970-01-01 00:00:25.0", "1970-01-01 00:00:24.999"),
        (6, 6, "1970-01-01 00:00:15.0", "1970-01-01 00:00:25.0", "1970-01-01 00:00:24.999"),
        (6, 2, "1970-01-01 00:00:20.0", "1970-01-01 00:00:30.0", "1970-01-01 00:00:29.999"),
    ]
    assert rows_of(got) == exp([
        (b, n, _ts(ws), _ts(we), _ts(rt)) for b, n, ws, we, rt in expected
    ])


@pytest.fixture(scope="module")
def t3ts_even(tenv):
    """AggregateITCase's session fixture: even-b rows only, ts = a seconds."""
    tenv.sql(
        "SELECT a, b, c, CAST(a AS TIMESTAMP) AS ts FROM T3 WHERE b % 2 = 0"
    ).createOrReplaceTempView("T3TSE")
    return tenv


def test_session_window_aggregate(t3ts_even):
    """AggregateITCase.scala:505 (MIN/MAX/SUM columns) — two 4s-gap sessions."""
    q = rewrite_flink_sql(
        "SELECT MIN(a) AS mn, MAX(a) AS mx, SUM(a) AS sm FROM T3TSE "
        "GROUP BY SESSION(ts, INTERVAL '4' SECOND)"
    )
    got = t3ts_even.sql(q)
    assert rows_of(got.select("mn", "mx", "sm")) == exp([
        (2, 10, 39), (16, 21, 111),
    ])


def test_session_window_with_properties(t3ts_even):
    """AggregateITCase.scala:536 — SESSION_START/END/ROWTIME."""
    q = rewrite_flink_sql(
        "SELECT COUNT(a) AS cnt, "
        "SESSION_START(ts, INTERVAL '4' SECOND) AS ws, "
        "SESSION_END(ts, INTERVAL '4' SECOND) AS we, "
        "SESSION_ROWTIME(ts, INTERVAL '4' SECOND) AS rt "
        "FROM T3TSE GROUP BY SESSION(ts, INTERVAL '4' SECOND)"
    )
    got = t3ts_even.sql(q)
    expected = [
        (6, "1970-01-01 00:00:02.0", "1970-01-01 00:00:14.0", "1970-01-01 00:00:13.999"),
        (6, "1970-01-01 00:00:16.0", "1970-01-01 00:00:25.0", "1970-01-01 00:00:24.999"),
    ]
    assert rows_of(got) == exp([
        (n, _ts(ws), _ts(we), _ts(rt)) for n, ws, we, rt in expected
    ])


# ---------------------------------------------------------------------------
# CalcITCase.scala (batch/sql) - projection / filter / literals / UDFs
# ---------------------------------------------------------------------------

_ROWS3 = [
    (1, 1, "Hi"), (2, 2, "Hello"), (3, 2, "Hello world"),
    (4, 3, "Hello world, how are you?"), (5, 3, "I am fine."),
    (6, 3, "Luke Skywalker"),
] + [
    (i, {7: 4, 8: 4, 9: 4, 10: 4, 11: 5, 12: 5, 13: 5, 14: 5, 15: 5}.get(i, 6), f"Comment#{i - 6}")
    for i in range(7, 22)
]


def test_select_star_from_table(tenv):
    """CalcITCase.scala:48 - all 21 fixture rows verbatim."""
    assert rows_of(tenv.sql("SELECT * FROM T3")) == exp(_ROWS3)


def test_select_with_naming(tenv):
    """CalcITCase.scala:139 - exotic quoted alias through a subquery."""
    got = tenv.sql("SELECT `1-_./U2`, b FROM (SELECT a as `1-_./U2`, b FROM T3)")
    assert rows_of(got) == exp([(a, b) for a, b, _ in _ROWS3])


def test_invalid_fields(tenv):
    """CalcITCase.scala:159 - unknown column is a loud analysis error."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        tenv.sql("SELECT a, foo FROM T3").collect()


def test_all_rejecting_filter(tenv):
    """CalcITCase.scala:174."""
    assert tenv.sql("SELECT * FROM T3 WHERE false").count() == 0


def test_all_passing_filter(tenv):
    """CalcITCase.scala:192."""
    assert rows_of(tenv.sql("SELECT * FROM T3 WHERE true")) == exp(_ROWS3)


def test_filter_on_string(tenv):
    """CalcITCase.scala:215."""
    got = tenv.sql("SELECT * FROM T3 WHERE c LIKE '%world%'")
    assert rows_of(got) == exp([
        (3, 2, "Hello world"), (4, 3, "Hello world, how are you?"),
    ])


def test_filter_on_integer(tenv):
    """CalcITCase.scala:233 - MOD(a,2)=0."""
    got = tenv.sql("SELECT * FROM T3 WHERE MOD(a,2)=0")
    assert rows_of(got) == exp([r for r in _ROWS3 if r[0] % 2 == 0])


def test_disjunctive_predicate(tenv):
    """CalcITCase.scala:254."""
    got = tenv.sql("SELECT * FROM T3 WHERE a < 2 OR a > 20")
    assert rows_of(got) == exp([(1, 1, "Hi"), (21, 6, "Comment#15")])


def test_filter_with_and(tenv):
    """CalcITCase.scala:272 - MOD(a,2)<>0 AND MOD(b,2)=0."""
    got = tenv.sql("SELECT * FROM T3 WHERE MOD(a,2)<>0 AND MOD(b,2)=0")
    assert rows_of(got) == exp([r for r in _ROWS3 if r[0] % 2 != 0 and r[1] % 2 == 0])


def test_advanced_data_types(tenv):
    """CalcITCase.scala:292 - DATE/TIMESTAMP literals echo the column
    values (Spark has no TIME type; the reference's TIME column is carried
    as a string here, its literal compared textually)."""
    from datetime import date

    tenv.createDataFrame(
        [(date(1984, 7, 12), "14:34:24", datetime(1984, 7, 12, 14, 34, 24))],
        "a date, b string, c timestamp",
    ).createOrReplaceTempView("ADT")
    got = tenv.sql(
        "SELECT a, b, c, DATE '1984-07-12', '14:34:24', "
        "TIMESTAMP '1984-07-12 14:34:24' FROM ADT"
    )
    d, t, ts = date(1984, 7, 12), "14:34:24", datetime(1984, 7, 12, 14, 34, 24)
    assert rows_of(got) == [(d, t, ts, d, t, ts)]


def test_value_constructor(tenv):
    """CalcITCase.scala:314 - row/array/map constructors and a row-value
    equality predicate (Calcite (a,b,c) = (...) maps to Spark struct
    comparison)."""
    ts = datetime(1984, 7, 12, 14, 34, 24)
    tenv.createDataFrame(
        [("foo", 12, ts)], "a string, b int, c timestamp"
    ).createOrReplaceTempView("VC")
    got = tenv.sql(
        "SELECT struct(a, b, c) AS r, ARRAY(12, b) AS arr, MAP(a, c) AS m FROM VC "
        "WHERE struct(a, b, c) = struct('foo', 12, TIMESTAMP '1984-07-12 14:34:24')"
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert row["r"]["a"] == "foo" and row["r"]["b"] == 12 and row["r"]["c"] == ts
    assert list(row["arr"]) == [12, 12]
    assert row["m"]["foo"] == ts


def test_user_defined_scalar_function(tenv):
    """CalcITCase.scala:340 - a registered scalar UDF in SQL (the Java
    hashCode of 'a','b','c' is their code point)."""
    tenv.udf.register("myHashCode", lambda s: ord(s), "int")
    tenv.createDataFrame([("a",), ("b",), ("c",)], "text string").createOrReplaceTempView("UDF1")
    got = tenv.sql("SELECT myHashCode(text) FROM UDF1")
    assert rows_of(got) == exp([(97,), (98,), (99,)])


def test_udf_with_unicode_parameter(tenv):
    """CalcITCase.scala:358 - UDF arguments carrying control characters
    (U+0001, U+0004), quotes and backslashes survive SQL literal parsing
    exactly as in the reference's SplitUDF scenario."""

    def split_udf(s, sep, idx):
        parts = s.split(sep)
        return parts[idx] if idx < len(parts) else None

    tenv.udf.register("splitUDF", split_udf, "string")
    ctl1, ctl4 = "\x01", "\x04"
    tenv.createDataFrame(
        [
            (f"a{ctl1}b", 'c"d', f'e\\"{ctl4}f'),
            (f"x{ctl1}y", 'y"z', f'z\\"{ctl4}z'),
        ],
        "a string, b string, c string",
    ).createOrReplaceTempView("UDFU")
    got = tenv.sql(
        f"SELECT "
        f"splitUDF(a, '{ctl1}', 0) as a0, "
        f"""splitUDF(b, '"', 1) as b0, """
        f"""splitUDF(c, '\\\\"{ctl4}', 0) as c0 FROM UDFU"""
    )
    assert rows_of(got) == exp([("a", "d", "e"), ("x", "z", "z")])


# ---------------------------------------------------------------------------
# SetOperatorsITCase.scala (batch/sql). The reference @Ignores EXCEPT ALL /
# INTERSECT ALL (Calcite could not parse them); Spark parses them, so those
# two run here against the reference's in-test expected values.
# ---------------------------------------------------------------------------


def test_union_all(tenv):
    """SetOperatorsITCase.scala:43."""
    got = tenv.sql("SELECT c FROM SMALL3 UNION ALL (SELECT c FROM SMALL3)")
    assert rows_of(got) == exp([("Hi",), ("Hello",), ("Hello world",)] * 2)


def test_union(tenv):
    """SetOperatorsITCase.scala:63."""
    got = tenv.sql("SELECT c FROM SMALL3 UNION (SELECT c FROM SMALL3)")
    assert rows_of(got) == exp([("Hi",), ("Hello",), ("Hello world",)])


@pytest.fixture(scope="module")
def t5_as_abdce(tenv):
    """t2 registered as ('a,'b,'d,'c,'e): the STRING g column lands on c."""
    tenv.sql(
        "SELECT d AS a, e AS b, f AS d2, g AS c, h AS e FROM T5"
    ).createOrReplaceTempView("T5X")
    return tenv


def test_union_with_filter(t5_as_abdce):
    """SetOperatorsITCase.scala:83."""
    got = t5_as_abdce.sql(
        "SELECT c FROM (SELECT * FROM SMALL3 UNION ALL (SELECT a, b, c FROM T5X)) WHERE b < 2"
    )
    assert rows_of(got) == exp([("Hi",), ("Hallo",)])


def test_union_with_aggregation(t5_as_abdce):
    """SetOperatorsITCase.scala:105."""
    got = t5_as_abdce.sql(
        "SELECT count(c) FROM (SELECT * FROM SMALL3 UNION ALL (SELECT a, b, c FROM T5X))"
    )
    assert rows_of(got) == [(18,)]


def test_values_with_cast(tenv):
    """SetOperatorsITCase.scala:126."""
    got = tenv.sql(
        "VALUES (1, cast(1 as BIGINT)), (2, cast(2 as BIGINT)), (3, cast(3 as BIGINT))"
    )
    assert rows_of(got) == exp([(1, 1), (2, 2), (3, 3)])


def test_except(tenv):
    """SetOperatorsITCase.scala:142."""
    tenv.createDataFrame([(1, 1, "Hi")], "a int, b long, c string").createOrReplaceTempView("EX2")
    got = tenv.sql("SELECT c FROM SMALL3 EXCEPT (SELECT c FROM EX2)")
    assert rows_of(got) == exp([("Hello",), ("Hello world",)])


def test_except_all(tenv):
    """SetOperatorsITCase.scala:164 (@Ignore'd upstream only because the
    Calcite parser lacked EXCEPT ALL; expected values preserved)."""
    tenv.createDataFrame([(1,), (1,), (1,), (2,), (2,)], "c int").createOrReplaceTempView("EA1")
    tenv.createDataFrame([(1,), (2,), (2,), (3,)], "c int").createOrReplaceTempView("EA2")
    got = tenv.sql("SELECT c FROM EA1 EXCEPT ALL SELECT c FROM EA2")
    assert rows_of(got) == exp([(1,), (1,)])


def test_except_with_filter(t5_as_abdce):
    """SetOperatorsITCase.scala:188."""
    got = t5_as_abdce.sql(
        "SELECT c FROM (SELECT * FROM SMALL3 EXCEPT (SELECT a, b, c FROM T5X)) WHERE b < 2"
    )
    assert rows_of(got) == exp([("Hi",)])


def test_intersect(tenv):
    """SetOperatorsITCase.scala:210 — t2 carries a duplicate and a
    non-matching variant row."""
    tenv.createDataFrame(
        [(1, 1, "Hi"), (2, 2, "Hello"), (2, 2, "Hello"), (3, 2, "Hello world!")],
        "a int, b long, c string",
    ).createOrReplaceTempView("IN2")
    got = tenv.sql("SELECT c FROM SMALL3 INTERSECT SELECT c FROM IN2")
    assert rows_of(got) == exp([("Hi",), ("Hello",)])


def test_intersect_all(tenv):
    """SetOperatorsITCase.scala:237 (@Ignore'd upstream, parser-only)."""
    tenv.createDataFrame([(1,), (1,), (1,), (2,), (2,)], "c int").createOrReplaceTempView("IA1")
    tenv.createDataFrame([(1,), (2,), (2,), (3,)], "c int").createOrReplaceTempView("IA2")
    got = tenv.sql("SELECT c FROM IA1 INTERSECT ALL SELECT c FROM IA2")
    assert rows_of(got) == exp([(1,), (2,), (2,)])


def test_intersect_with_filter(tenv):
    """SetOperatorsITCase.scala:261 — small3 INTERSECT full t3."""
    got = tenv.sql(
        "SELECT c FROM ((SELECT * FROM SMALL3) INTERSECT (SELECT * FROM T3)) WHERE a > 1"
    )
    assert rows_of(got) == exp([("Hello",), ("Hello world",)])


def test_in_with_filter(tenv):
    """SetOperatorsITCase.scala:283 — IN subquery keeps duplicates of the
    probe side."""
    got = tenv.sql("SELECT d FROM T5 WHERE d IN (SELECT a FROM SMALL3)")
    assert rows_of(got) == exp([(1,), (2,), (2,), (3,), (3,), (3,)])


def test_in_with_projection(tenv):
    """SetOperatorsITCase.scala:298 — IN as a projected boolean."""
    got = tenv.sql("SELECT d IN (SELECT a FROM SMALL3) AS x FROM T5")
    assert rows_of(got) == exp([(False,)] * 9 + [(True,)] * 6)


# ---------------------------------------------------------------------------
# SortITCase.scala (batch/sql) — total order with OFFSET / FETCH. Calcite's
# ANSI "OFFSET n ROWS FETCH NEXT m ROWS ONLY" maps to Spark's LIMIT/OFFSET
# clauses (same semantics, Spark's spelling).
# ---------------------------------------------------------------------------


def test_order_by_multiple_fields(tenv):
    """SortITCase.scala:22 — ORDER BY a DESC, b DESC is a total order."""
    got = [tuple(r) for r in tenv.sql("SELECT * FROM T3 ORDER BY a DESC, b DESC").collect()]
    assert got == sorted(_ROWS3, key=lambda r: (-r[0], -r[1]))


def test_order_by_with_offset(tenv):
    """SortITCase.scala:59 — ORDER BY a DESC OFFSET 2."""
    got = [tuple(r) for r in tenv.sql(
        "SELECT * FROM T3 ORDER BY a DESC OFFSET 2"
    ).collect()]
    assert got == sorted(_ROWS3, key=lambda r: -r[0])[2:]


def test_order_by_with_offset_and_fetch(tenv):
    """SortITCase.scala:90 — OFFSET 2 FETCH NEXT 5."""
    got = [tuple(r) for r in tenv.sql(
        "SELECT * FROM T3 ORDER BY a LIMIT 5 OFFSET 2"
    ).collect()]
    assert got == sorted(_ROWS3, key=lambda r: r[0])[2:7]


def test_order_by_limit(tenv):
    """SortITCase.scala (fetch-only variant) — ORDER BY b, a FETCH 5."""
    got = [tuple(r) for r in tenv.sql(
        "SELECT * FROM T3 ORDER BY b, a LIMIT 5"
    ).collect()]
    assert got == sorted(_ROWS3, key=lambda r: (r[1], r[0]))[:5]
