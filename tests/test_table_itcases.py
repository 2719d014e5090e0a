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
