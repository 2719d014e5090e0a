"""Unit tests for the Flink SQL group-window front-end rewrite
(plans/sql_frontend.py) — TUMBLE/HOP/SESSION + accessors."""

from __future__ import annotations

import pytest

from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql


def test_tumble_rewrite():
    sql = "SELECT count(*) FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    assert rewrite_flink_sql(sql) == "SELECT count(*) FROM t GROUP BY window(ts, '1 hour')"


def test_hop_swaps_slide_and_size():
    # Flink: HOP(time, slide, size) — Spark: window(time, size, slide)
    sql = "GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)"
    assert rewrite_flink_sql(sql) == "GROUP BY window(ts, '1 hour', '30 minutes')"


def test_session_rewrite():
    sql = "GROUP BY SESSION(ts, INTERVAL '10' MINUTE)"
    assert rewrite_flink_sql(sql) == "GROUP BY session_window(ts, '10 minutes')"


def test_accessors():
    assert (
        rewrite_flink_sql("SELECT TUMBLE_START(ts, INTERVAL '1' DAY)")
        == "SELECT window(ts, '1 day').start"
    )
    assert (
        rewrite_flink_sql("SELECT HOP_END(ts, INTERVAL '5' MINUTE, INTERVAL '15' MINUTE)")
        == "SELECT window(ts, '15 minutes', '5 minutes').end"
    )
    assert (
        rewrite_flink_sql("SELECT SESSION_END(ts, INTERVAL '10' MINUTE)")
        == "SELECT session_window(ts, '10 minutes').end"
    )


def test_non_window_sql_untouched():
    sql = "SELECT tumbler, hopper FROM sessions WHERE x = 1"
    assert rewrite_flink_sql(sql) == sql


def test_unsupported_interval_raises():
    with pytest.raises(ValueError):
        rewrite_flink_sql("GROUP BY TUMBLE(ts, some_col)")


def test_end_to_end_sql(spark):
    from flink_1_6_0_spark.session import TableEnvironment

    te = TableEnvironment(spark)
    te.register_table(
        "t",
        spark.createDataFrame(
            [("2024-01-01 00:05:00", 1.0), ("2024-01-01 00:55:00", 2.0), ("2024-01-01 01:05:00", 4.0)],
            "ts string, v double",
        ).selectExpr("cast(ts as timestamp) ts", "v"),
    )
    rows = te.sql(
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) ws, sum(v) s FROM t "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) ORDER BY ws"
    ).collect()
    assert [r["s"] for r in rows] == [3.0, 4.0]


def test_lateral_table_rewrite_pure():
    from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql

    got = rewrite_flink_sql(
        "SELECT a, word FROM t, LATERAL TABLE(split(c)) AS T(word)"
    )
    assert got == "SELECT a, word FROM t, LATERAL split(c) AS T(word)"
    # LEFT JOIN form with ON TRUE passes through
    got2 = rewrite_flink_sql(
        "SELECT a, word FROM t LEFT JOIN LATERAL TABLE(split(c)) AS T(word) ON TRUE"
    )
    assert "LEFT JOIN LATERAL split(c) AS T(word) ON TRUE" in got2
    # nested parens unwrap correctly
    got3 = rewrite_flink_sql("SELECT * FROM t, LATERAL TABLE(f(g(x), h(y)))")
    assert got3 == "SELECT * FROM t, LATERAL f(g(x), h(y))"


def test_lateral_table_end_to_end(spark):
    """Flink SQL LATERAL TABLE(udtf(c)) (TableFunction.scala:82 applied via
    SQL) through registration + front-end rewrite + execution."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.functions.udf import register_table_function
    from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql

    register_table_function(
        spark, "split_words", lambda s: [(w, len(w)) for w in s.split(" ")],
        "word string, wlen int",
    )
    spark.createDataFrame([(1, "ab c"), (2, "de")], "id long, s string").createOrReplaceTempView(
        "lt_t"
    )
    out = spark.sql(
        rewrite_flink_sql("SELECT id, word, wlen FROM lt_t, LATERAL TABLE(split_words(s))")
    )
    assert {(r["id"], r["word"], r["wlen"]) for r in out.collect()} == {
        (1, "ab", 2), (1, "c", 1), (2, "de", 2),
    }


def test_group_window_rewriter_guards():
    import pytest

    from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql

    # TUMBLE inside a string literal is data, not syntax
    sql = "SELECT 'TUMBLE(a, b)' AS doc FROM t"
    assert rewrite_flink_sql(sql) == sql
    with pytest.raises(ValueError, match="unbalanced"):
        rewrite_flink_sql("SELECT TUMBLE(ts, INTERVAL '1' HOUR FROM t")


def test_having_scope_rules():
    """Bare-window rendering is scoped (round-12 ADVICE): a HAVING only
    affects calls in ITS select scope — not a subquery nested inside the
    HAVING, not a later UNION branch — and SQL-escaped quotes ('') inside
    literals don't flip the literal mask."""
    # accessor after a top-level HAVING: bare grouping attribute
    sql = (
        "SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) AS s FROM t "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) HAVING count(*) > 1 "
        "ORDER BY TUMBLE_START(ts, INTERVAL '1' HOUR)"
    )
    out = rewrite_flink_sql(sql)
    assert out.endswith("ORDER BY window.start")
    assert "GROUP BY window(ts, '1 hour')" in out

    # a group window inside a subquery nested in the HAVING opens a fresh
    # scope: it must render the full window(ts, ...) call, not bare
    sql = (
        "SELECT count(*) AS c FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) "
        "HAVING count(*) > (SELECT max(n) FROM u GROUP BY TUMBLE(ts2, INTERVAL '5' MINUTE))"
    )
    out = rewrite_flink_sql(sql)
    assert "GROUP BY window(ts2, '5 minutes')" in out

    # a later UNION branch is a new SELECT scope: its GROUP BY window is full
    sql = (
        "SELECT count(*) FROM a GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) HAVING count(*) > 1 "
        "UNION ALL SELECT count(*) FROM b GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    out = rewrite_flink_sql(sql)
    assert out.count("window(ts, '1 hour')") == 2

    # doubled-quote escape inside a literal must not flip the mask: the
    # HAVING here is real and the trailing accessor renders bare
    sql = (
        "SELECT count(*) FROM t WHERE note <> 'it''s HAVING time' "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR) HAVING count(*) > 0 "
        "ORDER BY TUMBLE_END(ts, INTERVAL '1' HOUR)"
    )
    out = rewrite_flink_sql(sql)
    assert out.endswith("ORDER BY window.end")
    assert "'it''s HAVING time'" in out

    # ...and a fake HAVING that lives only inside a literal must NOT make
    # later calls bare
    sql = (
        "SELECT count(*) FROM t WHERE note = 'HAVING' "
        "GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)"
    )
    assert "window(ts, '1 hour')" in rewrite_flink_sql(sql)


def test_having_scope_function_nesting_and_phantoms():
    """r12 session-2 review findings: (1) a window accessor nested in a
    FUNCTION call inside HAVING is still the HAVING's scope and renders bare
    (SqlITCase.scala:666 wraps HOP_START in QUARTER); (2) identifiers
    starting with 'select' don't open phantom subquery scopes; (3) a
    compound subquery ((SELECT..) UNION (SELECT..)) inside HAVING does not
    suppress bare rendering of later same-scope accessors."""
    # (1) function-nested accessor in HAVING renders bare
    sql = (
        "SELECT c FROM t GROUP BY HOP(ts, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE), c "
        "HAVING SUM(b) > 1 AND "
        "QUARTER(HOP_START(ts, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE)) = 1"
    )
    out = rewrite_flink_sql(sql)
    assert "QUARTER(window.start) = 1" in out

    # (2) a parenthesized expression starting with an identifier prefixed
    # 'select' is NOT a subquery — the accessor stays in the HAVING's scope
    sql = (
        "SELECT c FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), c "
        "HAVING (selectivity * 2 > 1 AND TUMBLE_END(ts, INTERVAL '1' HOUR) IS NOT NULL)"
    )
    out = rewrite_flink_sql(sql)
    assert "window.end IS NOT NULL" in out

    # (3) a compound set-op SUBQUERY inside the HAVING is not a branch
    # boundary of this scope: the trailing accessor still renders bare
    sql = (
        "SELECT c FROM t GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), c "
        "HAVING c IN ((SELECT a FROM s1) UNION (SELECT a FROM s2)) "
        "AND TUMBLE_END(ts, INTERVAL '1' HOUR) IS NOT NULL"
    )
    out = rewrite_flink_sql(sql)
    assert "window.end IS NOT NULL" in out
