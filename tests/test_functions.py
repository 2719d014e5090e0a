"""Unit tests for the Flink-semantics scalar shims (functions/scalar.py) —
mirrors the reference's expression golden tests
(flink-table/src/test/.../expressions/ScalarFunctionsTest)."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from flink_1_6_0_spark.functions import scalar as fx


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_divide_integer_truncates_like_java(spark):
    df = spark.createDataFrame([(7, 2), (-7, 2), (7, -2), (10, 5)], "a long, b long")
    rows = df.select(fx.divide_integer("a", "b").alias("d")).collect()
    assert [r["d"] for r in rows] == [3, -3, -3, 2]  # Java semantics: trunc toward zero


def test_mysql_pattern_translation():
    assert fx.mysql_to_java_pattern("%Y-%m-%d") == "yyyy-MM-dd"
    assert fx.mysql_to_java_pattern("%d/%m/%Y %H:%i:%s") == "dd/MM/yyyy HH:mm:ss"
    assert fx.mysql_to_java_pattern("%Y%%") == "yyyy%"
    with pytest.raises(ValueError):
        fx.mysql_to_java_pattern("%Q")


def test_similar_to_anchoring(spark):
    df = spark.createDataFrame([("abc",), ("xabcx",)], "s string")
    rows = df.select(fx.similar_to("s", "a_c").alias("m")).collect()
    assert [r["m"] for r in rows] == [True, False]  # anchored, unlike rlike


def test_item_is_one_based(spark):
    assert _one(spark, fx.item(F.array(F.lit("x"), F.lit("y")), 1)) == "x"


def test_element_unwrap(spark):
    assert _one(spark, fx.element(F.array(F.lit(5)))) == 5
    assert _one(spark, fx.element(F.array(F.lit(1), F.lit(2)))) is None


def test_cot(spark):
    import math

    assert _one(spark, fx.cot(F.lit(1.0))) == pytest.approx(1 / math.tan(1.0))


def test_overlaps(spark):
    t = lambda s: F.lit(s).cast("timestamp")
    assert _one(
        spark,
        fx.overlaps(t("2020-01-01"), t("2020-02-01"), t("2020-01-15"), t("2020-03-01")),
    )
    assert not _one(
        spark,
        fx.overlaps(t("2020-01-01"), t("2020-01-10"), t("2020-01-15"), t("2020-03-01")),
    )


def test_sha1_exceeds_reference(spark):
    # SHA1 is in the reference catalog; DuckDB lacks it so it is unit-tested.
    import hashlib

    got = _one(spark, F.sha1(F.lit("abc")))
    assert got == hashlib.sha1(b"abc").hexdigest()


def test_mysql_pattern_adjacent_literals(spark):
    """Regression: consecutive literal letters must render as ONE quoted run
    ('hours'), not per-char 'h''o''u''r''s' (java.time reads '' inside a
    quoted run as an escaped apostrophe)."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.functions.scalar import date_format, mysql_to_java_pattern

    assert mysql_to_java_pattern("%H hours") == "HH' hours'"  # one quoted run
    assert mysql_to_java_pattern("%Y-%m") == "yyyy-MM"
    row = (
        spark.range(1)
        .select(date_format(F.lit("2020-03-04 14:00:00").cast("timestamp"), "%H hours").alias("s"))
        .first()
    )
    assert row["s"] == "14 hours"


def test_similar_to_sql_literal_metachars(spark):
    """SQL SIMILAR TO treats . ^ $ as literals; Java regex does not."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.functions.scalar import similar_to

    df = spark.createDataFrame([("3.14",), ("3X14",), ("5$",), ("5",)], "s string")
    got = {r["s"] for r in df.filter(similar_to(F.col("s"), "3.14")).collect()}
    assert got == {"3.14"}  # not 3X14
    got = {r["s"] for r in df.filter(similar_to(F.col("s"), "5$")).collect()}
    assert got == {"5$"}  # the literal string, not end-anchor semantics
