"""ITCase-style tests over the reference's canonical fixtures (FIXTURES.md;
StreamTestData.scala:34,42,68) — small deterministic inputs, collected and
compared against hand-computed golden outputs, exactly the reference's
runtime/stream & batch ITCase pattern (SURVEY.md §5 layer 4)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def t3(spark):
    """get3TupleDataStream (StreamTestData.scala:42) — 21 rows (a, b, c)."""
    rows = [
        (1, 1, "Hi"),
        (2, 2, "Hello"),
        (3, 2, "Hello world"),
        (4, 3, "Hello world, how are you?"),
        (5, 3, "I am fine."),
        (6, 3, "Luke Skywalker"),
    ] + [(i, {7: 4, 8: 4, 9: 4, 10: 4, 11: 5, 12: 5, 13: 5, 14: 5, 15: 5}.get(i, 6), f"Comment#{i - 6}") for i in range(7, 22)]
    return spark.createDataFrame(rows, "a int, b long, c string")


@pytest.fixture(scope="module")
def t5(spark):
    """get5TupleDataStream (StreamTestData.scala:68) — 15 rows (a, b, c, d, e)."""
    rows = [
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
    return spark.createDataFrame(rows, "a int, b long, c int, d string, e long")


def test_groupby_agg_itcase(t3):
    """AggregateITCase: grouped count+sum over the skewed b key."""
    got = {
        (r.b, r.cnt, r.s)
        for r in t3.groupBy("b").agg(F.count("*").alias("cnt"), F.sum("a").alias("s")).collect()
    }
    assert got == {(1, 1, 1), (2, 2, 5), (3, 3, 15), (4, 4, 34), (5, 5, 65), (6, 6, 111)}


def test_join_itcase(t3, t5):
    """JoinITCase: t3 ⋈ t5 on a — row multiplicity follows t5's key histogram."""
    joined = t3.join(t5, "a").select(t3.a, t3.c, t5.d)
    assert joined.count() == 15  # every t5 row finds exactly one t3.a in 1..5
    per_a = {r["a"]: r["n"] for r in joined.groupBy("a").agg(F.count("*").alias("n")).collect()}
    assert per_a == {1: 1, 2: 2, 3: 3, 4: 4, 5: 5}


def test_calc_itcase(t3):
    """CalcITCase: filter + string expressions."""
    got = [
        r.up
        for r in t3.filter(F.col("c").startswith("Hello"))
        .select(F.upper("c").alias("up"))
        .orderBy("up")
        .collect()
    ]
    assert got == ["HELLO", "HELLO WORLD", "HELLO WORLD, HOW ARE YOU?"]


def test_setop_itcase(t3):
    """SetOperatorsITCase: UNION ALL doubles, EXCEPT empties."""
    assert t3.union(t3).count() == 42
    assert t3.exceptAll(t3).count() == 0


def test_over_itcase(t5):
    """OverWindowITCase: running sum of e per a ordered by b."""
    from pyspark.sql import Window

    w = Window.partitionBy("a").orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {(r.a, r.b, r.rs) for r in t5.select("a", "b", F.sum("e").over(w).alias("rs")).collect()}
    assert (5, 15, 11) in got  # 1+3+3+2+2
    assert (1, 1, 1) in got and (3, 6, 7) in got


def test_sort_itcase(t3):
    """SortITCase: orderBy desc with limit (batch-only in the reference)."""
    got = [r.a for r in t3.orderBy(F.desc("b"), F.desc("a")).limit(3).collect()]
    assert got == [21, 20, 19]


def test_group_window_itcase(spark):
    """GroupWindowITCase: event-time TUMBLE over the SqlITCase session-window
    fixture shape ((ts, key, value) rows; stream/sql/SqlITCase.scala:45)."""
    from flink_1_6_0_spark.operators.windows import tumble

    rows = [
        (1000, "a", 1), (2000, "a", 2), (3000, "b", 3),
        (6000, "a", 4), (7000, "b", 5), (11000, "b", 6),
    ]
    df = spark.createDataFrame(rows, "ts_ms long, k string, v long").withColumn(
        "ts", F.timestamp_millis(F.col("ts_ms"))
    )
    out = (
        df.groupBy(tumble("ts", "5 seconds").alias("w"), "k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .select(F.unix_timestamp("w.start").alias("ws"), "k", "n", "s")
    )
    got = {tuple(r) for r in out.collect()}
    assert got == {
        (0, "a", 2, 3), (0, "b", 1, 3),
        (5, "a", 1, 4), (5, "b", 1, 5),
        (10, "b", 1, 6),
    }


def test_correlate_itcase(t3):
    """CorrelateITCase: LATERAL TABLE(split(c)) over the 3-tuple fixture —
    left join keeps rows whose UDTF yields nothing."""
    from flink_1_6_0_spark.functions.udf import table_function
    from flink_1_6_0_spark.operators.correlate import join_lateral

    split = table_function(
        lambda s: [(w,) for w in s.split() if w.startswith("H")], "word string"
    )
    small = t3.filter(F.col("a") <= 5)
    out = join_lateral(small, split(F.col("c")), ["word"], keep=["a"], outer=True)
    got = {(r.a, r.word) for r in out.collect()}
    assert got == {(1, "Hi"), (2, "Hello"), (3, "Hello"), (4, "Hello"), (5, None)}


def test_table_source_itcase(spark, t3, tmp_path):
    """TableSourceITCase: CSV round-trip of the fixture through the
    CsvTableSource/Sink analogs preserves values and schema."""
    from flink_1_6_0_spark.sources.batch import read_csv, write_csv

    path = str(tmp_path / "t3_csv")
    write_csv(t3, path, header=True)
    back = read_csv(spark, path, schema="a int, b long, c string", header=True)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, t3.collect()))


def test_asof_join_forward_and_ties(spark):
    """asof_join: backward picks the latest right <= left ts (ties match);
    forward picks the earliest right >= left ts; unmatched lefts null-pad."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")], "k long, ts long, lv string"
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 15, 150.0), (2, 7, 70.0)], "k long, ts long, rv double"
    )
    back = {
        (r["k"], r["ts"]): r["r_rv"]
        for r in asof_join(left, right, "k", "ts", "ts", ["rv"], "backward").collect()
    }
    # (1,10) ties with right ts=10 -> matches; (1,20) takes latest <=20 = 15;
    # (2,5) has no right <=5 -> NULL
    assert back == {(1, 10): 100.0, (1, 20): 150.0, (2, 5): None}

    fwd = {
        (r["k"], r["ts"]): r["r_rv"]
        for r in asof_join(left, right, "k", "ts", "ts", ["rv"], "forward").collect()
    }
    # (1,10) tie -> 100.0; (1,20) no right >=20 -> NULL; (2,5) earliest >=5 = 7
    assert fwd == {(1, 10): 100.0, (1, 20): None, (2, 5): 70.0}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check (seeded): asof_join backward/forward vs
    pandas.merge_asof — an independent reference implementation — over a few
    hundred rows with duplicate left timestamps, tie timestamps, and
    unmatched keys."""
    import random

    import pandas as pd

    from flink_1_6_0_spark.operators.joins import asof_join

    rng = random.Random(42)
    left_rows = [
        (rng.randint(1, 6), rng.randint(0, 50), i) for i in range(300)
    ]  # (k, ts, lid) — duplicate (k, ts) pairs allowed on the left
    right_pairs = {(rng.randint(1, 7), rng.randint(0, 50)) for _ in range(150)}
    right_rows = [(k, ts, float(k * 1000 + ts)) for k, ts in right_pairs]  # unique (k, ts)

    left = spark.createDataFrame(left_rows, "k long, ts long, lid long")
    right = spark.createDataFrame(right_rows, "k long, ts long, rv double")

    lpd = pd.DataFrame(left_rows, columns=["k", "ts", "lid"]).sort_values("ts", kind="stable")
    rpd = pd.DataFrame(right_rows, columns=["k", "ts", "rv"]).sort_values("ts", kind="stable")

    for direction in ("backward", "forward"):
        got = {
            r["lid"]: r["r_rv"]
            for r in asof_join(left, right, "k", "ts", "ts", ["rv"], direction).collect()
        }
        exp_df = pd.merge_asof(lpd, rpd, on="ts", by="k", direction=direction)
        exp = {
            int(r.lid): (None if pd.isna(r.rv) else float(r.rv))
            for r in exp_df.itertuples()
        }
        assert got == exp, f"direction={direction}"


def test_asof_join_null_payload_field_no_chimera(spark):
    """A matched right row must arrive WHOLE: a NULL payload field on the
    matched row stays NULL instead of being backfilled from an older right
    row (review finding — per-column fills stitched together rows that
    never existed; DuckDB ASOF and pandas merge_asof return the NULL)."""
    from flink_1_6_0_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 30, 900)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 10, 100.0, "old"), (1, 20, None, "new")],
        "k long, ts long, a double, b string",
    )
    row = asof_join(left, right, "k", "ts", "ts", ["a", "b"]).collect()[0]
    assert row["r_b"] == "new"
    assert row["r_a"] is None  # NOT 100.0 from the older row


def test_windowed_join_outer_keeps_left_window(spark):
    """Outer windowed join: an unmatched left row keeps ITS OWN window
    (review finding — the right side's window was NULL there), and semi
    joins still expose the window column."""
    import datetime as dt

    from flink_1_6_0_spark.operators.joins import windowed_join

    t0 = dt.datetime(2024, 1, 1, 0, 20)
    left = spark.createDataFrame([(1, t0, "L1"), (2, t0, "L2")], "k long, ts timestamp, lv string")
    right = spark.createDataFrame([(1, t0, "R1")], "k2 long, ts2 timestamp, rv string")
    out = windowed_join(left, right, [("k", "k2")], "ts", "ts2", "1 hour", how="left")
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["window"]["start"] == dt.datetime(2024, 1, 1, 0, 0)
    assert rows[2]["rv"] is None
    assert rows[2]["window"] is not None  # unmatched left row keeps its window
    assert rows[2]["window"]["start"] == dt.datetime(2024, 1, 1, 0, 0)
    semi = windowed_join(left, right, [("k", "k2")], "ts", "ts2", "1 hour", how="left_semi")
    assert set(semi.columns) == {"k", "ts", "lv", "window"}
    assert semi.count() == 1


def test_interval_join_requires_keys(spark):
    import pytest

    from flink_1_6_0_spark.operators.joins import interval_join

    df = spark.createDataFrame([(1, 10)], "k long, ts long")
    with pytest.raises(ValueError, match="equi-key"):
        interval_join(df, df, [], "ts", "ts", "0 seconds", "1 hour")


def test_evicted_window_negative_seconds_raises(spark):
    import pytest

    from flink_1_6_0_spark.operators.windows import evicted_window_agg

    df = spark.createDataFrame([(1, 10, 1.0)], "k long, ts long, v double")
    with pytest.raises(ValueError, match="keep_last_seconds"):
        evicted_window_agg(df, ["k"], "ts", "1 hour", "v", keep_last_seconds=-10)
