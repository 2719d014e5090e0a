"""Golden-output ports of the reference's STREAMING SQL ITCases
(flink-table/src/test/.../runtime/stream/sql/{OverWindowITCase,SqlITCase}.scala).

Each reference test drives a finite event-time stream (explicit
``Left(ts, row)`` elements interleaved with ``Right(wm)`` watermarks) through
streaming SQL and asserts the final emitted multiset. The port reproduces
that contract in two steps:

1. **Watermark replay** (``replay``): walk the element/watermark sequence
   applying the reference's lateness rule for rowtime operators — an element
   whose timestamp is strictly below the current watermark is DISCARDED
   (RowTimeBoundedRowsOver / RowTimeUnboundedOver process functions; the
   OverWindowITCase fixtures mark these "// late row"). Arrival order is
   preserved as a ``seq`` column because Flink's rowtime ROWS frames process
   equal-timestamp elements in arrival order (the rows buffered per
   timestamp are iterated in insertion order).

2. **Batch equivalence**: the survivors' append-stream output equals the
   batch OVER / GROUP BY result on the same rows — exactly the
   stream-batch-unification contract the repo's streaming kernels are built
   on. The port pins both the SQL dialect (through rewrite_flink_sql where
   group windows appear) and the value semantics (Calcite integer AVG
   truncates → integer division, documented in test_table_itcases.py too).

Retract-stream tests (toRetractStream + RetractingSink) assert the final
accumulated table, which equals the batch aggregate; the engine-level
retraction mechanics have their own tests in tests/test_streaming.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_6_0_spark.operators.aggregations import collect_multiset
from flink_1_6_0_spark.operators.correlate import unnest
from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql


def _key(t):
    return tuple((v is None, str(type(v)), v) for v in t)


def rows_of(df):
    return sorted((tuple(r) for r in df.collect()), key=_key)


def same(df, expected):
    assert rows_of(df) == sorted(expected, key=_key)


def replay(events):
    """Apply the rowtime-operator lateness rule to a Left/Right sequence.

    ``events``: list of ("L", ts_ms, row_tuple) | ("W", wm_ms). Returns the
    surviving rows as (seq, ts_ms, *row) — ``seq`` is arrival order, the
    deterministic tiebreak for equal timestamps.
    """
    wm = float("-inf")
    out = []
    seq = 0
    for ev in events:
        if ev[0] == "W":
            wm = max(wm, ev[1])
        else:
            _, ts, row = ev
            if ts >= wm:  # strictly-late elements are dropped; ts == wm survives
                out.append((seq, ts) + row)
                seq += 1
    return out


def over_df(spark, events, schema_tail):
    rows = replay(events)
    return spark.createDataFrame(rows, "seq int, rowtime long, " + schema_tail)


# ---------------------------------------------------------------------------
# OverWindowITCase.scala — rowtime OVER windows. LTCNT(x, t) is the
# reference's LargerThanCount UDAF: count of x > t over the frame.
# ---------------------------------------------------------------------------

# Fixture shared by the two bounded RANGE tests (partitioned golden differs
# from non-partitioned only in PARTITION BY c).
RANGE_OVER_DATA = [
    ("L", 1500, (1, 15, "Hello")),
    ("L", 1600, (1, 16, "Hello")),
    ("L", 1000, (1, 1, "Hello")),
    ("L", 2000, (2, 2, "Hello")),
    ("W", 1000),
    ("L", 2000, (2, 2, "Hello")),
    ("L", 2000, (2, 3, "Hello")),
    ("L", 3000, (3, 3, "Hello")),
    ("W", 2000),
    ("L", 4000, (4, 4, "Hello")),
    ("W", 3000),
    ("L", 5000, (5, 5, "Hello")),
    ("W", 5000),
    ("L", 6000, (6, 6, "Hello")),
    ("L", 6500, (6, 65, "Hello")),
    ("W", 7000),
    ("L", 9000, (6, 9, "Hello")),
    ("L", 9500, (6, 18, "Hello")),
    ("L", 9000, (6, 9, "Hello")),
    ("W", 10000),
    ("L", 10000, (7, 7, "Hello World")),
    ("L", 11000, (7, 17, "Hello World")),
    ("L", 11000, (7, 77, "Hello World")),
    ("W", 12000),
    ("L", 14000, (7, 18, "Hello World")),
    ("W", 14000),
    ("L", 15000, (8, 8, "Hello World")),
    ("W", 17000),
    ("L", 20000, (20, 20, "Hello World")),
    ("W", 19000),
]


class TestRowTimeOverWindow:
    def test_bounded_partitioned_range_over(self, spark):
        # OverWindowITCase.scala:256
        df = over_df(spark, RANGE_OVER_DATA, "a long, b int, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT c, b, "
            " SUM(CASE WHEN a > 4 THEN 1 ELSE 0 END) OVER w AS ltcnt, "
            " COUNT(a) OVER w AS cnt, SUM(a) OVER w AS s "
            "FROM T1 WINDOW w AS (PARTITION BY c ORDER BY rowtime "
            " RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [("Hello", 1, 0, 1, 1), ("Hello", 15, 0, 2, 2), ("Hello", 16, 0, 3, 3),
             ("Hello", 2, 0, 6, 9), ("Hello", 3, 0, 6, 9), ("Hello", 2, 0, 6, 9),
             ("Hello", 3, 0, 4, 9), ("Hello", 4, 0, 2, 7), ("Hello", 5, 1, 2, 9),
             ("Hello", 6, 2, 2, 11), ("Hello", 65, 2, 2, 12),
             ("Hello", 9, 2, 2, 12), ("Hello", 9, 2, 2, 12), ("Hello", 18, 3, 3, 18),
             ("Hello World", 7, 1, 1, 7), ("Hello World", 17, 3, 3, 21),
             ("Hello World", 77, 3, 3, 21), ("Hello World", 18, 1, 1, 7),
             ("Hello World", 8, 2, 2, 15), ("Hello World", 20, 1, 1, 20)],
        )

    def test_bounded_nonpartitioned_range_over(self, spark):
        # OverWindowITCase.scala:392 — same data, no PARTITION BY
        df = over_df(spark, RANGE_OVER_DATA, "a long, b int, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT c, b, COUNT(a) OVER w AS cnt, SUM(a) OVER w AS s "
            "FROM T1 WINDOW w AS (ORDER BY rowtime "
            " RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [("Hello", 1, 1, 1), ("Hello", 15, 2, 2), ("Hello", 16, 3, 3),
             ("Hello", 2, 6, 9), ("Hello", 3, 6, 9), ("Hello", 2, 6, 9),
             ("Hello", 3, 4, 9), ("Hello", 4, 2, 7), ("Hello", 5, 2, 9),
             ("Hello", 6, 2, 11), ("Hello", 65, 2, 12),
             ("Hello", 9, 2, 12), ("Hello", 9, 2, 12), ("Hello", 18, 3, 18),
             ("Hello World", 7, 4, 25), ("Hello World", 17, 3, 21),
             ("Hello World", 77, 3, 21), ("Hello World", 18, 1, 7),
             ("Hello World", 8, 2, 15), ("Hello World", 20, 1, 20)],
        )

    def test_bounded_partitioned_rows_over(self, spark):
        # OverWindowITCase.scala:332
        data = [
            ("L", 1, (1, 1, "Hello")), ("L", 2, (2, 2, "Hello")),
            ("L", 1, (1, 1, "Hello")), ("L", 2, (2, 2, "Hello")),
            ("L", 2, (2, 2, "Hello")), ("L", 1, (1, 1, "Hello")),
            ("L", 3, (7, 7, "Hello World")), ("L", 1, (7, 7, "Hello World")),
            ("L", 1, (7, 7, "Hello World")),
            ("W", 2),
            ("L", 3, (3, 3, "Hello")), ("L", 4, (4, 4, "Hello")),
            ("L", 5, (5, 5, "Hello")), ("L", 6, (6, 6, "Hello")),
            ("L", 20, (20, 20, "Hello World")),
            ("W", 6),
            ("L", 8, (8, 8, "Hello World")), ("L", 7, (7, 7, "Hello World")),
            ("W", 20),
        ]
        df = over_df(spark, data, "a long, b int, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT c, a, "
            " SUM(CASE WHEN a > 4 THEN 1 ELSE 0 END) OVER w AS ltcnt, "
            " COUNT(1) OVER w AS cnt, SUM(a) OVER w AS s "
            "FROM T1 WINDOW w AS (PARTITION BY c ORDER BY rowtime, seq "
            " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [("Hello", 1, 0, 1, 1), ("Hello", 1, 0, 2, 2), ("Hello", 1, 0, 3, 3),
             ("Hello", 2, 0, 3, 4), ("Hello", 2, 0, 3, 5), ("Hello", 2, 0, 3, 6),
             ("Hello", 3, 0, 3, 7), ("Hello", 4, 0, 3, 9), ("Hello", 5, 1, 3, 12),
             ("Hello", 6, 2, 3, 15),
             ("Hello World", 7, 1, 1, 7), ("Hello World", 7, 2, 2, 14),
             ("Hello World", 7, 3, 3, 21), ("Hello World", 7, 3, 3, 21),
             ("Hello World", 8, 3, 3, 22), ("Hello World", 20, 3, 3, 35)],
        )

    def test_bounded_nonpartitioned_rows_over(self, spark):
        # OverWindowITCase.scala:464 — includes an explicitly-late row that
        # the replay must drop (marked "// late row" in the reference).
        data = [
            ("L", 2, (2, 2, "Hello")), ("L", 2, (2, 2, "Hello")),
            ("L", 1, (1, 1, "Hello")), ("L", 1, (1, 1, "Hello")),
            ("L", 2, (2, 2, "Hello")), ("L", 1, (1, 1, "Hello")),
            ("L", 20, (20, 20, "Hello World")),
            ("W", 3),
            ("L", 2, (2, 2, "Hello")),  # late row — dropped
            ("L", 3, (3, 3, "Hello")), ("L", 4, (4, 4, "Hello")),
            ("L", 5, (5, 5, "Hello")), ("L", 6, (6, 6, "Hello")),
            ("L", 7, (7, 7, "Hello World")),
            ("W", 7),
            ("L", 9, (9, 9, "Hello World")), ("L", 8, (8, 8, "Hello World")),
            ("L", 8, (8, 8, "Hello World")),
            ("W", 20),
        ]
        rows = replay(data)
        assert len(rows) == 15  # 16 arrivals + the dropped late row
        df = spark.createDataFrame(rows, "seq int, rowtime long, a long, b int, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT c, a, COUNT(a) OVER w AS cnt, SUM(a) OVER w AS s "
            "FROM T1 WINDOW w AS (ORDER BY rowtime, seq "
            " ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [("Hello", 1, 1, 1), ("Hello", 1, 2, 2), ("Hello", 1, 3, 3),
             ("Hello", 2, 3, 4), ("Hello", 2, 3, 5), ("Hello", 2, 3, 6),
             ("Hello", 3, 3, 7), ("Hello", 4, 3, 9), ("Hello", 5, 3, 12),
             ("Hello", 6, 3, 15), ("Hello World", 7, 3, 18),
             ("Hello World", 8, 3, 21), ("Hello World", 8, 3, 23),
             ("Hello World", 9, 3, 25), ("Hello World", 20, 3, 37)],
        )

    UNBOUNDED_RANGE_DATA = [
        ("L", 14000005, (1, 1, "Hi")),
        ("L", 14000000, (2, 1, "Hello")),
        ("L", 14000002, (1, 1, "Hello")),
        ("L", 14000002, (1, 2, "Hello")),
        ("L", 14000002, (1, 3, "Hello world")),
        ("L", 14000003, (2, 2, "Hello world")),
        ("L", 14000003, (2, 3, "Hello world")),
        ("W", 14000020),
        ("L", 14000021, (1, 4, "Hello world")),
        ("L", 14000022, (1, 5, "Hello world")),
        ("L", 14000022, (1, 6, "Hello world")),
        ("L", 14000022, (1, 7, "Hello world")),
        ("L", 14000023, (2, 4, "Hello world")),
        ("L", 14000023, (2, 5, "Hello world")),
        ("W", 14000030),
    ]

    def test_unbounded_partitioned_range_over(self, spark):
        # OverWindowITCase.scala:523 — Calcite BIGINT AVG truncates → DIV
        df = over_df(spark, self.UNBOUNDED_RANGE_DATA, "a int, b long, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT a, b, c, "
            " SUM(CASE WHEN b > 4 THEN 1 ELSE 0 END) OVER w AS ltcnt, "
            " SUM(b) OVER w AS s, COUNT(b) OVER w AS cnt, "
            " SUM(b) OVER w DIV COUNT(b) OVER w AS avg, "
            " MAX(b) OVER w AS mx, MIN(b) OVER w AS mn "
            "FROM T1 WINDOW w AS (PARTITION BY a ORDER BY rowtime "
            " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [(1, 1, "Hello", 0, 6, 3, 2, 3, 1),
             (1, 2, "Hello", 0, 6, 3, 2, 3, 1),
             (1, 3, "Hello world", 0, 6, 3, 2, 3, 1),
             (1, 1, "Hi", 0, 7, 4, 1, 3, 1),
             (2, 1, "Hello", 0, 1, 1, 1, 1, 1),
             (2, 2, "Hello world", 0, 6, 3, 2, 3, 1),
             (2, 3, "Hello world", 0, 6, 3, 2, 3, 1),
             (1, 4, "Hello world", 0, 11, 5, 2, 4, 1),
             (1, 5, "Hello world", 3, 29, 8, 3, 7, 1),
             (1, 6, "Hello world", 3, 29, 8, 3, 7, 1),
             (1, 7, "Hello world", 3, 29, 8, 3, 7, 1),
             (2, 4, "Hello world", 1, 15, 5, 3, 5, 1),
             (2, 5, "Hello world", 1, 15, 5, 3, 5, 1)],
        )

    def test_unbounded_nonpartitioned_range_over(self, spark):
        # OverWindowITCase.scala:662
        df = over_df(spark, self.UNBOUNDED_RANGE_DATA, "a int, b long, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT a, b, c, SUM(b) OVER w AS s, COUNT(b) OVER w AS cnt, "
            " SUM(b) OVER w DIV COUNT(b) OVER w AS avg, "
            " MAX(b) OVER w AS mx, MIN(b) OVER w AS mn "
            "FROM T1 WINDOW w AS (ORDER BY rowtime "
            " RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [(2, 1, "Hello", 1, 1, 1, 1, 1),
             (1, 1, "Hello", 7, 4, 1, 3, 1),
             (1, 2, "Hello", 7, 4, 1, 3, 1),
             (1, 3, "Hello world", 7, 4, 1, 3, 1),
             (2, 2, "Hello world", 12, 6, 2, 3, 1),
             (2, 3, "Hello world", 12, 6, 2, 3, 1),
             (1, 1, "Hi", 13, 7, 1, 3, 1),
             (1, 4, "Hello world", 17, 8, 2, 4, 1),
             (1, 5, "Hello world", 35, 11, 3, 7, 1),
             (1, 6, "Hello world", 35, 11, 3, 7, 1),
             (1, 7, "Hello world", 35, 11, 3, 7, 1),
             (2, 4, "Hello world", 44, 13, 3, 7, 1),
             (2, 5, "Hello world", 44, 13, 3, 7, 1)],
        )

    def test_unbounded_partitioned_rows_over(self, spark):
        # OverWindowITCase.scala:592
        data = [
            ("L", 14000005, (1, 1, "Hi")),
            ("L", 14000000, (2, 1, "Hello")),
            ("L", 14000002, (3, 1, "Hello")),
            ("L", 14000003, (1, 2, "Hello")),
            ("L", 14000004, (1, 3, "Hello world")),
            ("L", 14000007, (3, 2, "Hello world")),
            ("L", 14000008, (2, 2, "Hello world")),
            ("W", 14000010),
            ("L", 14000012, (1, 5, "Hello world")),
            ("L", 14000021, (1, 6, "Hello world")),
            ("L", 14000023, (2, 5, "Hello world")),
            ("W", 14000020),
            ("L", 14000024, (3, 5, "Hello world")),
            ("L", 14000026, (1, 7, "Hello world")),
            ("L", 14000025, (1, 8, "Hello world")),
            ("L", 14000022, (1, 9, "Hello world")),
            ("W", 14000030),
        ]
        df = over_df(spark, data, "a int, b long, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT a, b, c, "
            " SUM(CASE WHEN b > 4 THEN 1 ELSE 0 END) OVER w AS ltcnt, "
            " SUM(b) OVER w AS s, COUNT(b) OVER w AS cnt, "
            " SUM(b) OVER w DIV COUNT(b) OVER w AS avg, "
            " MAX(b) OVER w AS mx, MIN(b) OVER w AS mn "
            "FROM T1 WINDOW w AS (PARTITION BY a ORDER BY rowtime, seq "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [(1, 2, "Hello", 0, 2, 1, 2, 2, 2),
             (1, 3, "Hello world", 0, 5, 2, 2, 3, 2),
             (1, 1, "Hi", 0, 6, 3, 2, 3, 1),
             (2, 1, "Hello", 0, 1, 1, 1, 1, 1),
             (2, 2, "Hello world", 0, 3, 2, 1, 2, 1),
             (3, 1, "Hello", 0, 1, 1, 1, 1, 1),
             (3, 2, "Hello world", 0, 3, 2, 1, 2, 1),
             (1, 5, "Hello world", 1, 11, 4, 2, 5, 1),
             (1, 6, "Hello world", 2, 17, 5, 3, 6, 1),
             (1, 9, "Hello world", 3, 26, 6, 4, 9, 1),
             (1, 8, "Hello world", 4, 34, 7, 4, 9, 1),
             (1, 7, "Hello world", 5, 41, 8, 5, 9, 1),
             (2, 5, "Hello world", 1, 8, 3, 2, 5, 1),
             (3, 5, "Hello world", 1, 8, 3, 2, 5, 1)],
        )

    def test_unbounded_nonpartitioned_rows_over(self, spark):
        # OverWindowITCase.scala:724 — one late element, discarded
        data = [
            ("L", 14000005, (1, 1, "Hi")),
            ("L", 14000000, (2, 2, "Hello")),
            ("L", 14000002, (3, 5, "Hello")),
            ("L", 14000003, (1, 3, "Hello")),
            ("L", 14000004, (3, 7, "Hello world")),
            ("L", 14000007, (4, 9, "Hello world")),
            ("L", 14000008, (5, 8, "Hello world")),
            ("W", 14000010),
            ("L", 14000008, (6, 8, "Hello world")),  # late — discarded
            ("W", 14000020),
            ("L", 14000021, (6, 8, "Hello world")),
            ("W", 14000030),
        ]
        rows = replay(data)
        assert len(rows) == 8
        df = spark.createDataFrame(rows, "seq int, rowtime long, a int, b long, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT a, b, c, SUM(b) OVER w AS s, COUNT(b) OVER w AS cnt, "
            " SUM(b) OVER w DIV COUNT(b) OVER w AS avg, "
            " MAX(b) OVER w AS mx, MIN(b) OVER w AS mn "
            "FROM T1 WINDOW w AS (ORDER BY rowtime, seq "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [(2, 2, "Hello", 2, 1, 2, 2, 2),
             (3, 5, "Hello", 7, 2, 3, 5, 2),
             (1, 3, "Hello", 10, 3, 3, 5, 2),
             (3, 7, "Hello world", 17, 4, 4, 7, 2),
             (1, 1, "Hi", 18, 5, 3, 7, 1),
             (4, 9, "Hello world", 27, 6, 4, 9, 1),
             (5, 8, "Hello world", 35, 7, 5, 9, 1),
             (6, 8, "Hello world", 43, 8, 5, 9, 1)],
        )

    def test_unbounded_partitioned_rows_over2(self, spark):
        # OverWindowITCase.scala:780 — SIX late elements across two
        # watermarks, all discarded; equal-ts rows (a=1 at 14000021) keep
        # arrival order in the ROWS frame.
        data = [
            ("L", 14000005, (1, 1, "Hi")),
            ("L", 14000000, (2, 1, "Hello")),
            ("L", 14000002, (3, 1, "Hello")),
            ("L", 14000003, (1, 2, "Hello")),
            ("L", 14000004, (1, 3, "Hello world")),
            ("L", 14000007, (3, 2, "Hello world")),
            ("L", 14000008, (2, 2, "Hello world")),
            ("W", 14000010),
            ("L", 14000008, (1, 4, "Hello world")),  # late
            ("L", 14000008, (2, 3, "Hello world")),  # late
            ("L", 14000008, (3, 3, "Hello world")),  # late
            ("L", 14000012, (1, 5, "Hello world")),
            ("W", 14000020),
            ("L", 14000021, (1, 6, "Hello world")),
            ("L", 14000019, (1, 6, "Hello world")),  # late
            ("L", 14000018, (2, 4, "Hello world")),  # late
            ("L", 14000018, (3, 4, "Hello world")),  # late
            ("L", 14000022, (2, 5, "Hello world")),
            ("L", 14000022, (3, 5, "Hello world")),
            ("L", 14000024, (1, 7, "Hello world")),
            ("L", 14000023, (1, 8, "Hello world")),
            ("L", 14000021, (1, 9, "Hello world")),
            ("W", 14000030),
        ]
        rows = replay(data)
        assert len(rows) == 14
        df = spark.createDataFrame(rows, "seq int, rowtime long, a int, b long, c string")
        df.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT a, b, c, SUM(b) OVER w AS s, COUNT(b) OVER w AS cnt, "
            " SUM(b) OVER w DIV COUNT(b) OVER w AS avg, "
            " MAX(b) OVER w AS mx, MIN(b) OVER w AS mn "
            "FROM T1 WINDOW w AS (PARTITION BY a ORDER BY rowtime, seq "
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        )
        same(
            res,
            [(1, 2, "Hello", 2, 1, 2, 2, 2),
             (1, 3, "Hello world", 5, 2, 2, 3, 2),
             (1, 1, "Hi", 6, 3, 2, 3, 1),
             (2, 1, "Hello", 1, 1, 1, 1, 1),
             (2, 2, "Hello world", 3, 2, 1, 2, 1),
             (3, 1, "Hello", 1, 1, 1, 1, 1),
             (3, 2, "Hello world", 3, 2, 1, 2, 1),
             (1, 5, "Hello world", 11, 4, 2, 5, 1),
             (1, 6, "Hello world", 17, 5, 3, 6, 1),
             (1, 9, "Hello world", 26, 6, 4, 9, 1),
             (1, 8, "Hello world", 34, 7, 4, 9, 1),
             (1, 7, "Hello world", 41, 8, 5, 9, 1),
             (2, 5, "Hello world", 8, 3, 2, 5, 1),
             (3, 5, "Hello world", 8, 3, 2, 5, 1)],
        )


# ---------------------------------------------------------------------------
# SqlITCase.scala — event-time group windows, unbounded (retract) group
# aggregates, COLLECT, UNNEST. Group-window SQL goes through
# rewrite_flink_sql VERBATIM (modulo rowtime column name).
# ---------------------------------------------------------------------------

SQL_DATA = [
    (1000, "1", "Hello"), (2000, "2", "Hello"), (3000, None, "Hello"),
    (4000, "4", "Hello"), (5000, None, "Hello"), (6000, "6", "Hello"),
    (7000, "7", "Hello World"), (8000, "8", "Hello World"),
    (20000, "20", "Hello World"),
]


@pytest.fixture(scope="module")
def sql_t1(spark):
    return spark.createDataFrame(SQL_DATA, "a long, b string, c string").withColumn(
        "rowtime", F.timestamp_millis(F.col("a"))
    )


@pytest.fixture(scope="module")
def t3s(spark):
    from tests.test_dataset_itcases import ROWS3

    return spark.createDataFrame(ROWS3, "a int, b long, c string")


@pytest.fixture(scope="module")
def t5s(spark):
    from tests.test_dataset_itcases import ROWS5

    return spark.createDataFrame(ROWS5, "a int, b long, c int, d string, e long")


class TestStreamSql:
    def test_distinct_agg_with_merge_on_session_window(self, spark):
        # SqlITCase.scala:57 — 5ms session windows MERGE under disorder;
        # COUNT(DISTINCT b) dedups across the merged window.
        rows = [(1, 2, "Hello"), (2, 2, "Hello"), (8, 2, "Hello"), (10, 3, "Hello"),
                (9, 9, "Hello World"), (4, 1, "Hello"), (16, 16, "Hello")]
        df = spark.createDataFrame(rows, "a long, b int, c string").withColumn(
            "rowtime", F.timestamp_millis(F.col("a"))
        )
        df.createOrReplaceTempView("MyTable")
        sql = rewrite_flink_sql(
            "SELECT c, COUNT(DISTINCT b) AS cnt, "
            " SESSION_END(rowtime, INTERVAL '0.005' SECOND) AS w_end "
            "FROM MyTable "
            "GROUP BY SESSION(rowtime, INTERVAL '0.005' SECOND), c"
        )
        res = spark.sql(sql).select("c", "cnt", F.unix_millis("w_end").alias("ms"))
        same(res, [("Hello World", 1, 14), ("Hello", 1, 21), ("Hello", 3, 15)])

    def test_distinct_agg_on_rowtime_tumble_window(self, spark, t5s):
        # SqlITCase.scala:100 — rowtime = b as RAW epoch millis (1..15 ms,
        # so a 5-SECOND tumble puts each key's rows in one window)
        df = t5s.withColumn("rowtime", F.timestamp_millis(F.col("b")))
        df.createOrReplaceTempView("MyTable")
        sql = rewrite_flink_sql(
            "SELECT a, SUM(DISTINCT e) AS s, MIN(DISTINCT e) AS mn, "
            " COUNT(DISTINCT e) AS cnt "
            "FROM MyTable GROUP BY a, TUMBLE(rowtime, INTERVAL '5' SECOND)"
        )
        res = spark.sql(sql).select("a", "s", "mn", "cnt")
        same(res, [(1, 1, 1, 1), (2, 3, 1, 2), (3, 5, 2, 2), (4, 3, 1, 2), (5, 6, 1, 3)])

    def test_rowtime_tumble_window(self, spark, sql_t1):
        # SqlITCase.scala:134 — COUNT(*) vs COUNT(b) with NULL b
        sql_t1.createOrReplaceTempView("T1")
        sql = rewrite_flink_sql(
            "SELECT c, COUNT(*) AS c1, COUNT(1) AS c2, COUNT(b) AS c3 FROM T1 "
            "GROUP BY TUMBLE(rowtime, interval '5' SECOND), c"
        )
        res = spark.sql(sql).select("c", "c1", "c2", "c3")
        same(
            res,
            [("Hello World", 2, 2, 2), ("Hello World", 1, 1, 1),
             ("Hello", 4, 4, 3), ("Hello", 2, 2, 1)],
        )

    def test_non_windowed_count(self, spark, sql_t1):
        # SqlITCase.scala:163 — retract stream's final table == batch agg
        sql_t1.createOrReplaceTempView("T1")
        res = spark.sql(
            "SELECT c, COUNT(*) AS c1, COUNT(1) AS c2, COUNT(b) AS c3 FROM T1 GROUP BY c"
        )
        same(res, [("Hello World", 3, 3, 3), ("Hello", 6, 6, 4)])

    def test_row_register(self, spark):
        # SqlITCase.scala:189
        df = spark.createDataFrame(
            [("Hello", "Worlds", 1), ("Hello", "Hiden", 5), ("Hello again", "Worlds", 2)],
            "a string, b string, c int",
        )
        df.createOrReplaceTempView("MyTableRow")
        res = spark.sql("SELECT * FROM MyTableRow WHERE c < 3")
        same(res, [("Hello", "Worlds", 1), ("Hello again", "Worlds", 2)])

    def test_unbounded_group_by(self, spark, t3s):
        # SqlITCase.scala:222
        t3s.createOrReplaceTempView("MyTable")
        res = spark.sql("SELECT b, COUNT(a) AS cnt FROM MyTable GROUP BY b")
        same(res, [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6)])

    def test_distinct_group_by(self, spark, t3s):
        # SqlITCase.scala:242 — Calcite a/3 is integer division → DIV
        t3s.createOrReplaceTempView("MyTable")
        res = spark.sql(
            "SELECT b, SUM(DISTINCT (a DIV 3)) AS s, "
            " COUNT(DISTINCT SUBSTRING(c FROM 1 FOR 2)) AS c1, "
            " COUNT(DISTINCT c) AS c2 "
            "FROM MyTable GROUP BY b"
        )
        same(
            res,
            [(1, 0, 1, 1), (2, 1, 1, 2), (3, 3, 3, 3),
             (4, 5, 1, 4), (5, 12, 1, 5), (6, 18, 1, 6)],
        )

    def test_unbounded_group_by_collect(self, spark, t3s):
        # SqlITCase.scala:268 — COLLECT → multiset Map<elem, count>
        res = t3s.groupBy("b").agg(collect_multiset("a").alias("set"))
        got = {r["b"]: dict(r["set"]) for r in res.collect()}
        assert got == {
            1: {1: 1}, 2: {2: 1, 3: 1}, 3: {4: 1, 5: 1, 6: 1},
            4: {7: 1, 8: 1, 9: 1, 10: 1}, 5: {11: 1, 12: 1, 13: 1, 14: 1, 15: 1},
            6: {16: 1, 17: 1, 18: 1, 19: 1, 20: 1, 21: 1},
        }

    def test_unbounded_group_by_collect_with_object(self, spark):
        # SqlITCase.scala:295 — COLLECT over a struct column
        df = spark.createDataFrame(
            [(1, 1, (12, "45.6")), (2, 2, (12, "45.612")), (3, 2, (13, "41.6")),
             (4, 3, (14, "45.2136")), (5, 3, (18, "42.6"))],
            "a int, b int, c struct<f0:int, f1:string>",
        )
        res = df.groupBy("b").agg(collect_multiset("c").alias("set"))
        got = {r["b"]: {tuple(k): v for k, v in r["set"].items()} for r in res.collect()}
        assert got == {
            1: {(12, "45.6"): 1},
            2: {(12, "45.612"): 1, (13, "41.6"): 1},
            3: {(14, "45.2136"): 1, (18, "42.6"): 1},
        }

    def test_unnest_primitive_array_from_table(self, spark):
        # SqlITCase.scala:509
        df = spark.createDataFrame(
            [(1, [12, 45], [[12, 45]]), (2, [41, 5], [[18], [87]]), (3, [18, 42], [[1], [45]])],
            "a int, b array<int>, c array<array<int>>",
        )
        res = unnest(df, "b", alias="s", keep=["a", "b"])
        same(
            res,
            [(1, [12, 45], 12), (1, [12, 45], 45), (2, [41, 5], 41),
             (2, [41, 5], 5), (3, [18, 42], 18), (3, [18, 42], 42)],
        )

    def test_unnest_array_of_array_from_table(self, spark):
        # SqlITCase.scala:540
        df = spark.createDataFrame(
            [(1, [12, 45], [[12, 45]]), (2, [41, 5], [[18], [87]]), (3, [18, 42], [[1], [45]])],
            "a int, b array<int>, c array<array<int>>",
        )
        res = unnest(df, "c", alias="s", keep=["a"])
        same(res, [(1, [12, 45]), (2, [18]), (2, [87]), (3, [1]), (3, [45])])

    def test_unnest_object_array_from_table_with_filter(self, spark):
        # SqlITCase.scala:569
        df = spark.createDataFrame(
            [(1, [(12, "45.6"), (12, "45.612")]), (2, [(13, "41.6"), (14, "45.2136")]),
             (3, [(18, "42.6")])],
            "a int, b array<struct<s:int, t:string>>",
        )
        res = (
            unnest(df, "b", alias="e", keep=["a"])
            .select("a", F.col("e.s").alias("s"), F.col("e.t").alias("t"))
            .filter(F.col("s") > 13)
        )
        same(res, [(2, 14, "45.2136"), (3, 18, "42.6")])

    def test_unnest_multiset_from_collect_result(self, spark):
        # SqlITCase.scala:595 — COLLECT to a multiset, then UNNEST its keys
        df = spark.createDataFrame(
            [(1, 1, (12, "45.6")), (2, 2, (12, "45.612")), (3, 2, (13, "41.6")),
             (4, 3, (14, "45.2136")), (5, 3, (18, "42.6"))],
            "a int, b int, c struct<id:int, point:string>",
        )
        t2 = df.groupBy("b").agg(collect_multiset("c").alias("set"))
        res = (
            t2.filter(F.col("b") < 3)
            .select("b", F.explode(F.map_keys(F.col("set"))).alias("e"))
            .select("b", F.col("e.id").alias("id"), F.col("e.point").alias("point"))
        )
        same(res, [(1, 12, "45.6"), (2, 12, "45.612"), (2, 13, "41.6")])

    def test_left_unnest_multiset_from_collect_result(self, spark):
        # SqlITCase.scala:626 — COLLECT skips NULLs; LEFT UNNEST keeps the
        # empty-set group with a NULL element.
        df = spark.createDataFrame(
            [(1, "1", "Hello"), (1, "2", "Hello2"), (2, "2", "Hello"),
             (3, None, "Hello"), (4, "4", "Hello"), (5, "5", "Hello"),
             (5, None, "Hello"), (6, "6", "Hello"), (7, "7", "Hello World"),
             (7, "8", "Hello World")],
            "a int, b string, c string",
        )
        t2 = df.groupBy("a").agg(F.collect_list("b").alias("set"))
        res = unnest(t2.filter(F.col("a") < 5), "set", alias="s", keep=["a"], outer=True)
        same(res, [(1, "1"), (1, "2"), (2, "2"), (3, None), (4, "4")])

    def test_hop_start_end_with_having(self, spark):
        # SqlITCase.scala:666 — HAVING over window aggregate + QUARTER() of
        # the window start prunes everything but one 1-minute hop.
        data = [
            ("L", 14000005, (1, 1, "Hi")),
            ("L", 14000000, (2, 1, "Hello")),
            ("L", 14000002, (3, 1, "Hello")),
            ("W", 14000010),
            ("L", 8640000000, (4, 1, "Hello")),
            ("L", 8640000001, (4, 1, "Hello")),
            ("W", 8640000010),
        ]
        rows = replay(data)
        df = spark.createDataFrame(rows, "seq int, ts long, a int, b long, c string").withColumn(
            "rowtime", F.timestamp_millis(F.col("ts"))
        )
        df.createOrReplaceTempView("T1")
        sql = rewrite_flink_sql(
            "SELECT c AS k, COUNT(a) AS v, "
            " HOP_START(rowtime, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE) AS windowStart, "
            " HOP_END(rowtime, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE) AS windowEnd "
            "FROM T1 "
            "GROUP BY HOP(rowtime, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE), c "
            "HAVING SUM(b) > 1 AND "
            " QUARTER(HOP_START(rowtime, INTERVAL '1' MINUTE, INTERVAL '1' MINUTE)) = 1"
        )
        res = spark.sql(sql).select(
            "k", "v", F.unix_millis("windowStart").alias("ws"), F.unix_millis("windowEnd").alias("we")
        )
        # 1970-01-01 03:53:00.0 / 03:54:00.0 UTC
        same(res, [("Hello", 2, 13980000, 14040000)])


# ---------------------------------------------------------------------------
# stream/sql/JoinITCase.scala — rowtime interval joins (t1.rt BETWEEN
# t2.rt - 5s AND t2.rt + 6s) through operators.joins.interval_join; the
# final append-stream multiset equals the batch interval join. NULL keys
# never match (SQL equi-join semantics). ``residual`` carries Flink's
# otherCondition inside the join, where it decides null-padding.
# ---------------------------------------------------------------------------


class TestRowTimeIntervalJoinSql:
    def _t(self, spark, rows):
        return spark.createDataFrame(rows, "key string, id string, t long").withColumn(
            "rt", F.timestamp_millis(F.col("t"))
        )

    def test_rowtime_inner_join(self, spark):
        # JoinITCase.scala:135 — incl. the 999ms boundary row and NULL keys
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = self._t(spark, [
            ("A", "LEFT0.999", 999), ("A", "LEFT1", 1000), ("A", "LEFT2", 2000),
            ("A", "LEFT3", 3000), ("B", "LEFT4", 4000), ("A", "LEFT5", 5000),
            ("A", "LEFT6", 6000), (None, "LEFT8", 8000),
        ])
        t2 = self._t(spark, [
            ("A", "RIGHT6", 6000), ("B", "RIGHT7", 7000), (None, "RIGHT10", 10000),
        ]).select(F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2"))
        # t1.rt BETWEEN t2.rt-5s AND t2.rt+6s  ==  left=t2: right_ts in
        # [left_ts - 5s, left_ts + 6s]
        res = interval_join(
            t2, t1, [("k2", "key")], "rt2", "rt", "5 seconds", "6 seconds"
        ).select("k2", "id2", "id")
        got = sorted(tuple(r) for r in res.collect())
        assert got == sorted([
            ("A", "RIGHT6", "LEFT1"), ("A", "RIGHT6", "LEFT2"),
            ("A", "RIGHT6", "LEFT3"), ("A", "RIGHT6", "LEFT5"),
            ("A", "RIGHT6", "LEFT6"), ("B", "RIGHT7", "LEFT4"),
        ])

    def test_rowtime_inner_join_with_equi_time_attrs(self, spark):
        # JoinITCase.scala:194 — rt equality join (zero-width interval)
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = spark.createDataFrame(
            [(4, 4000, "A", 4000), (5, 5000, "A", 5000), (6, 6000, "A", 6000),
             (6, 6000, "B", 6000)],
            "id int, tm long, key string, t long",
        ).withColumn("rt", F.timestamp_millis(F.col("t")))
        t2 = self._t(spark, [("A", "R-5", 5000), ("B", "R-6", 6000)]).select(
            F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2")
        )
        res = interval_join(
            t2, t1, [("k2", "key")], "rt2", "rt", "0 seconds", "0 seconds"
        ).select("k2", "id2", "id")
        got = sorted(tuple(r) for r in res.collect())
        assert got == sorted([("A", "R-5", 5), ("B", "R-6", 6)])

    LEFT_DATA = [
        ("A", "L-1", 1000), ("A", "L-2", 2000), ("B", "L-4", 4000),
        ("B", "L-5", 5000), ("A", "L-6", 6000), ("C", "L-7", 7000),
        ("A", "L-10", 10000), ("A", "L-12", 12000), ("A", "L-20", 20000),
    ]

    def test_rowtime_left_outer_join(self, spark):
        # JoinITCase.scala:508 — LEFT OUTER with the residual t1.id <> 'L-5'
        # inside the join condition (L-5 must null-pad, not vanish)
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = self._t(spark, self.LEFT_DATA)
        t2 = self._t(spark, [
            ("A", "R-6", 6000), ("B", "R-7", 7000), ("D", "R-8", 8000),
            ("A", "R-11", 11000),
        ]).select(F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2"))
        # preserve T1 → left=t1; t1.rt ∈ [t2.rt-5s, t2.rt+6s] ⇔
        # t2.rt ∈ [t1.rt-6s, t1.rt+5s]
        res = interval_join(
            t1, t2, [("key", "k2")], "rt", "rt2", "6 seconds", "5 seconds",
            how="left", residual=F.col("id") != "L-5",
        ).select("key", "id2", "id")
        got = sorted((tuple(r) for r in res.collect()), key=str)
        assert got == sorted([
            ("A", "R-6", "L-1"), ("A", "R-6", "L-2"), ("A", "R-6", "L-6"),
            ("A", "R-6", "L-10"), ("A", "R-6", "L-12"), ("B", "R-7", "L-4"),
            ("A", "R-11", "L-6"), ("A", "R-11", "L-10"), ("A", "R-11", "L-12"),
            ("B", None, "L-5"), ("C", None, "L-7"), ("A", None, "L-20"),
        ], key=str)

    def test_rowtime_left_outer_join_negative_window_size(self, spark):
        # JoinITCase.scala:573 — empty interval: every left row null-pads
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = self._t(spark, [("A", "L-1", 1000), ("B", "L-4", 4000), ("C", "L-7", 7000)])
        t2 = self._t(spark, [("A", "R-6", 6000), ("B", "R-7", 7000), ("D", "R-8", 8000)]).select(
            F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2")
        )
        # t1.rt BETWEEN t2.rt+3s AND t2.rt+1s ⇔ t2.rt ∈ [t1.rt-3s, t1.rt-1s]
        # with lower > upper → empty window
        res = interval_join(
            t1, t2, [("key", "k2")], "rt", "rt2", "-1 seconds", "-3 seconds", how="left"
        ).select("k2", "id2", "id")
        got = sorted((tuple(r) for r in res.collect()), key=str)
        assert got == sorted(
            [(None, None, "L-1"), (None, None, "L-4"), (None, None, "L-7")], key=str
        )

    def test_rowtime_right_outer_join(self, spark):
        # JoinITCase.scala:662 — residual t2.id <> 'R-5' (R-5 null-pads)
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = self._t(spark, [
            ("A", "L-1", 1000), ("A", "L-2", 2000), ("B", "L-4", 4000),
            ("A", "L-6", 6000), ("C", "L-7", 7000), ("A", "L-10", 10000),
            ("A", "L-12", 12000),
        ])
        t2 = self._t(spark, [
            ("A", "R-5", 5000), ("A", "R-6", 6000), ("B", "R-7", 7000),
            ("D", "R-8", 8000), ("A", "R-20", 20000),
        ]).select(F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2"))
        res = interval_join(
            t1, t2, [("key", "k2")], "rt", "rt2", "6 seconds", "5 seconds",
            how="right", residual=F.col("id2") != "R-5",
        ).select("k2", "id2", "id")
        got = sorted((tuple(r) for r in res.collect()), key=str)
        assert got == sorted([
            ("A", "R-5", None), ("A", "R-6", "L-1"), ("A", "R-6", "L-2"),
            ("A", "R-6", "L-6"), ("A", "R-6", "L-10"), ("A", "R-6", "L-12"),
            ("A", "R-20", None), ("B", "R-7", "L-4"), ("D", "R-8", None),
        ], key=str)

    def test_rowtime_full_outer_join(self, spark):
        # JoinITCase.scala:812 — NOT (t1.id='L-5' OR t2.id='R-5') residual
        from flink_1_6_0_spark.operators.joins import interval_join

        t1 = self._t(spark, self.LEFT_DATA)
        t2 = self._t(spark, [
            ("A", "R-5", 5000), ("A", "R-6", 6000), ("B", "R-7", 7000), ("D", "R-8", 8000),
        ]).select(F.col("key").alias("k2"), F.col("id").alias("id2"), F.col("rt").alias("rt2"))
        res = interval_join(
            t1, t2, [("key", "k2")], "rt", "rt2", "6 seconds", "5 seconds",
            how="full", residual=~((F.col("id") == "L-5") | (F.col("id2") == "R-5")),
        ).select("k2", "id2", "id")
        got = sorted((tuple(r) for r in res.collect()), key=str)
        assert got == sorted([
            ("A", "R-6", "L-1"), ("A", "R-6", "L-2"), ("A", "R-6", "L-6"),
            ("A", "R-6", "L-10"), ("A", "R-6", "L-12"), ("B", "R-7", "L-4"),
            ("A", "R-5", None), ("D", "R-8", None),
            (None, None, "L-5"), (None, None, "L-7"), (None, None, "L-20"),
        ], key=str)


def test_stream_sort_event_time_order_by(spark):
    """stream/sql SortITCase.scala:39 testEventTimeOrderBy — ORDER BY
    rowtime, b on an event-time stream emits in exactly that order once
    each watermark finalizes a prefix; equal final SEQUENCE as the golden
    (order-sensitive compare, not a multiset)."""
    data = [
        ("L", 1500, (1, 15, "Hello")), ("L", 1600, (1, 16, "Hello")),
        ("L", 1000, (1, 1, "Hello")), ("L", 2000, (2, 2, "Hello")),
        ("W", 1000),
        ("L", 2000, (2, 2, "Hello")), ("L", 2000, (2, 3, "Hello")),
        ("L", 3000, (3, 3, "Hello")), ("L", 2000, (3, 1, "Hello")),
        ("W", 2000),
        ("L", 4000, (4, 4, "Hello")),
        ("W", 3000),
        ("L", 5000, (5, 5, "Hello")),
        ("W", 5000),
        ("L", 6000, (6, 65, "Hello")), ("L", 6000, (6, 6, "Hello")),
        ("L", 6000, (6, 67, "Hello")), ("L", 6000, (6, -1, "Hello")),
        ("L", 6000, (6, 6, "Hello")),
        ("W", 7000),
        ("L", 9000, (6, 9, "Hello")), ("L", 8500, (6, 18, "Hello")),
        ("L", 9000, (6, 7, "Hello")),
        ("W", 10000),
        ("L", 10000, (7, 7, "Hello World")), ("L", 11000, (7, 77, "Hello World")),
        ("L", 11000, (7, 17, "Hello World")),
        ("W", 12000),
        ("L", 14000, (7, 18, "Hello World")),
        ("W", 14000),
        ("L", 15000, (8, 8, "Hello World")),
        ("W", 17000),
        ("L", 20000, (20, 20, "Hello World")),
        ("W", 19000),
    ]
    rows = replay(data)
    df = spark.createDataFrame(rows, "seq int, rowtime long, a long, b int, c string")
    got = [r["b"] for r in df.orderBy("rowtime", "b").collect()]
    assert got == [
        1, 15, 16, 1, 2, 2, 3, 3, 4, 5, -1, 6, 6, 65, 67,
        18, 7, 9, 7, 17, 77, 18, 8, 20,
    ]


# ---------------------------------------------------------------------------
# stream/table/GroupWindowITCase.scala — event-time group windows through
# the Table API (table_api.Table.window_*). WeightedAvg(v, w) is the
# reference UDAF sum(v*w)/sum(w) with Calcite integer truncation; int.avg
# likewise truncates (→ DIV). Session windows MERGE under disorder; the
# slide>size panes exercise the gap-hop assigner (Flink allows it, Spark's
# window() does not — operators.windows.hop builds the pane directly).
# ---------------------------------------------------------------------------

GW_DATA2 = [
    (1, 1, "Hi"), (2, 2, "Hallo"), (3, 2, "Hello"), (4, 5, "Hello"),
    (7, 3, "Hello"), (8, 3, "Hello world"), (16, 4, "Hello world"),
    (32, 4, None),
]


def _gw_table(spark):
    from flink_1_6_0_spark.table_api import Table

    df = spark.createDataFrame(GW_DATA2, "long long, int int, string string").withColumn(
        "rowtime", F.timestamp_millis(F.col("long"))
    )
    return Table(df)


def _win_rows(t, spark):
    """(string, count, start_ms, end_ms) rows of a windowed count table."""
    out = t.to_data_frame()
    return sorted(
        (
            (r["string"], r["cnt"], int(r["w_start"].timestamp() * 1000),
             int(r["w_end"].timestamp() * 1000))
            for r in out.collect()
        ),
        key=str,
    )


class TestTableGroupWindow:
    def test_event_time_tumbling_window(self, spark):
        # GroupWindowITCase.scala:170 — 5ms tumble, full agg battery
        from flink_1_6_0_spark.table_api import Table

        data = [(1, 1, "Hi"), (2, 2, "Hello"), (4, 2, "Hello"),
                (8, 3, "Hello world"), (16, 3, "Hello world")]
        t = Table(
            spark.createDataFrame(data, "long long, int int, string string").withColumn(
                "rowtime", F.timestamp_millis(F.col("long"))
            )
        )
        out = (
            t.window_tumble("rowtime", "5 milliseconds")
            .group_by("string")
            .agg(
                "count(string) as cnt, sum(int) DIV count(int) as avg_int, "
                "sum(long * int) DIV sum(int) as wavg_long, "
                "sum(int * int) DIV sum(int) as wavg_int, "
                "min(int) as mn, max(int) as mx, sum(int) as s, "
                "count(distinct long) as cd"
            )
            .to_data_frame()
        )
        got = sorted(
            (r["string"], r["cnt"], r["avg_int"], r["wavg_long"], r["wavg_int"],
             r["mn"], r["mx"], r["s"],
             int(r["w_start"].timestamp() * 1000), int(r["w_end"].timestamp() * 1000),
             r["cd"])
            for r in out.collect()
        )
        assert got == sorted([
            ("Hello world", 1, 3, 8, 3, 3, 3, 3, 5, 10, 1),
            ("Hello world", 1, 3, 16, 3, 3, 3, 3, 15, 20, 1),
            ("Hello", 2, 2, 3, 2, 2, 2, 4, 0, 5, 2),
            ("Hi", 1, 1, 1, 1, 1, 1, 1, 0, 5, 1),
        ])

    def test_event_time_session_window_merge(self, spark):
        # GroupWindowITCase.scala:98 — 5ms session gap, out-of-order arrival
        # merges {1,2,8} with {4} into one [1,13) session
        from flink_1_6_0_spark.table_api import Table

        data = [(1, 1, "Hello"), (2, 2, "Hello"), (8, 8, "Hello"),
                (9, 9, "Hello World"), (4, 4, "Hello"), (16, 16, "Hello")]
        t = Table(
            spark.createDataFrame(data, "long long, int int, string string").withColumn(
                "rowtime", F.timestamp_millis(F.col("long"))
            )
        )
        out = (
            t.window_session("rowtime", "0.005 seconds")
            .group_by("string")
            .agg(
                "count(int) as cnt, sum(int) DIV count(int) as avg_int, "
                "sum(long * int) DIV sum(int) as wavg_long, "
                "sum(int * int) DIV sum(int) as wavg_int, "
                "count(distinct long) as cd"
            )
            .to_data_frame()
        )
        got = sorted(
            (r["string"], r["cnt"], r["avg_int"], r["wavg_long"], r["wavg_int"], r["cd"])
            for r in out.collect()
        )
        assert got == sorted([
            ("Hello World", 1, 9, 9, 9, 1),
            ("Hello", 1, 16, 16, 16, 1),
            ("Hello", 4, 3, 5, 5, 4),
        ])

    def test_sliding_overlapping_full_pane(self, spark):
        # GroupWindowITCase.scala:280 — Slide 10ms every 5ms
        t = _gw_table(spark)
        out = (
            t.window_hop("rowtime", "5 milliseconds", "10 milliseconds")
            .group_by("string")
            .agg("count(int) as cnt")
        )
        assert _win_rows(out, spark) == sorted([
            ("Hallo", 1, -5, 5), ("Hallo", 1, 0, 10),
            ("Hello world", 1, 0, 10), ("Hello world", 1, 5, 15),
            ("Hello world", 1, 10, 20), ("Hello world", 1, 15, 25),
            ("Hello", 1, 5, 15), ("Hello", 2, -5, 5), ("Hello", 3, 0, 10),
            ("Hi", 1, -5, 5), ("Hi", 1, 0, 10),
            (None, 1, 25, 35), (None, 1, 30, 40),
        ], key=str)

    def test_sliding_overlapping_split_pane(self, spark):
        # GroupWindowITCase.scala:320 — Slide 5ms every 4ms
        t = _gw_table(spark)
        out = (
            t.window_hop("rowtime", "4 milliseconds", "5 milliseconds")
            .group_by("string")
            .agg("count(int) as cnt")
        )
        assert _win_rows(out, spark) == sorted([
            ("Hallo", 1, 0, 5),
            ("Hello world", 1, 4, 9), ("Hello world", 1, 8, 13),
            ("Hello world", 1, 12, 17), ("Hello world", 1, 16, 21),
            ("Hello", 2, 0, 5), ("Hello", 2, 4, 9),
            ("Hi", 1, 0, 5),
            (None, 1, 28, 33), (None, 1, 32, 37),
        ], key=str)

    def test_sliding_nonoverlapping_full_pane_gap(self, spark):
        # GroupWindowITCase.scala:357 — Slide 5ms every 10ms: slide > size,
        # panes with GAPS; in-gap rows (ts 7, 8, 16) belong to NO window
        t = _gw_table(spark)
        out = (
            t.window_hop("rowtime", "10 milliseconds", "5 milliseconds")
            .group_by("string")
            .agg("count(int) as cnt")
        )
        assert _win_rows(out, spark) == sorted([
            ("Hallo", 1, 0, 5), ("Hello", 2, 0, 5),
            ("Hi", 1, 0, 5), (None, 1, 30, 35),
        ], key=str)

    def test_sliding_nonoverlapping_split_pane_gap(self, spark):
        # GroupWindowITCase.scala:388 — Slide 3ms every 10ms
        t = _gw_table(spark)
        out = (
            t.window_hop("rowtime", "10 milliseconds", "3 milliseconds")
            .group_by("string")
            .agg("count(int) as cnt")
        )
        assert _win_rows(out, spark) == sorted([
            ("Hallo", 1, 0, 3), ("Hi", 1, 0, 3), (None, 1, 30, 33),
        ], key=str)


# ---------------------------------------------------------------------------
# stream/table/CorrelateITCase.scala — table functions (UDTF) joined through
# operators.correlate.join_lateral. TableFunc0 splits 'name#age' into
# (name, age) and emits NOTHING for strings without '#'.
# ---------------------------------------------------------------------------

CORRELATE_DATA = [(1, 1, "Jack#22"), (2, 2, "John#19"), (3, 2, "Anna#44"), (4, 3, "nosharp")]


def _func0(col):
    """TableFunc0: 0-or-1 rows of struct(name, age)."""
    parts = F.split(col, "#")
    return F.when(
        col.contains("#"),
        F.array(F.struct(parts[0].alias("d"), parts[1].cast("int").alias("e"))),
    ).otherwise(F.array().cast("array<struct<d:string, e:int>>"))


class TestStreamCorrelate:
    def test_cross_join(self, spark):
        # CorrelateITCase.scala:47 — two chained UDTFs + a filter
        from flink_1_6_0_spark.operators.correlate import join_lateral

        t = spark.createDataFrame(CORRELATE_DATA, "a int, b long, c string")
        one = join_lateral(t, _func0(F.col("c")), ["d", "e"], keep=["c"])
        res = one.filter(F.col("e") > 20).select("c", F.col("d").alias("name"), F.col("e").alias("age"))
        same(res, [("Jack#22", "Jack", 22), ("Anna#44", "Anna", 44)])

    def test_left_outer_join_without_predicates(self, spark):
        # CorrelateITCase.scala:68 — non-matching rows survive null-padded
        from flink_1_6_0_spark.operators.correlate import join_lateral

        t = spark.createDataFrame(CORRELATE_DATA, "a int, b long, c string")
        res = join_lateral(t, _func0(F.col("c")), ["d", "e"], keep=["c"], outer=True)
        same(
            res,
            [("nosharp", None, None), ("Jack#22", "Jack", 22),
             ("John#19", "John", 19), ("Anna#44", "Anna", 44)],
        )

    def test_udtf_with_scalar_function(self, spark):
        # CorrelateITCase.scala:108 — Func18(d, "J"): keep names starting 'J'
        from flink_1_6_0_spark.operators.correlate import join_lateral

        t = spark.createDataFrame(CORRELATE_DATA, "a int, b long, c string")
        res = (
            join_lateral(t, _func0(F.col("c")), ["d", "e"], keep=["c"])
            .filter(F.col("d").startswith("J"))
        )
        same(res, [("Jack#22", "Jack", 22), ("John#19", "John", 19)])

    def test_udtf_with_parameter(self, spark):
        # CorrelateITCase.scala:126 — RichTableFunc1 splits on the job
        # parameter ' ' and (per its impl) emits nothing for single-word
        # strings; only 'Hello world' fans out
        from flink_1_6_0_spark.operators.correlate import join_lateral
        from tests.test_dataset_itcases import ROWS3

        t = spark.createDataFrame(ROWS3[:3], "a int, b long, c string")
        words = F.when(
            F.col("c").contains(" "),
            F.transform(F.split(F.col("c"), " "), lambda w: F.struct(w.alias("s"))),
        ).otherwise(F.array().cast("array<struct<s:string>>"))
        res = join_lateral(t, words, ["s"], keep=["a"])
        same(res, [(3, "Hello"), (3, "world")])


# ---------------------------------------------------------------------------
# stream/sql/SetOperatorsITCase.scala — uncorrelated IN / NOT IN subqueries
# on streams: the retract-stream finals equal the batch semi/anti joins.
# ---------------------------------------------------------------------------

SET_A = [(1, 1, "Hello"), (2, 2, "Hello"), (3, 3, "Hello World"), (4, 4, "Hello")]


class TestStreamSetOperators:
    def test_in_uncorrelated_with_condition_and_agg(self, spark):
        # SetOperatorsITCase.scala:33 — IN over an aggregated, HAVING-filtered
        # subquery (values must unify across groups: SUM over y='Hanoi' is 2,
        # over 'Hanoi-1' is 3)
        spark.createDataFrame(SET_A, "a int, b long, c string").createOrReplaceTempView("tableA")
        spark.createDataFrame(
            [(1, "hello"), (1, "Hanoi"), (1, "Hanoi"), (2, "Hanoi-1"),
             (2, "Hanoi-1"), (-1, "Hanoi-1")],
            "x int, y string",
        ).createOrReplaceTempView("tableB")
        res = spark.sql(
            "SELECT * FROM tableA WHERE a IN "
            " (SELECT SUM(x) FROM tableB GROUP BY y HAVING y LIKE '%Hanoi%')"
        )
        same(res, [(2, 2, "Hello"), (3, 3, "Hello World")])

    def test_in_with_multi_uncorrelated_condition(self, spark):
        # SetOperatorsITCase.scala:78 — two independent IN subqueries AND-ed
        spark.createDataFrame(SET_A, "a int, b long, c string").createOrReplaceTempView("tableA")
        spark.createDataFrame(
            [(1, "hello"), (2, "co-hello"), (4, "hello")], "x int, y string"
        ).createOrReplaceTempView("tableB")
        spark.createDataFrame(
            [(1, "Joker"), (1, "Sanity"), (2, "Cool")], "w long, z string"
        ).createOrReplaceTempView("tableC")
        res = spark.sql(
            "SELECT * FROM tableA WHERE a IN (SELECT x FROM tableB) "
            "AND b IN (SELECT w FROM tableC)"
        )
        same(res, [(1, 1, "Hello"), (2, 2, "Hello")])

    def test_not_in_uncorrelated(self, spark):
        # SetOperatorsITCase.scala:130 — NOT IN → null-aware anti join
        spark.createDataFrame(SET_A, "a int, b long, c string").createOrReplaceTempView("tableA")
        spark.createDataFrame(
            [(1, "hello"), (2, "co-hello"), (4, "hello")], "x int, y string"
        ).createOrReplaceTempView("tableB")
        res = spark.sql("SELECT * FROM tableA WHERE a NOT IN (SELECT x FROM tableB)")
        same(res, [(3, 3, "Hello World")])
