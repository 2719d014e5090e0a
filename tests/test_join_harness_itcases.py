"""Ports of JoinHarnessTest.scala — the stream-join runtime-logic suite
(flink-table/src/test/scala/org/apache/flink/table/runtime/harness/
JoinHarnessTest.scala), replayed through the kernels in
flink_1_6_0_spark.streaming.join_kernels.

Every golden keeps the reference's exact element/processing-time/watermark
driving, its expected row multiset (the reference compares with
RowResultSortComparator, i.e. order-insensitively), its
numKeyedStateEntries()/numProcessingTimeTimers()/numEventTimeTimers()
assertions, and — for the rowtime joins — the held-back output watermarks of
KeyedCoProcessOperatorWithWatermarkDelay.
"""

from __future__ import annotations

from flink_1_6_0_spark.streaming.cleanup_state import StreamQueryConfig
from flink_1_6_0_spark.streaming.join_kernels import (
    NonWindowFullJoinKernel,
    NonWindowFullJoinNonEquiKernel,
    NonWindowInnerJoinKernel,
    NonWindowLeftRightJoinKernel,
    NonWindowLeftRightJoinNonEquiKernel,
    TimeBoundedJoinKernel,
    TwoInputKeyedProcessHarness,
)

# JoinHarnessTest.scala:44 — TestStreamQueryConfig(2 ms, 4 ms)
QC = StreamQueryConfig(2, 4)


def concat_join(l, r):
    """HarnessTestBase funcCode: out = (l.f0, l.f1, r.f0, r.f1)."""
    return (l[0], l[1], r[0], r[1])


def join_gt(l, r):
    """funcCodeWithNonEqualPred: emit only when l.f1 > r.f1 (string cmp)."""
    return (l[0], l[1], r[0], r[1]) if l[1] > r[1] else None


def join_lt(l, r):
    """funcCodeWithNonEqualPred2: emit only when l.f1 < r.f1."""
    return (l[0], l[1], r[0], r[1]) if l[1] < r[1] else None


def bounded_harness(kernel):
    # rowtime joins key on field 1 (String); watermark delay per operator
    return TwoInputKeyedProcessHarness(
        kernel,
        key1_fn=lambda r: r[1],
        key2_fn=lambda r: r[1],
        watermark_delay=kernel.watermark_delay,
    )


def proc_harness(kernel):
    # proc-time joins and non-window joins key on field 0
    return TwoInputKeyedProcessHarness(kernel, key1_fn=lambda r: r[0], key2_fn=lambda r: r[0])


def assert_same_multiset(actual, expected):
    assert sorted(actual, key=repr) == sorted(expected, key=repr)


def wm_both(h, t):
    h.process_watermark1(t)
    h.process_watermark2(t)


# ---------------------------------------------------------------------------
# Proc-time bounded joins (JoinHarnessTest.scala:151, :241)
# ---------------------------------------------------------------------------


def test_proc_time_inner_join_common_bounds_golden():
    """JoinHarnessTest.scala:151 — a.proctime BETWEEN b.proctime-10 AND
    b.proctime+20, with eager expiration and cleanup timer counts."""
    k = TimeBoundedJoinKernel("inner", -10, 20, 0, concat_join, 2, 2, proc_time=True)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element1((1, "1a1"))
    assert h.num_proc_timers() == 1
    h.set_processing_time(2)
    h.process_element1((2, "2a2"))
    assert h.num_proc_timers() == 2  # timers for key=1 and key=2
    h.set_processing_time(3)
    h.process_element1((1, "1a3"))
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2  # the number of timers won't increase
    h.process_element2((1, "1b3"))
    h.set_processing_time(4)
    h.process_element2((2, "2b4"))
    assert h.num_state_entries() == 8  # states doubled
    assert h.num_proc_timers() == 4
    h.set_processing_time(13)
    h.process_element2((1, "1b13"))  # left (key=1, time=1) eagerly removed
    h.set_processing_time(33)
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element1((1, "1a33"))
    h.process_element1((2, "2a33"))
    h.process_element2((2, "2b33"))  # left (key=2, time=2) eagerly removed

    expected = [
        ((1, "1a1", 1, "1b3"), True),
        ((1, "1a3", 1, "1b3"), True),
        ((2, "2a2", 2, "2b4"), True),
        ((1, "1a3", 1, "1b13"), True),
        ((1, "1a33", 1, "1b13"), True),
        ((2, "2a33", 2, "2b33"), True),
    ]
    assert_same_multiset(h.output, expected)


def test_proc_time_inner_join_negative_bounds_golden():
    """JoinHarnessTest.scala:241 — a.proctime BETWEEN b.proctime-10 AND
    b.proctime-5: right rows join without being cached."""
    k = TimeBoundedJoinKernel("inner", -10, -5, 0, concat_join, 2, 2, proc_time=True)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element1((1, "1a1"))
    h.set_processing_time(2)
    h.process_element1((2, "2a2"))
    h.set_processing_time(3)
    h.process_element1((1, "1a3"))
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element2((1, "1b3"))  # right rows are never cached
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.set_processing_time(7)
    h.process_element2((2, "2b7"))  # joined without caching (7 >= 7-5)
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.set_processing_time(12)
    h.process_element2((1, "1b12"))  # left (key=1, time=1) eagerly removed
    h.set_processing_time(13)  # cleanup delayed by relativeWindowSize/2
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.set_processing_time(14)  # timer 1+10+2+0+1: left (key=1, time=3) removed
    assert h.num_state_entries() == 2
    assert h.num_proc_timers() == 1
    h.set_processing_time(16)  # cleans left (key=2, time=2)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((2, "2a2", 2, "2b7"), True),
        ((1, "1a3", 1, "1b12"), True),
    ]
    assert_same_multiset(h.output, expected)


# ---------------------------------------------------------------------------
# Rowtime bounded joins (JoinHarnessTest.scala:323, :422, :504, :618, :731)
# ---------------------------------------------------------------------------


def test_row_time_inner_join_common_bounds_golden():
    """JoinHarnessTest.scala:323 — a.rowtime BETWEEN b.rowtime-10 AND
    b.rowtime+20 on event time; late rows still cached; watermark held back
    by getMaxOutputDelay (20)."""
    k = TimeBoundedJoinKernel("inner", -10, 20, 0, concat_join, 2, 2, proc_time=False,
                              left_time_idx=0, right_time_idx=0)
    h = bounded_harness(k)
    wm_both(h, 1)
    h.process_element1((1, "k1"))  # late, but cached anyway
    assert h.num_event_timers() == 1
    h.process_element1((2, "k1"))
    h.process_element2((2, "k1"))
    assert h.num_event_timers() == 2
    assert h.num_state_entries() == 4
    h.process_element1((5, "k1"))
    h.process_element2((15, "k1"))
    wm_both(h, 20)
    assert h.num_state_entries() == 4
    h.process_element1((35, "k1"))
    wm_both(h, 38)  # removes right 2; left 2 and 15... (reference comment)
    h.process_element1((40, "k2"))
    h.process_element2((39, "k2"))
    assert h.num_state_entries() == 6
    wm_both(h, 61)  # removes the right row with timestamp 35
    assert h.num_state_entries() == 4

    expected = [
        ((1, "k1", 2, "k1"), True),  # produced by the late row
        ((2, "k1", 2, "k1"), True),
        ((5, "k1", 2, "k1"), True),
        ((5, "k1", 15, "k1"), True),
        ((35, "k1", 15, "k1"), True),
        ((40, "k2", 39, "k2"), True),
    ]
    assert_same_multiset(h.output, expected)
    assert h.watermarks == [-19, 0, 18, 41]


def test_row_time_inner_join_negative_bounds_golden():
    """JoinHarnessTest.scala:422 — a.rowtime BETWEEN b.rowtime-10 AND
    b.rowtime-7: rows at/behind the watermark are not cached."""
    k = TimeBoundedJoinKernel("inner", -10, -7, 0, concat_join, 2, 2, proc_time=False,
                              left_time_idx=0, right_time_idx=0)
    h = bounded_harness(k)
    wm_both(h, 1)
    h.process_element2((2, "k1"))  # not cached
    assert h.num_state_entries() == 0
    wm_both(h, 2)
    h.process_element1((3, "k1"))
    h.process_element2((3, "k1"))
    h.process_element2((13, "k1"))  # cached; left clean time 13-7+1-1=8... (sic)
    h.process_element1((6, "k1"))  # -7 boundary: 13-7=6
    assert h.num_state_entries() == 4
    wm_both(h, 10)  # left timer 8 fires: the ts=13 right row removed
    assert h.num_state_entries() == 2
    wm_both(h, 18)  # clears the rest
    assert h.num_state_entries() == 0

    expected = [
        ((3, "k1", 13, "k1"), True),
        ((6, "k1", 13, "k1"), True),
    ]
    assert_same_multiset(h.output, expected)
    assert h.watermarks == [-9, -8, 0, 8]


def _drive_row_time_outer(k):
    """Shared driving of the three rowtime outer-join goldens
    (JoinHarnessTest.scala:504/:618/:731 — identical inputs)."""
    h = bounded_harness(k)
    h.process_element1((1, "k1"))
    h.process_element2((1, "k2"))
    assert h.num_event_timers() == 2
    assert h.num_state_entries() == 4
    wm_both(h, 14)  # left ts=1 removed (padded for LEFT/FULL): 14=1+5+1+7
    assert h.num_event_timers() == 1
    assert h.num_state_entries() == 2
    wm_both(h, 18)  # right ts=1 removed (padded for RIGHT/FULL): 18=1+9+1+7
    assert h.num_event_timers() == 0
    assert h.num_state_entries() == 0
    h.process_element1((2, "k1"))  # late: not cached, padded for LEFT/FULL
    h.process_element2((2, "k2"))  # late: not cached, padded for RIGHT/FULL
    assert h.num_state_entries() == 0
    assert h.num_event_timers() == 0
    # the common (inner) joins
    h.process_element1((19, "k1"))
    h.process_element1((20, "k1"))
    h.process_element2((26, "k1"))
    h.process_element2((25, "k1"))
    h.process_element1((21, "k1"))
    h.process_element2((39, "k2"))
    h.process_element2((40, "k2"))
    h.process_element1((50, "k2"))
    h.process_element1((49, "k2"))
    h.process_element2((41, "k2"))
    wm_both(h, 100)
    return h


INNER_PAIRS = [
    ((20, "k1", 25, "k1"), True),
    ((21, "k1", 25, "k1"), True),
    ((21, "k1", 26, "k1"), True),
    ((49, "k2", 40, "k2"), True),
    ((49, "k2", 41, "k2"), True),
    ((50, "k2", 41, "k2"), True),
]


def test_row_time_left_outer_join_golden():
    """JoinHarnessTest.scala:504 — LEFT OUTER with (-5, 9) bounds."""
    k = TimeBoundedJoinKernel("left", -5, 9, 0, concat_join, 2, 2, proc_time=False)
    h = _drive_row_time_outer(k)
    expected = INNER_PAIRS + [
        ((1, "k1", None, None), True),   # padded on expiration (timer 14)
        ((2, "k1", None, None), True),   # padded late row
        ((19, "k1", None, None), True),  # padded on expiration (timer 32)
    ]
    assert_same_multiset(h.output, expected)
    assert h.watermarks == [5, 9, 91]


def test_row_time_right_outer_join_golden():
    """JoinHarnessTest.scala:618 — RIGHT OUTER with (-5, 9) bounds."""
    k = TimeBoundedJoinKernel("right", -5, 9, 0, concat_join, 2, 2, proc_time=False)
    h = _drive_row_time_outer(k)
    expected = INNER_PAIRS + [
        ((None, None, 1, "k2"), True),   # padded on expiration (timer 18)
        ((None, None, 2, "k2"), True),   # padded late row
        ((None, None, 39, "k2"), True),  # padded on expiration (timer 56)
    ]
    assert_same_multiset(h.output, expected)
    assert h.watermarks == [5, 9, 91]


def test_row_time_full_outer_join_golden():
    """JoinHarnessTest.scala:731 — FULL OUTER with (-5, 9) bounds."""
    k = TimeBoundedJoinKernel("full", -5, 9, 0, concat_join, 2, 2, proc_time=False)
    h = _drive_row_time_outer(k)
    expected = INNER_PAIRS + [
        ((1, "k1", None, None), True),
        ((None, None, 1, "k2"), True),
        ((2, "k1", None, None), True),
        ((None, None, 2, "k2"), True),
        ((19, "k1", None, None), True),
        ((None, None, 39, "k2"), True),
    ]
    assert_same_multiset(h.output, expected)
    assert h.watermarks == [5, 9, 91]


# ---------------------------------------------------------------------------
# Non-window joins (JoinHarnessTest.scala:851 onward)
# ---------------------------------------------------------------------------


def _drive_nonwindow_inner(h):
    """JoinHarnessTest.scala:851/:954 — the shared prologue."""
    h.set_processing_time(1)
    h.process_element1((1, "aaa"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 2
    h.set_processing_time(2)
    h.process_element1((1, "aaa"))
    h.process_element1((2, "bbb"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 4


def test_non_window_inner_join_golden():
    """JoinHarnessTest.scala:851 testNonWindowInnerJoin."""
    k = NonWindowInnerJoinKernel(concat_join, 2, 2, QC)
    h = proc_harness(k)
    _drive_nonwindow_inner(h)
    h.set_processing_time(3)
    h.process_element1((1, "aaa"))
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element2((1, "Hi1"))
    assert h.num_state_entries() == 6
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element2((2, "Hello1"))
    assert h.num_state_entries() == 8
    assert h.num_proc_timers() == 4
    h.set_processing_time(5)
    h.process_element2((1, "Hi2"))  # left key=1 rows expired eagerly
    assert h.num_state_entries() == 6
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)  # expires all left records
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)  # expires right key=2
    assert h.num_state_entries() == 2
    assert h.num_proc_timers() == 1
    h.set_processing_time(10)
    assert h.num_state_entries() > 0
    h.set_processing_time(11)  # expires all right records
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((1, "aaa", 1, "Hi1"), True),
        ((1, "aaa", 1, "Hi1"), True),
        ((1, "aaa", 1, "Hi1"), True),
        ((2, "bbb", 2, "Hello1"), True),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_inner_join_with_retract_golden():
    """JoinHarnessTest.scala:954 testNonWindowInnerJoinWithRetract."""
    k = NonWindowInnerJoinKernel(concat_join, 2, 2, QC)
    h = proc_harness(k)
    _drive_nonwindow_inner(h)
    h.set_processing_time(3)
    h.process_element1((1, "aaa"), change=False)
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element2((1, "Hi1"))
    h.process_element2((1, "Hi1"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element2((2, "Hello1"))
    assert h.num_state_entries() == 7
    assert h.num_proc_timers() == 4
    h.process_element1((1, "aaa"), change=False)
    h.set_processing_time(5)
    h.process_element2((1, "Hi2"))
    h.process_element2((1, "Hi2"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)
    assert h.num_state_entries() == 3
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((1, "aaa", 1, "Hi1"), True),
        ((1, "aaa", 1, "Hi1"), False),
        ((2, "bbb", 2, "Hello1"), True),
    ]
    assert_same_multiset(h.output, expected)


def _drive_nonwindow_left_shape(h):
    """JoinHarnessTest.scala:1054/:1310 — LEFT (el1 preserved) and RIGHT
    (el2 preserved) tests drive mirrored elements; this is the LEFT shape."""
    h.set_processing_time(1)
    h.process_element1((1, "aaa"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 2
    h.set_processing_time(2)
    h.process_element1((1, "aaa"))
    h.process_element1((2, "bbb"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 4
    h.set_processing_time(3)
    h.process_element1((1, "aaa"), change=False)
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element2((1, "Hi1"))
    h.process_element2((1, "Hi1"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element2((2, "Hello1"))
    assert h.num_state_entries() == 7
    assert h.num_proc_timers() == 4
    h.process_element1((1, "aaa"), change=False)
    h.set_processing_time(5)
    h.process_element2((1, "Hi2"))
    h.process_element2((1, "Hi2"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)
    assert h.num_state_entries() == 3
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0


def test_non_window_left_join_without_non_equal_pred_golden():
    """JoinHarnessTest.scala:1054 testNonWindowLeftJoinWithoutNonEqualPred."""
    k = NonWindowLeftRightJoinKernel(concat_join, 2, 2, True, QC)
    h = proc_harness(k)
    _drive_nonwindow_left_shape(h)
    expected = [
        ((1, "aaa", None, None), True),
        ((1, "aaa", None, None), True),
        ((2, "bbb", None, None), True),
        ((1, "aaa", None, None), False),
        ((1, "aaa", None, None), False),
        ((1, "aaa", 1, "Hi1"), True),
        ((1, "aaa", 1, "Hi1"), False),
        ((1, "aaa", None, None), True),
        ((2, "bbb", None, None), False),
        ((2, "bbb", 2, "Hello1"), True),
        ((1, "aaa", None, None), False),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_right_join_without_non_equal_pred_golden():
    """JoinHarnessTest.scala:1310 — the mirrored RIGHT join: stream-2 rows
    preserved, stream-1 retract-joins."""
    k = NonWindowLeftRightJoinKernel(concat_join, 2, 2, False, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element2((1, "aaa"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 2
    h.set_processing_time(2)
    h.process_element2((1, "aaa"))
    h.process_element2((2, "bbb"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 4
    h.set_processing_time(3)
    h.process_element2((1, "aaa"), change=False)
    assert h.num_state_entries() == 4
    assert h.num_proc_timers() == 2
    h.process_element1((1, "Hi1"))
    h.process_element1((1, "Hi1"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element1((2, "Hello1"))
    assert h.num_state_entries() == 7
    assert h.num_proc_timers() == 4
    h.process_element2((1, "aaa"), change=False)
    h.set_processing_time(5)
    h.process_element1((1, "Hi2"))
    h.process_element1((1, "Hi2"), change=False)
    assert h.num_state_entries() == 5
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)
    assert h.num_state_entries() == 3
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((None, None, 1, "aaa"), True),
        ((None, None, 1, "aaa"), True),
        ((None, None, 2, "bbb"), True),
        ((None, None, 1, "aaa"), False),
        ((None, None, 1, "aaa"), False),
        ((1, "Hi1", 1, "aaa"), True),
        ((1, "Hi1", 1, "aaa"), False),
        ((None, None, 1, "aaa"), True),
        ((None, None, 2, "bbb"), False),
        ((2, "Hello1", 2, "bbb"), True),
        ((None, None, 1, "aaa"), False),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_left_join_with_non_equal_pred_golden():
    """JoinHarnessTest.scala:1171 — LEFT join with l.f1 > r.f1 predicate and
    join-count state."""
    k = NonWindowLeftRightJoinNonEquiKernel(join_gt, 2, 2, True, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element1((1, "aaa"))
    h.process_element1((1, "aaa"), change=False)
    h.process_element1((1, "bbb"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 3  # timer, left key, join cnt
    h.set_processing_time(2)
    h.process_element1((1, "aaa"))
    h.process_element1((2, "bbb"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 6
    h.set_processing_time(3)
    h.process_element2((1, "Hi1"))
    h.process_element2((1, "bbb"), change=False)
    assert h.num_state_entries() == 8
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element2((2, "ccc"))
    h.process_element2((2, "Hello"))
    assert h.num_state_entries() == 10
    assert h.num_proc_timers() == 4
    h.process_element1((1, "aaa"), change=False)
    h.process_element2((1, "Hi2"))
    h.process_element2((1, "Hi2"), change=False)
    h.process_element2((1, "Hi1"), change=False)
    h.set_processing_time(5)
    h.process_element2((1, "Hi3"))
    h.process_element2((1, "Hi3"), change=False)
    assert h.num_state_entries() == 6
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)
    assert h.num_state_entries() == 3
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((1, "aaa", None, None), True),
        ((1, "aaa", None, None), False),
        ((1, "bbb", None, None), True),
        ((1, "aaa", None, None), True),
        ((2, "bbb", None, None), True),
        ((1, "bbb", None, None), False),
        ((1, "aaa", None, None), False),
        ((1, "aaa", 1, "Hi1"), True),
        ((1, "bbb", 1, "Hi1"), True),
        ((2, "bbb", None, None), False),
        ((2, "bbb", 2, "Hello"), True),
        ((1, "aaa", 1, "Hi1"), False),
        ((1, "bbb", 1, "Hi2"), True),
        ((1, "bbb", 1, "Hi2"), False),
        ((1, "bbb", 1, "Hi1"), False),
        ((1, "bbb", None, None), True),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_right_join_with_non_equal_pred_golden():
    """JoinHarnessTest.scala:1427 — RIGHT join with l.f1 < r.f1 predicate."""
    k = NonWindowLeftRightJoinNonEquiKernel(join_lt, 2, 2, False, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element2((1, "aaa"))
    h.process_element2((1, "aaa"), change=False)
    h.process_element2((1, "bbb"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 3
    h.set_processing_time(2)
    h.process_element2((1, "aaa"))
    h.process_element2((2, "bbb"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 6
    h.set_processing_time(3)
    h.process_element1((1, "Hi1"))
    h.process_element1((1, "bbb"), change=False)
    assert h.num_state_entries() == 8
    assert h.num_proc_timers() == 3
    h.set_processing_time(4)
    h.process_element1((2, "ccc"))
    h.process_element1((2, "Hello"))
    assert h.num_state_entries() == 10
    assert h.num_proc_timers() == 4
    h.process_element2((1, "aaa"), change=False)
    h.process_element1((1, "Hi2"))
    h.process_element1((1, "Hi2"), change=False)
    h.process_element1((1, "Hi1"), change=False)
    h.set_processing_time(5)
    h.process_element1((1, "Hi3"))
    h.process_element1((1, "Hi3"), change=False)
    assert h.num_state_entries() == 6
    assert h.num_proc_timers() == 3
    h.set_processing_time(6)
    assert h.num_state_entries() == 3
    assert h.num_proc_timers() == 2
    h.set_processing_time(8)
    assert h.num_state_entries() == 0
    assert h.num_proc_timers() == 0

    expected = [
        ((None, None, 1, "aaa"), True),
        ((None, None, 1, "aaa"), False),
        ((None, None, 1, "bbb"), True),
        ((None, None, 1, "aaa"), True),
        ((None, None, 2, "bbb"), True),
        ((None, None, 1, "bbb"), False),
        ((None, None, 1, "aaa"), False),
        ((1, "Hi1", 1, "aaa"), True),
        ((1, "Hi1", 1, "bbb"), True),
        ((None, None, 2, "bbb"), False),
        ((2, "Hello", 2, "bbb"), True),
        ((1, "Hi1", 1, "aaa"), False),
        ((1, "Hi2", 1, "bbb"), True),
        ((1, "Hi2", 1, "bbb"), False),
        ((1, "Hi1", 1, "bbb"), False),
        ((None, None, 1, "bbb"), True),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_full_join_without_non_equal_pred_golden():
    """JoinHarnessTest.scala:1566 testNonWindowFullJoinWithoutNonEqualPred."""
    k = NonWindowFullJoinKernel(concat_join, 2, 2, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element1((1, "bbb"))
    h.process_element1((1, "ccc"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 2
    h.set_processing_time(2)
    h.process_element2((2, "bbb"))
    h.process_element2((2, "ccc"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 4
    h.set_processing_time(3)
    h.process_element1((2, "aaa"))
    h.process_element1((2, "ddd"))
    assert h.num_proc_timers() == 3
    assert h.num_state_entries() == 6
    h.process_element2((1, "aaa"))
    h.process_element2((1, "ddd"))
    assert h.num_proc_timers() == 4
    assert h.num_state_entries() == 8
    h.set_processing_time(4)
    h.process_element1((2, "aaa"), change=False)
    h.process_element1((2, "ddd"), change=False)
    h.process_element2((1, "aaa"), change=False)
    h.process_element2((1, "ddd"), change=False)
    assert h.num_proc_timers() == 4
    assert h.num_state_entries() == 6
    h.set_processing_time(5)
    assert h.num_proc_timers() == 3
    assert h.num_state_entries() == 4
    h.set_processing_time(6)
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 2
    h.set_processing_time(7)
    assert h.num_proc_timers() == 0
    assert h.num_state_entries() == 0
    h.set_processing_time(8)
    h.process_element1((1, "bbb"))
    h.process_element2((2, "bbb"))

    expected = [
        # processing time 1
        ((1, "bbb", None, None), True),
        ((1, "ccc", None, None), True),
        # processing time 2
        ((None, None, 2, "bbb"), True),
        ((None, None, 2, "ccc"), True),
        # processing time 3
        ((None, None, 2, "bbb"), False),
        ((None, None, 2, "ccc"), False),
        ((2, "aaa", 2, "bbb"), True),
        ((2, "aaa", 2, "ccc"), True),
        ((2, "ddd", 2, "bbb"), True),
        ((2, "ddd", 2, "ccc"), True),
        ((1, "bbb", None, None), False),
        ((1, "ccc", None, None), False),
        ((1, "bbb", 1, "aaa"), True),
        ((1, "ccc", 1, "aaa"), True),
        ((1, "bbb", 1, "ddd"), True),
        ((1, "ccc", 1, "ddd"), True),
        # processing time 4
        ((2, "aaa", 2, "bbb"), False),
        ((2, "aaa", 2, "ccc"), False),
        ((2, "ddd", 2, "bbb"), False),
        ((2, "ddd", 2, "ccc"), False),
        ((None, None, 2, "bbb"), True),
        ((None, None, 2, "ccc"), True),
        ((1, "bbb", 1, "aaa"), False),
        ((1, "ccc", 1, "aaa"), False),
        ((1, "bbb", 1, "ddd"), False),
        ((1, "ccc", 1, "ddd"), False),
        ((1, "bbb", None, None), True),
        ((1, "ccc", None, None), True),
        # processing time 8
        ((1, "bbb", None, None), True),
        ((None, None, 2, "bbb"), True),
    ]
    assert_same_multiset(h.output, expected)


def test_non_window_full_join_with_non_equal_pred_golden():
    """JoinHarnessTest.scala:1744 — FULL OUTER with l.f1 < r.f1 predicate
    and two join-count states."""
    k = NonWindowFullJoinNonEquiKernel(join_lt, 2, 2, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element1((1, "bbb"))
    h.process_element1((1, "ccc"))
    assert h.num_proc_timers() == 1
    assert h.num_state_entries() == 3
    h.set_processing_time(2)
    h.process_element2((2, "bbb"))
    h.process_element2((2, "ccc"))
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 6
    h.set_processing_time(3)
    h.process_element1((2, "aaa"))
    h.process_element1((2, "ddd"))
    assert h.num_proc_timers() == 3
    assert h.num_state_entries() == 9
    h.process_element2((1, "aaa"))
    h.process_element2((1, "ddd"))
    assert h.num_proc_timers() == 4
    assert h.num_state_entries() == 12
    h.set_processing_time(4)
    h.process_element1((2, "aaa"), change=False)
    h.process_element2((1, "ddd"), change=False)
    assert h.num_proc_timers() == 4
    assert h.num_state_entries() == 12
    h.set_processing_time(5)
    assert h.num_proc_timers() == 3
    assert h.num_state_entries() == 9
    h.set_processing_time(6)
    assert h.num_proc_timers() == 2
    assert h.num_state_entries() == 6
    h.set_processing_time(7)
    assert h.num_proc_timers() == 0
    assert h.num_state_entries() == 0
    h.set_processing_time(8)
    h.process_element1((1, "bbb"))
    h.process_element2((2, "bbb"))

    expected = [
        # processing time 1
        ((1, "bbb", None, None), True),
        ((1, "ccc", None, None), True),
        # processing time 2
        ((None, None, 2, "bbb"), True),
        ((None, None, 2, "ccc"), True),
        # processing time 3
        ((None, None, 2, "bbb"), False),
        ((None, None, 2, "ccc"), False),
        ((2, "aaa", 2, "bbb"), True),
        ((2, "aaa", 2, "ccc"), True),
        ((2, "ddd", None, None), True),  # no match due to the predicate
        ((1, "bbb", None, None), False),
        ((1, "ccc", None, None), False),
        ((1, "bbb", 1, "ddd"), True),
        ((1, "ccc", 1, "ddd"), True),
        ((None, None, 1, "aaa"), True),  # no match due to the predicate
        # processing time 4
        ((2, "aaa", 2, "bbb"), False),
        ((2, "aaa", 2, "ccc"), False),
        ((None, None, 2, "bbb"), True),
        ((None, None, 2, "ccc"), True),
        ((1, "bbb", 1, "ddd"), False),
        ((1, "ccc", 1, "ddd"), False),
        ((1, "bbb", None, None), True),
        ((1, "ccc", None, None), True),
        # processing time 8
        ((1, "bbb", None, None), True),
        ((None, None, 2, "bbb"), True),
    ]
    assert_same_multiset(h.output, expected)


def test_full_join_non_equi_repad_after_multi_match_retract():
    """Reference-deviation pin (see _retract_join_non_equi's docstring):
    a left row matching TWO fresh right rows must be re-padded once both
    matches retract. The reference seeds the left row's joinCntState with
    cRowWrapper.getEmitCnt = 4 (two pad-retractions + two joins), so the
    1->0 crossing lands at 4->3->2 and the re-pad is lost; seeding the true
    matched-copy count (2) restores the retraction algebra's eventual
    consistency (netted output == FULL OUTER JOIN of netted input)."""
    k = NonWindowFullJoinNonEquiKernel(join_lt, 2, 2, QC)
    h = proc_harness(k)
    h.set_processing_time(1)
    h.process_element2((1, "bbb"))   # pad right
    h.process_element2((1, "ccc"))   # pad right
    h.process_element1((1, "aaa"))   # matches both: retract 2 pads, 2 joins
    h.process_element2((1, "bbb"), change=False)  # aaa 2->1 matches: no pad yet
    h.process_element2((1, "ccc"), change=False)  # aaa 1->0: re-pad aaa
    net = {}
    for row, change in h.output:
        net[row] = net.get(row, 0) + (1 if change else -1)
    alive = sorted(r for r, n in net.items() if n > 0)
    # netted result == full outer join of netted input = {aaa} x {} -> one pad
    assert alive == [(1, "aaa", None, None)]


def _net_join_property(kernel_factory, join_type, n_rounds=150, seed=1313, pred=None):
    """Retraction-algebra invariant (the one that exposed the reference's
    joinCnt seeding bug): for ANY valid retraction input stream — duplicate
    rows included, so join counts exceed 1 — the NETTED kernel output must
    equal the brute-force outer join of the NETTED input (pred: l.f1 < r.f1
    on the value field; key: f0)."""
    import random
    from collections import Counter

    if pred is None:
        pred = lambda l, r: l[1] < r[1]  # noqa: E731 — join_lt's residual
    rng = random.Random(seed)
    for round_no in range(n_rounds):
        k = kernel_factory()
        h = proc_harness(k)
        h.set_processing_time(1)
        live = {0: Counter(), 1: Counter()}  # side -> row multiset
        n_ops = rng.randint(4, 24)
        for _ in range(n_ops):
            side = rng.randint(0, 1)
            retractable = [r for r, c in live[side].items() if c > 0]
            if retractable and rng.random() < 0.35:
                row = rng.choice(retractable)
                change = False
                live[side][row] -= 1
            else:
                row = (rng.randint(1, 2), rng.randint(0, 3))  # tiny domains -> dup rows
                change = True
                live[side][row] += 1
            (h.process_element1 if side == 0 else h.process_element2)(row, change)
        net = Counter()
        for row, change in h.output:
            net[row] += 1 if change else -1
        net = +net  # drop zero/negatives view; assert none negative below
        assert all(v > 0 for v in net.values()), (round_no, net)

        expected = Counter()
        lefts, rights = live[0], live[1]
        for l, lc in lefts.items():
            if lc <= 0:
                continue
            matched = 0
            for r, rc in rights.items():
                if rc > 0 and l[0] == r[0] and pred(l, r):
                    expected[(l[0], l[1], r[0], r[1])] += lc * rc
                    matched += rc
            if matched == 0 and join_type in ("left", "full"):
                expected[(l[0], l[1], None, None)] += lc
        for r, rc in rights.items():
            if rc <= 0:
                continue
            matched = sum(
                lc for l, lc in lefts.items() if lc > 0 and l[0] == r[0] and pred(l, r)
            )
            if matched == 0 and join_type in ("right", "full"):
                expected[(None, None, r[0], r[1])] += rc
        assert net == expected, (round_no, dict(net), dict(expected))


def test_full_join_non_equi_net_property():
    _net_join_property(
        lambda: NonWindowFullJoinNonEquiKernel(join_lt, 2, 2, StreamQueryConfig()),
        "full",
    )


def test_left_join_non_equi_net_property():
    _net_join_property(
        lambda: NonWindowLeftRightJoinNonEquiKernel(join_lt, 2, 2, True, StreamQueryConfig()),
        "left",
    )


def test_right_join_non_equi_net_property():
    _net_join_property(
        lambda: NonWindowLeftRightJoinNonEquiKernel(join_lt, 2, 2, False, StreamQueryConfig()),
        "right",
    )


def test_full_join_equi_net_property():
    """Same invariant for the EQUI-only full join (NonWindowFullJoin's
    _retract_join path — count-based padding without join-count state)."""
    _net_join_property(
        lambda: NonWindowFullJoinKernel(concat_join, 2, 2, StreamQueryConfig()),
        "full",
        pred=lambda l, r: True,
    )


def test_left_join_equi_net_property():
    _net_join_property(
        lambda: NonWindowLeftRightJoinKernel(concat_join, 2, 2, True, StreamQueryConfig()),
        "left",
        pred=lambda l, r: True,
    )


def test_timebounded_full_join_property():
    """TimeBoundedStreamJoin (proc-time) invariant: for ANY bounds
    left_lower <= left_upper (negative windows included — those exercise
    the never-cache + immediate-pad paths) and ANY strictly-increasing
    arrival sequence, the flushed FULL_OUTER output must equal the
    brute-force interval join {(l, r): r.t + left_lower <= l.t <= r.t +
    left_upper} plus one pad per unmatched row. 120 seeded rounds."""
    import random
    from collections import Counter

    rng = random.Random(4242)
    for round_no in range(120):
        lower = rng.randint(-6, 3)
        upper = rng.randint(lower, 6)
        k = TimeBoundedJoinKernel("full", lower, upper, 0, concat_join, 2, 2, proc_time=True)
        h = proc_harness(k)
        t = 0
        lefts, rights = [], []
        for i in range(rng.randint(2, 18)):
            t += rng.randint(1, 4)
            side = rng.randint(0, 1)
            row = (1, 100 + i)  # key 1, unique payload
            h.set_processing_time(t)
            if side == 0:
                h.process_element1(row)
                lefts.append((t, row))
            else:
                h.process_element2(row)
                rights.append((t, row))
        h.set_processing_time(2**62)  # flush: all cleanup timers fire

        got = Counter(row for row, _ in h.output)
        expected = Counter()
        for tl, l in lefts:
            matched = False
            for tr, r in rights:
                if tr + lower <= tl <= tr + upper:
                    expected[(l[0], l[1], r[0], r[1])] += 1
                    matched = True
            if not matched:
                expected[(l[0], l[1], None, None)] += 1
        for tr, r in rights:
            if not any(tr + lower <= tl <= tr + upper for tl, _ in lefts):
                expected[(None, None, r[0], r[1])] += 1
        assert got == expected, (round_no, lower, upper, dict(got), dict(expected))


def test_inner_join_net_property():
    """Same invariant for NonWindowInnerJoin: netted output == inner join
    of netted input (no pads), duplicates included."""
    _net_join_property(
        lambda: NonWindowInnerJoinKernel(concat_join, 2, 2, StreamQueryConfig()),
        "inner",
        pred=lambda l, r: True,
    )
