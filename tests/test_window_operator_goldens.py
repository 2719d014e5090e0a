"""Ports of WindowOperatorTest.java goldens (flink-streaming-java/.../
runtime/operators/windowing/WindowOperatorTest.java) — the WindowOperator
lateness/merging protocol, replayed through
flink_1_6_0_spark.streaming.session_window.EventTimeWindowKernel on the
deterministic harness.

Each port keeps the reference's exact element/watermark driving and
expected (window, aggregate) sequence; emissions here carry the window
bounds and raw contents, so the expected `Tuple3<key-sum, start, end>` /
`Tuple2<key, sum>`@maxTimestamp records map to (start, end, sum). The
reference's mid-test snapshot/restore steps exercise serializer plumbing
Spark replaces wholesale; processing simply continues here.
"""

from __future__ import annotations

from flink_1_6_0_spark.streaming.cleanup_state import KeyedProcessHarness
from flink_1_6_0_spark.streaming.session_window import (
    EventTimeWindowKernel,
    session_windows,
    tumbling_windows,
)


def harness(kernel):
    # rows: (key, value, ts)
    return KeyedProcessHarness(kernel, key_fn=lambda r: r[0])


def sums(h):
    return [(start, end, sum(contents)) for (start, end, contents), _ in h.output]


def test_session_windows_golden():
    """WindowOperatorTest.java:362 testSessionWindows — 3s gap, lateness 0,
    accumulating EventTimeTrigger."""
    k = EventTimeWindowKernel(session_windows(3000), 0, ts_idx=2, payload_idx=1, merging=True)
    h = harness(k)
    h.process_element(("key2", 1, 0))
    h.process_element(("key2", 2, 1000))
    h.process_element(("key2", 3, 2500))
    h.process_element(("key1", 1, 10))
    h.process_element(("key1", 2, 1000))
    # (snapshot/restore point in the reference)
    h.process_element(("key1", 3, 2500))
    h.process_element(("key2", 4, 5501))
    h.process_element(("key2", 5, 6000))
    h.process_element(("key2", 5, 6000))
    h.process_element(("key2", 6, 6050))
    h.process_watermark(12000)
    h.process_element(("key2", 10, 15000))
    h.process_element(("key2", 20, 15000))
    h.process_watermark(17999)

    assert sorted(sums(h)) == sorted(
        [
            (10, 5500, 6),     # key1-6
            (0, 5500, 6),      # key2-6
            (5501, 9050, 20),  # key2-20
            (15000, 18000, 30),  # key2-30
        ]
    )
    assert k.side_output == []


def test_point_sessions_golden():
    """WindowOperatorTest.java:804 testPointSessions — a value-dependent
    assigner (PointSessionWindows: value 33 → the POINT window [ts, ts])
    merging into 3s sessions."""

    def point_session(row, ts):
        if row[1] == 33:
            return [(ts, ts)]
        return [(ts, ts + 3000)]

    k = EventTimeWindowKernel(point_session, 0, ts_idx=2, payload_idx=1, merging=True)
    h = harness(k)
    h.process_element(("key2", 1, 0))
    h.process_element(("key2", 33, 1000))
    # (snapshot/restore point)
    h.process_element(("key2", 33, 2500))
    h.process_element(("key1", 1, 10))
    h.process_element(("key1", 2, 1000))
    h.process_element(("key1", 33, 2500))
    h.process_watermark(12000)

    assert sorted(sums(h)) == sorted(
        [
            (10, 4000, 36),  # key1-36
            (0, 3000, 67),   # key2-67
        ]
    )


def test_lateness_with_purging_trigger_golden():
    """WindowOperatorTest.java:1393 testLateness — 2s tumble, lateness 500,
    PURGING trigger: the within-lateness re-fire emits only the late
    element (1, not 3); the beyond-lateness element side-outputs."""
    k = EventTimeWindowKernel(
        tumbling_windows(2000), 500, ts_idx=2, payload_idx=1, merging=False, purging=True
    )
    h = harness(k)
    h.process_element(("key2", 1, 500))
    h.process_watermark(1500)
    h.process_element(("key2", 1, 1300))
    h.process_watermark(2300)
    h.process_element(("key2", 1, 1997))  # within lateness: re-fires purged window
    h.process_watermark(6000)
    h.process_element(("key2", 1, 1998))  # beyond lateness: side output
    h.process_watermark(7000)

    assert sums(h) == [
        (0, 2000, 2),  # on-time firing
        (0, 2000, 1),  # late re-fire after purge: only the late element
    ]
    assert k.side_output == [("key2", 1, 1998)]


def test_side_output_due_to_lateness_tumbling_golden():
    """WindowOperatorTest.java:1526 testSideOutputDueToLatenessTumbling —
    2s tumble, lateness 0: the element behind the fired window side-outputs,
    later windows proceed."""
    k = EventTimeWindowKernel(
        tumbling_windows(2000), 0, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1985)
    h.process_element(("key2", 1, 1980))  # not dropped: maxTs+lateness > wm
    h.process_watermark(1999)
    h.process_element(("key2", 1, 1998))  # side output
    h.process_element(("key2", 1, 2001))
    h.process_watermark(2999)
    h.process_watermark(3999)

    assert sums(h) == [(0, 2000, 2), (2000, 4000, 1)]
    assert k.side_output == [("key2", 1, 1998)]


def test_session_with_lateness_accumulating_golden():
    """WindowOperatorTest.java:1925
    testNotSideOutputDueToLatenessSessionWithLateness — 3s gap, lateness 10,
    accumulating trigger: a late element can MERGE a fired session and
    immediately re-fire the merged result; nothing side-outputs."""
    k = EventTimeWindowKernel(
        session_windows(3000), 10, ts_idx=2, payload_idx=1, merging=True
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1999)
    h.process_element(("key2", 1, 2000))
    h.process_watermark(4998)
    # session's maxTimestamp is after the watermark: not side output
    h.process_element(("key2", 1, 4500))
    h.process_element(("key2", 1, 8500))  # new session
    h.process_watermark(7400)
    h.process_element(("key2", 1, 7000))  # merges the two sessions
    h.process_watermark(11501)
    h.process_element(("key2", 1, 11600))  # new session
    h.process_watermark(14600)
    # within the small lateness + accumulating: merges into (11600, 14600),
    # extends to (10000, 14600) whose maxTimestamp <= watermark → immediate
    # firing with the merged contents
    h.process_element(("key2", 1, 10000))
    h.process_element(("key2", 1, 14500))
    h.process_watermark(20000)
    h.process_watermark(100000)

    assert sums(h) == [
        (1000, 11500, 5),   # key2-5 @11499
        (11600, 14600, 1),  # key2-1 @14599
        (10000, 14600, 2),  # key2-2 @14599: the late-merge immediate firing
        (10000, 17500, 3),  # key2-3 @17499
    ]
    assert k.side_output == []


def test_sliding_event_time_windows_golden():
    """WindowOperatorTest.java:110/:188 testSlidingEventTimeWindows — 3s/1s
    sliding windows over out-of-order elements."""
    from flink_1_6_0_spark.streaming.session_window import sliding_windows

    k = EventTimeWindowKernel(
        sliding_windows(3000, 1000), 0, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    h.process_element(("key2", 1, 3999))
    h.process_element(("key2", 1, 3000))
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))
    h.process_element(("key1", 1, 999))
    h.process_element(("key2", 1, 1998))
    h.process_element(("key2", 1, 1999))
    h.process_element(("key2", 1, 1000))
    for wm in (999, 1999, 2999, 3999, 4999, 5999, 6999, 7999):
        h.process_watermark(wm)

    assert sorted(sums(h)) == sorted(
        [
            (-2000, 1000, 3),  # key1@999
            (-1000, 2000, 3),  # key1@1999
            (-1000, 2000, 3),  # key2@1999
            (0, 3000, 3),      # key1@2999
            (0, 3000, 3),      # key2@2999
            (1000, 4000, 5),   # key2@3999
            (2000, 5000, 2),   # key2@4999
            (3000, 6000, 2),   # key2@5999
        ]
    )


def test_dynamic_event_time_session_windows_golden():
    """WindowOperatorTest.java:1227 testDynamicEventTimeSessionWindows —
    per-element gaps (key1: 3s; key2: 1s for value 10, else 2s); the
    furthest timeout wins when a shorter gap lands inside a session."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    def gap(row, ts):
        if row[0] == "key1":
            return 3000
        return 1000 if row[1] == 10 else 2000

    k = EventTimeWindowKernel(session_windows(gap), 0, ts_idx=2, payload_idx=1, merging=True)
    h = harness(k)
    h.process_element(("key1", 3, 10))
    h.process_element(("key2", 4, 5000))
    h.process_element(("key2", 5, 6000))
    h.process_watermark(8999)
    h.process_element(("key2", 1, 9000))
    h.process_element(("key2", 2, 10000))
    h.process_element(("key2", 10, 10500))  # short gap inside: end stays 12000
    h.process_watermark(12999)
    h.process_element(("key2", 10, 13000))
    h.process_element(("key2", 10, 13500))
    h.process_element(("key2", 1, 14000))  # longer gap extends to 16000
    h.process_watermark(16999)

    assert sorted(sums(h)) == sorted(
        [
            (10, 3010, 3),       # key1-3
            (5000, 8000, 9),     # key2-9
            (9000, 12000, 13),   # key2-13
            (13000, 16000, 21),  # key2-21
        ]
    )


def test_drop_session_with_lateness_purging_golden():
    """WindowOperatorTest.java:1840
    testDropDueToLatenessSessionWithLatenessPurgingTrigger — the purging
    twin of the accumulating session-lateness golden: every re-fire carries
    only the post-purge contents (sums 5, 1, 1, 1)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 10, ts_idx=2, payload_idx=1, merging=True, purging=True
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1999)
    h.process_element(("key2", 1, 2000))
    h.process_watermark(4998)
    h.process_element(("key2", 1, 4500))
    h.process_element(("key2", 1, 8500))
    h.process_watermark(7400)
    h.process_element(("key2", 1, 7000))  # merges the two sessions
    h.process_watermark(11501)
    h.process_element(("key2", 1, 11600))
    h.process_watermark(14600)
    h.process_element(("key2", 1, 10000))  # merges the PURGED session: sum 1
    h.process_element(("key2", 1, 14500))
    h.process_watermark(20000)
    h.process_watermark(100000)

    assert sums(h) == [
        (1000, 11500, 5),
        (11600, 14600, 1),
        (10000, 14600, 1),  # post-purge merge re-fire
        (10000, 17500, 1),
    ]
    assert k.side_output == []


def test_session_windows_with_count_trigger_golden():
    """WindowOperatorTest.java:656 testSessionWindowsWithCountTrigger —
    PurgingTrigger(CountTrigger(4)) on 3s sessions: counts are ReducingState
    merged BY SUM on session merges (3+3 merge + the merging element = 7 ≥ 4
    fires the 22-sum window)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 0, ts_idx=2, payload_idx=1,
        merging=True, purging=True, count_trigger=4,
    )
    h = harness(k)
    h.process_element(("key2", 1, 0))
    h.process_element(("key2", 2, 1000))
    h.process_element(("key2", 3, 2500))
    h.process_element(("key2", 4, 3500))  # 4th element: fires key2-10
    h.process_element(("key1", 1, 10))
    h.process_element(("key1", 2, 1000))
    # (snapshot/restore point)
    h.process_element(("key1", 3, 2500))
    h.process_element(("key1", 1, 6000))
    h.process_element(("key1", 2, 6500))
    h.process_element(("key1", 3, 7000))
    # merges the two key1 sessions: counts 3+3 merge, +1 → fire
    h.process_element(("key1", 10, 4500))

    assert sums(h) == [
        (0, 6500, 10),    # key2-10 @6499
        (10, 10000, 22),  # key1-22 @9999
    ]


def test_count_trigger_on_global_windows_golden():
    """WindowOperatorTest.java:948 testCountTrigger — GlobalWindows +
    PurgingTrigger(CountTrigger(4)): timestamps are ignored, every 4th
    element per key fires and purges."""
    from flink_1_6_0_spark.streaming.session_window import LONG_MAX, global_windows

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1,
        merging=False, purging=True, count_trigger=4,
    )
    h = harness(k)
    h.process_element(("key2", 1, 3000))
    h.process_element(("key2", 1, 3999))
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))
    h.process_element(("key1", 1, 999))
    h.process_element(("key2", 1, 1998))
    h.process_element(("key2", 1, 1999))
    # (snapshot/restore point)
    h.process_element(("key2", 1, 1000))  # key2's 5th overall: 2nd window count 1
    h.process_element(("key1", 1, 10999))  # key1's 4th: fires
    h.process_element(("key2", 1, 1000))
    h.process_element(("key2", 1, 1000))
    h.process_element(("key2", 1, 1000))  # key2's 8th: fires again

    assert [(s, e, v) for (s, e, v) in sums(h)] == [
        (0, LONG_MAX + 1, 4),  # key2-4 (4th element, pre-snapshot)
        (0, LONG_MAX + 1, 4),  # key1-4
        (0, LONG_MAX + 1, 4),  # key2-4 again
    ]


def test_session_windows_with_continuous_event_time_trigger_golden():
    """WindowOperatorTest.java:726 testSessionWindowsWithContinuousEventTime
    Trigger — 3s sessions + 2s continuous ticks: per-window fire times merge
    BY MIN, each firing re-arms the next tick."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 0, ts_idx=2, payload_idx=1,
        merging=True, continuous_interval=2000,
    )
    h = harness(k)
    h.process_element(("key1", 1, 1500))
    h.process_element(("key2", 1, 0))
    h.process_element(("key2", 3, 2500))
    h.process_element(("key2", 2, 1000))
    h.process_watermark(2500)  # the 2000 tick fires both keys
    h.process_element(("key2", 5, 4000))
    h.process_watermark(3000)  # nothing due
    # (snapshot/restore point)
    h.process_element(("key1", 2, 4000))
    h.process_element(("key2", 4, 3500))
    h.process_watermark(4000)  # the 4000 tick fires both keys again

    assert sums(h) == [
        (1500, 4500, 1),  # key1-1 @tick 2000
        (0, 5500, 6),     # key2-6 @tick 2000
        (1500, 7000, 3),  # key1-3 @tick 4000
        (0, 7000, 15),    # key2-15 @tick 4000
    ]


def test_side_output_session_zero_lateness_golden():
    """WindowOperatorTest.java:1756 testSideOutputDueToLatenessSessionZero
    Lateness — with lateness 0 a fired session dies at its own firing timer,
    so the 10000 straggler side-outputs and 14500 starts a FRESH session
    (contrast with the lateness-10 twins where both merge)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 0, ts_idx=2, payload_idx=1, merging=True
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1999)
    h.process_element(("key2", 1, 2000))
    h.process_watermark(4998)
    h.process_element(("key2", 1, 4500))
    h.process_element(("key2", 1, 8500))
    h.process_watermark(7400)
    h.process_element(("key2", 1, 7000))
    h.process_watermark(11501)
    h.process_element(("key2", 1, 11600))
    h.process_watermark(14600)
    h.process_element(("key2", 1, 10000))  # late: side output
    h.process_element(("key2", 1, 14500))  # fresh session
    h.process_watermark(20000)
    h.process_watermark(100000)

    assert sums(h) == [
        (1000, 11500, 5),
        (11600, 14600, 1),
        (14500, 17500, 1),
    ]
    assert k.side_output == [("key2", 1, 10000)]


def _drive_huge_lateness(k):
    """Shared driving of the two huge-lateness session goldens
    (WindowOperatorTest.java:2027/:2117 — identical inputs)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows  # noqa: F401

    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1999)
    h.process_element(("key2", 1, 2000))
    h.process_watermark(4998)
    h.process_element(("key2", 1, 4500))
    h.process_element(("key2", 1, 8500))
    h.process_watermark(7400)
    h.process_element(("key2", 1, 7000))
    h.process_watermark(11501)
    h.process_element(("key2", 1, 11600))
    h.process_watermark(14600)
    # with 10s lateness the FIRST fired session is still alive: the 10000
    # straggler merges BOTH fired sessions into (1000, 14600) and the merged
    # maxTimestamp is already late → immediate firing
    h.process_element(("key2", 1, 10000))
    h.process_element(("key2", 1, 14500))
    h.process_watermark(20000)
    h.process_watermark(100000)
    return h


def test_session_huge_lateness_purging_golden():
    """WindowOperatorTest.java:2027 — PurgingTrigger: the merged re-fires
    carry only post-purge contents (5, 1, 1, 1)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 10000, ts_idx=2, payload_idx=1, merging=True, purging=True
    )
    h = _drive_huge_lateness(k)
    assert sums(h) == [
        (1000, 11500, 5),
        (11600, 14600, 1),
        (1000, 14600, 1),
        (1000, 17500, 1),
    ]
    assert k.side_output == []


def test_session_huge_lateness_accumulating_golden():
    """WindowOperatorTest.java:2117 — accumulating: the merged re-fires
    carry everything (5, 1, 7, 8)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 10000, ts_idx=2, payload_idx=1, merging=True
    )
    h = _drive_huge_lateness(k)
    assert sums(h) == [
        (1000, 11500, 5),
        (11600, 14600, 1),
        (1000, 14600, 7),
        (1000, 17500, 8),
    ]
    assert k.side_output == []


def test_continuous_tick_coinciding_with_max_timestamp_fires_once():
    """r12 ADVICE: when an aligned continuous tick lands exactly on a
    window's maxTimestamp, ContinuousEventTimeTrigger.onEventTime
    early-returns FIRE without touching fireTimestamp — one emission, no
    re-arm (pre-fix the kernel fired twice: once in the max_ts loop, once in
    the fire_ts loop)."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    # session gap 1000, element at ts=1001 -> window (1001, 2001),
    # maxTimestamp 2000 == the first aligned 2000ms tick
    k = EventTimeWindowKernel(
        session_windows(1000), 0, ts_idx=2, payload_idx=1,
        merging=True, continuous_interval=2000,
    )
    h = harness(k)
    h.process_element(("key1", 7, 1001))
    h.process_watermark(2000)
    assert sums(h) == [(1001, 2001, 7)]


def test_cleanup_timer_with_empty_state_tumbling_golden():
    """WindowOperatorTest.java:2260 testCleanupTimerWithEmptyListStateFor
    TumblingWindows (the Reduce/Folding variants drive identically — the
    contents-list model collapses the state primitive): accumulating fire
    at 1999, then the lateness-1 cleanup timer at 2000 finds state to drop
    and emits NOTHING — one record total, zero state after."""
    k = EventTimeWindowKernel(
        tumbling_windows(2000), 1, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1599)
    h.process_watermark(1999)   # fires
    h.process_watermark(2000)   # cleanup timer: silent drop
    h.process_watermark(5000)
    assert sums(h) == [(0, 2000, 1)]
    assert h.num_state_entries() == 0


def test_cleanup_timer_with_empty_state_tumbling_accum_gc_golden():
    """WindowOperatorTest.java:2208 testCleanupTimerWithEmptyListStateFor
    TumblingWindows2 — EventTimeTriggerAccumGC FIRE_AND_PURGEs at
    maxTimestamp AND again at the lateness-100 cleanup tick (2099): the
    second firing must find NO window state (purge DROPS a non-merging
    window, it doesn't keep an empty entry) and emit nothing, while the
    cleanup timer itself stays armed across the gap."""
    k = EventTimeWindowKernel(
        tumbling_windows(2000), 100, ts_idx=2, payload_idx=1,
        merging=False, purging=True,
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1599)
    h.process_watermark(1999)   # FIRE_AND_PURGE: emits, state dropped
    assert h.num_state_entries() == 0   # windowState.clear() — nothing kept
    assert h.num_event_timers() == 1    # "here is the cleanup timer" (2099)
    h.process_watermark(2100)   # cleanup fires on empty state: silence
    h.process_watermark(5000)
    assert sums(h) == [(0, 2000, 1)]
    assert h.num_state_entries() == 0


def test_cleanup_timer_with_empty_state_session_golden():
    """WindowOperatorTest.java:2406 testCleanupTimerWithEmptyListStateFor
    SessionWindows (+ the Reduce variant, same driving): 3s-gap session
    (1000, 4000) fires at 3999 and its lateness-10 cleanup (4009) rides the
    SAME watermark (4998) — one record, state fully retired, and the far
    watermark (14600) finds nothing to re-fire."""
    from flink_1_6_0_spark.streaming.session_window import session_windows

    k = EventTimeWindowKernel(
        session_windows(3000), 10, ts_idx=2, payload_idx=1, merging=True
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(4998)   # fire at 3999, cleanup at 4009, same advance
    h.process_watermark(14600)
    assert sums(h) == [(1000, 4000, 1)]
    assert h.num_state_entries() == 0
    assert k.side_output == []


def test_tumbling_event_time_windows_golden():
    """WindowOperatorTest.java:~250 testTumblingEventTimeWindowsReduce/Apply
    (shared driving; Reduce vs Apply collapse in the contents model): 3s
    tumbling, out-of-order elements, fires at 2999 (both keys, sum 3) and
    5999 (key2, sum 2); later watermarks emit nothing."""
    k = EventTimeWindowKernel(
        tumbling_windows(3000), 0, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    h.process_element(("key2", 1, 3999))
    h.process_element(("key2", 1, 3000))
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))
    h.process_element(("key1", 1, 999))
    h.process_element(("key2", 1, 1998))
    h.process_element(("key2", 1, 1999))
    h.process_element(("key2", 1, 1000))
    h.process_watermark(999)
    h.process_watermark(1999)
    assert sums(h) == []
    h.process_watermark(2999)
    assert sorted(sums(h)) == [(0, 3000, 3), (0, 3000, 3)]  # key1-3, key2-3
    h.process_watermark(3999)
    h.process_watermark(4999)
    h.process_watermark(5999)
    assert sorted(sums(h)) == [(0, 3000, 3), (0, 3000, 3), (3000, 6000, 2)]
    h.process_watermark(6999)
    h.process_watermark(7999)
    assert len(sums(h)) == 3


def test_cleanup_time_overflow_golden():
    """WindowOperatorTest.java:~1560 testCleanupTimeOverflow — a window near
    Long.MAX_VALUE whose maxTimestamp + lateness overflows must clamp its
    cleanup to Long.MAX_VALUE (Java wrap-around guard): the watermark at
    MAX-1500 must NOT garbage-collect the just-added window, and the
    watermark at maxTimestamp fires it."""
    LONG_MAX_ = 2**63 - 1
    k = EventTimeWindowKernel(
        tumbling_windows(1000), 2000, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    ts = LONG_MAX_ - 1750
    start = ts - ts % 1000
    h.process_element(("key2", 1, ts))
    assert start + 1000 - 1 + 2000 > LONG_MAX_  # the overflow the test is about
    h.process_watermark(LONG_MAX_ - 1500)  # would clean if the clamp wrapped
    assert sums(h) == []
    h.process_watermark(start + 1000 - 1)
    assert sums(h) == [(start, start + 1000, 1)]


def test_side_output_due_to_lateness_sliding_golden():
    """WindowOperatorTest.java:~1690 testSideOutputDueToLatenessSliding —
    1s-slide/3s-size sliding windows, lateness 0: the 2400 stragglers still
    land in their two LIVE panes (late re-fire not needed — panes (2000,5000)
    and... are unfired), while the 3001 element after watermark 6000 is late
    beyond every pane and side-outputs."""
    from flink_1_6_0_spark.streaming.session_window import sliding_windows

    k = EventTimeWindowKernel(
        sliding_windows(3000, 1000), 0, ts_idx=2, payload_idx=1, merging=False
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_watermark(1999)
    assert sums(h) == [(-1000, 2000, 1)]
    h.process_element(("key2", 1, 2000))
    h.process_watermark(3000)
    assert sums(h)[-1] == (0, 3000, 2)
    h.process_element(("key1", 1, 3001))
    h.process_element(("key2", 1, 2400))
    h.process_element(("key2", 1, 2400))
    h.process_element(("key1", 1, 3001))
    h.process_element(("key2", 1, 3900))
    h.process_watermark(6000)
    assert sorted(sums(h)[2:]) == sorted([
        (1000, 4000, 5),  # key2-5 @3999
        (1000, 4000, 2),  # key1-2 @3999
        (2000, 5000, 4),  # key2-4 @4999
        (2000, 5000, 2),  # key1-2 @4999
        (3000, 6000, 1),  # key2-1 @5999
        (3000, 6000, 2),  # key1-2 @5999
    ])
    assert k.side_output == []
    h.process_element(("key1", 1, 3001))  # beyond every pane now
    h.process_watermark(25000)
    assert k.side_output == [("key1", 1, 3001)]
    assert len(sums(h)) == 8


def test_continuous_watermark_trigger_on_global_windows_golden():
    """WindowOperatorTest.java:~800 testContinuousWatermarkTrigger —
    GlobalWindows + ContinuousEventTimeTrigger(3s), accumulating: key1's
    tick (seeded by its ts-0 element) fires at 3000 and again at 6000;
    key2's (seeded at ts 3000) first fires at 6000; 7000/8000 are silent."""
    from flink_1_6_0_spark.streaming.session_window import global_windows

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1,
        merging=False, continuous_interval=3000,
    )
    h = harness(k)
    h.process_element(("key1", 1, 0))
    h.process_element(("key2", 1, 3000))
    h.process_element(("key2", 1, 3999))
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 999))
    h.process_element(("key2", 1, 1998))
    h.process_element(("key2", 1, 1999))
    h.process_element(("key2", 1, 1000))
    for wm in (1000, 2000):
        h.process_watermark(wm)
    assert sums(h) == []
    h.process_watermark(3000)
    assert [s for (_, _, s) in sums(h)] == [3]          # key1-3
    for wm in (4000, 5000):
        h.process_watermark(wm)
    h.process_watermark(6000)
    assert sorted(s for (_, _, s) in sums(h)) == [3, 3, 5]  # + key1-3, key2-5
    h.process_watermark(7000)
    h.process_watermark(8000)
    assert len(sums(h)) == 3


def test_count_evictor_evict_after_golden():
    """EvictingWindowOperatorTest.java:75 testCountEvictorEvictAfter —
    GlobalWindows + CountTrigger(2) + CountEvictor(4, evictAfter): the fire
    sums EVERYTHING buffered (evictAfter runs post-emit), then trims to the
    last 4."""
    from flink_1_6_0_spark.streaming.session_window import count_evictor, global_windows

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1, merging=False,
        count_trigger=2, evictor=count_evictor(4, evict_after=True),
    )
    h = harness(k)
    h.process_element(("key2", 1, 3000))
    h.process_element(("key2", 1, 3999))
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))
    h.process_element(("key1", 1, 999))
    h.process_element(("key2", 1, 1998))
    h.process_element(("key2", 1, 1999))
    h.process_element(("key2", 1, 1000))
    assert sorted(s for (_, _, s) in sums(h)) == [2, 2, 4]  # key2-2, key1-2, key2-4
    h.process_element(("key1", 1, 10999))
    h.process_element(("key2", 1, 1000))
    assert sorted(s for (_, _, s) in sums(h)[3:]) == [4, 6]  # key1-4, key2-6 (all 6 summed)
    h.process_element(("key2", 1, 1000))
    h.process_element(("key2", 1, 1000))
    # trimmed to 4 after the last fire, +2 new = 6 again
    assert [s for (_, _, s) in sums(h)][5:] == [6]


def test_time_evictor_evict_before_golden():
    """EvictingWindowOperatorTest.java:215 testTimeEvictorEvictBefore — 4s
    tumbling + CountTrigger(2) + TimeEvictor(2s): each fire first drops
    elements older than max(ts) - 2s FROM STATE, then sums the rest."""
    from flink_1_6_0_spark.streaming.session_window import time_evictor

    k = EventTimeWindowKernel(
        tumbling_windows(4000), 0, ts_idx=2, payload_idx=1, merging=False,
        count_trigger=2, evictor=time_evictor(2000, evict_after=False),
    )
    h = harness(k)
    h.process_element(("key2", 1, 1000))
    h.process_element(("key2", 1, 3999))   # fire: 1000 evicted (<= 1999) -> 1
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))      # fire: nothing evicted -> 2
    h.process_element(("key1", 1, 999))
    h.process_element(("key1", 1, 5999))   # other pane (4000,8000), count 1
    h.process_element(("key2", 1, 3500))
    h.process_element(("key2", 1, 2001))   # fire: [3999,3500,2001] -> 3
    h.process_element(("key2", 1, 1001))
    assert [s for (_, _, s) in sums(h)] == [1, 2, 3]
    h.process_element(("key1", 1, 6500))   # fire (4000,8000): [5999,6500] -> 2
    h.process_element(("key2", 1, 1002))   # fire: 1001,1002 evicted -> [3999,3500,2001] -> 3
    assert [s for (_, _, s) in sums(h)][3:] == [2, 3]


def test_delta_evictor_evict_before_golden():
    """EvictingWindowOperatorTest.java:348 testDeltaEvictorEvictBefore —
    GlobalWindows + CountTrigger(2) + DeltaEvictor(threshold 2,
    delta = new - old): evict e when last.value - e.value >= 2 before
    summing."""
    from flink_1_6_0_spark.streaming.session_window import delta_evictor, global_windows

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1, merging=False,
        count_trigger=2,
        evictor=delta_evictor(2, lambda old, new: new - old, evict_after=False),
    )
    h = harness(k)
    h.process_element(("key2", 1, 3000))
    h.process_element(("key2", 4, 3999))   # fire: evict 1 (delta 3) -> 4
    h.process_element(("key1", 1, 20))
    h.process_element(("key1", 1, 0))      # fire: keep both -> 2
    h.process_element(("key1", 5, 999))
    h.process_element(("key2", 5, 1998))
    h.process_element(("key2", 6, 1999))   # fire: [4,5,6], evict 4 -> 11
    h.process_element(("key2", 1, 1000))
    assert sorted(s for (_, _, s) in sums(h)) == [2, 4, 11]
    h.process_element(("key1", 3, 10999))  # fire: [1,5,3], evict 1 -> 8
    h.process_element(("key2", 10, 1000))  # fire: [5,6,1,10], evict all but 10 -> 10
    assert sorted(s for (_, _, s) in sums(h)[3:]) == [8, 10]


def test_time_evictor_evict_after_golden():
    """EvictingWindowOperatorTest.java:148 testTimeEvictorEvictAfter —
    GlobalWindows + CountTrigger(2) + TimeEvictor(2s, evictAfter): sums
    include everything buffered; the post-emit evict drops elements older
    than max(ts) - 2s from state."""
    from flink_1_6_0_spark.streaming.session_window import global_windows, time_evictor

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1, merging=False,
        count_trigger=2, evictor=time_evictor(2000, evict_after=True),
    )
    h = harness(k)
    for e in [("key2", 1, 1000), ("key2", 1, 4000), ("key1", 1, 20),
              ("key1", 1, 0), ("key1", 1, 999), ("key2", 1, 3500),
              ("key2", 1, 2001), ("key2", 1, 1001)]:
        h.process_element(e)
    assert sorted(s for (_, _, s) in sums(h)) == [2, 2, 3]
    h.process_element(("key1", 1, 10999))
    h.process_element(("key2", 1, 1002))
    assert sorted(s for (_, _, s) in sums(h)[3:]) == [4, 5]


def test_delta_evictor_evict_after_golden():
    """EvictingWindowOperatorTest.java:420 testDeltaEvictorEvictAfter."""
    from flink_1_6_0_spark.streaming.session_window import delta_evictor, global_windows

    k = EventTimeWindowKernel(
        global_windows(), 0, ts_idx=2, payload_idx=1, merging=False,
        count_trigger=2,
        evictor=delta_evictor(2, lambda old, new: new - old, evict_after=True),
    )
    h = harness(k)
    for e in [("key2", 1, 3000), ("key2", 4, 3999), ("key1", 1, 20),
              ("key1", 1, 0), ("key1", 5, 999), ("key2", 5, 1998),
              ("key2", 6, 1999), ("key2", 1, 1000)]:
        h.process_element(e)
    assert sorted(s for (_, _, s) in sums(h)) == [2, 5, 15]
    h.process_element(("key1", 9, 10999))
    h.process_element(("key2", 10, 1000))
    assert sorted(s for (_, _, s) in sums(h)[3:]) == [16, 22]


def test_evict_before_empties_window_still_emits():
    """EvictingWindowOperator.java:336 — emitWindowContents invokes the
    window function even when evictBefore removed EVERY element (the
    reference passes the empty projected iterable to process()); a
    TimeEvictor(0) empties every firing, so each fire emits the
    empty-contents record rather than nothing (r13 ADVICE item)."""
    from flink_1_6_0_spark.streaming.cleanup_state import KeyedProcessHarness
    from flink_1_6_0_spark.streaming.session_window import (
        EventTimeWindowKernel,
        time_evictor,
        tumbling_windows,
    )

    kernel = EventTimeWindowKernel(
        tumbling_windows(1000), 0, ts_idx=1, payload_idx=2, merging=False,
        evictor=time_evictor(0, evict_after=False),
    )
    h = KeyedProcessHarness(kernel, key_fn=lambda r: r[0])
    h.process_element(("k", 100, 7))
    h.process_element(("k", 200, 8))
    h.process_watermark(999)
    assert [rec for rec, _ in h.output] == [(0, 1000, ())]


def test_processing_time_tumbling_windows_golden():
    """WindowOperatorTest.java:1037 testProcessingTimeTumblingWindows — 3s
    tumbling PROC-time windows: assignment reads the clock (element
    timestamps ignored), ProcessingTimeTrigger fires at maxTimestamp, the
    firing timer is also the cleanup timer."""
    k = EventTimeWindowKernel(
        tumbling_windows(3000), 0, ts_idx=2, payload_idx=1, merging=False,
        time_domain="proc",
    )
    h = harness(k)
    h.set_processing_time(3)
    h.process_element(("key2", 1, 2**63 - 1))  # timestamp ignored
    h.process_element(("key2", 1, 7000))
    h.process_element(("key2", 1, 7000))
    h.process_element(("key1", 1, 7000))
    h.process_element(("key1", 1, 7000))
    h.set_processing_time(5000)
    assert sorted(sums(h)) == sorted([(0, 3000, 3), (0, 3000, 2)])
    h.process_element(("key1", 1, 7000))
    h.process_element(("key1", 1, 7000))
    h.process_element(("key1", 1, 7000))
    h.set_processing_time(7000)
    assert sorted(sums(h)) == sorted(
        [(0, 3000, 3), (0, 3000, 2), (3000, 6000, 3)]
    )
    assert h.num_state_entries() == 0  # fire timer == cleanup timer


def test_processing_time_sliding_windows_golden():
    """WindowOperatorTest.java:1093 testProcessingTimeSlidingWindows — 3s/1s
    sliding PROC-time windows."""
    from flink_1_6_0_spark.streaming.session_window import sliding_windows

    k = EventTimeWindowKernel(
        sliding_windows(3000, 1000), 0, ts_idx=2, payload_idx=1,
        merging=False, time_domain="proc",
    )
    h = harness(k)
    h.set_processing_time(3)
    h.process_element(("key2", 1, 2**63 - 1))
    h.set_processing_time(1000)
    assert sums(h) == [(-2000, 1000, 1)]
    h.process_element(("key2", 1, 2**63 - 1))
    h.process_element(("key2", 1, 2**63 - 1))
    h.set_processing_time(2000)
    assert sums(h) == [(-2000, 1000, 1), (-1000, 2000, 3)]
    h.process_element(("key1", 1, 2**63 - 1))
    h.process_element(("key1", 1, 2**63 - 1))
    h.set_processing_time(3000)
    assert sorted(sums(h)) == sorted(
        [(-2000, 1000, 1), (-1000, 2000, 3), (0, 3000, 3), (0, 3000, 2)]
    )
    h.process_element(("key1", 1, 2**63 - 1))
    h.process_element(("key1", 1, 2**63 - 1))
    h.process_element(("key1", 1, 2**63 - 1))
    h.set_processing_time(7000)
    assert sorted(sums(h)) == sorted(
        [
            (-2000, 1000, 1), (-1000, 2000, 3), (0, 3000, 3), (0, 3000, 2),
            (1000, 4000, 2), (1000, 4000, 5), (2000, 5000, 5), (3000, 6000, 3),
        ]
    )


def test_processing_time_session_windows_golden():
    """WindowOperatorTest.java:1164 testProcessingTimeSessionWindows — 3s-gap
    PROC-time sessions: merge on the clock, stale timers of merged-away
    windows are no-ops."""
    k = EventTimeWindowKernel(
        session_windows(3000), 0, ts_idx=2, payload_idx=1, merging=True,
        time_domain="proc",
    )
    h = harness(k)
    h.set_processing_time(3)
    h.process_element(("key2", 1, 1))
    h.set_processing_time(1000)
    h.process_element(("key2", 1, 1002))
    h.set_processing_time(5000)
    assert sums(h) == [(3, 4000, 2)]
    h.process_element(("key2", 1, 5000))
    h.process_element(("key2", 1, 5000))
    h.process_element(("key1", 1, 5000))
    h.process_element(("key1", 1, 5000))
    h.process_element(("key1", 1, 5000))
    h.set_processing_time(10000)
    assert sorted(sums(h)) == sorted(
        [(3, 4000, 2), (5000, 8000, 2), (5000, 8000, 3)]
    )


def test_dynamic_processing_time_session_windows_golden():
    """WindowOperatorTest.java:1309 testDynamicProcessingTimeSessionWindows —
    per-element gap extractor (key1 3s; key2: value 10 -> 1s, else 2s); a
    shorter-gap element inside a longer session must respect the furthest
    timeout (merge keeps the max end)."""

    def gap(row, ts):
        if row[0] == "key1":
            return 3000
        return 1000 if row[1] == 10 else 2000

    k = EventTimeWindowKernel(
        session_windows(gap), 0, ts_idx=2, payload_idx=1, merging=True,
        time_domain="proc",
    )
    h = harness(k)
    h.set_processing_time(10)
    h.process_element(("key1", 3, 10))
    h.set_processing_time(5000)
    h.process_element(("key2", 4, 5000))
    h.set_processing_time(6000)
    h.process_element(("key2", 5, 6000))
    h.set_processing_time(8999)
    assert sorted(sums(h)) == sorted([(10, 3010, 3), (5000, 8000, 9)])
    h.set_processing_time(9000)
    h.process_element(("key2", 1, 9000))
    h.set_processing_time(10000)
    h.process_element(("key2", 2, 10000))
    h.set_processing_time(10500)
    h.process_element(("key2", 10, 10500))
    h.set_processing_time(10500)
    h.set_processing_time(13000)
    h.process_element(("key2", 10, 13000))
    h.set_processing_time(13500)
    h.process_element(("key2", 10, 13500))
    h.set_processing_time(14000)
    h.process_element(("key2", 1, 14000))
    h.set_processing_time(16999)
    assert sorted(sums(h)) == sorted(
        [(10, 3010, 3), (5000, 8000, 9), (9000, 12000, 13), (13000, 16000, 21)]
    )
