"""Port of SessionWindowITCase.java (flink-tests/.../windowing/
sessionwindows/SessionWindowITCase.java:63) — event-time session windows
under allowed lateness, validated with the suite's own invariants:

- every ON-TIME firing contains exactly the session's EVENTS_PER_SESSION
  timed events (ValidatingWindowFunction, SessionWindowITCase.java:100);
- the i-th LATE firing contains the timed events plus exactly i late events
  (each late-but-within-lateness element re-fires the accumulated window);
- events later than maxTimestamp + allowedLateness never appear in any
  firing (the side-output/drop path);
- the two accumulator totals: on-time events counted across all firings =
  (LATE_EVENTS_PER_SESSION + 1) × NUMBER_OF_SESSIONS × EVENTS_PER_SESSION,
  late events counted = NUMBER_OF_SESSIONS × Σ(1..LATE_EVENTS_PER_SESSION)
  (SessionWindowITCase.java:85-92).

The reference drives 20 000 pseudo-random parallel sessions through its
ParallelSessionsEventGenerator; this port keeps the generator's STRUCTURE
(timed / late / dropped event classes, per-session randomized gaps and
timestamps, NUMBER_OF_DIFFERENT_KEYS keys in lockstep) at a scaled-down
session count with a fixed seed — the invariants, not the RNG stream, are
the test.
"""

from __future__ import annotations

import random

from flink_1_6_0_spark.streaming.cleanup_state import KeyedProcessHarness
from flink_1_6_0_spark.streaming.session_window import SessionWindowKernel

RANDOM_SEED = 1234567
NUMBER_OF_SESSIONS = 200          # reference: 20_000, scaled
MAX_SESSION_EVENT_GAP_MS = 1_000
ALLOWED_LATENESS_MS = 500
EVENTS_PER_SESSION = 10
LATE_EVENTS_PER_SESSION = 5
MAX_DROPPED_EVENTS_PER_SESSION = 5
NUMBER_OF_DIFFERENT_KEYS = 20


def test_session_windows_with_lateness_golden():
    rng = random.Random(RANDOM_SEED)
    h = KeyedProcessHarness(
        SessionWindowKernel(
            gap_ms=MAX_SESSION_EVENT_GAP_MS,
            allowed_lateness_ms=ALLOWED_LATENESS_MS,
            ts_idx=1,
            payload_idx=2,
        ),
        key_fn=lambda r: r[0],
    )

    on_time_counter = 0
    late_counter = 0
    expected_firings: dict[tuple, list[set]] = {}
    dropped_payloads: set[str] = set()
    emitted = 0

    rounds = NUMBER_OF_SESSIONS // NUMBER_OF_DIFFERENT_KEYS
    base = 1_000
    session_no = 0
    for _ in range(rounds):
        # -- timed events: all keys share one time base per round (the
        # watermark is global, so keys advance in lockstep like the
        # reference's parallel generator)
        timed_ts = sorted(
            rng.randrange(base, base + MAX_SESSION_EVENT_GAP_MS * 3)
            for _ in range(EVENTS_PER_SESSION)
        )
        # enforce intra-session gaps < the session gap so one session forms
        ts_list = [timed_ts[0]]
        for t in timed_ts[1:]:
            ts_list.append(min(t, ts_list[-1] + rng.randrange(1, MAX_SESSION_EVENT_GAP_MS)))
        per_key_sets = {}
        for k in range(NUMBER_OF_DIFFERENT_KEYS):
            sid = session_no + k
            payloads = [f"s{sid}_t{j}" for j in range(EVENTS_PER_SESSION)]
            order = list(range(EVENTS_PER_SESSION))
            rng.shuffle(order)  # out-of-order arrival within the session
            for j in order:
                h.process_element((k, ts_list[j], payloads[j]))
            per_key_sets[k] = set(payloads)
        window_end = ts_list[-1] + MAX_SESSION_EVENT_GAP_MS
        max_ts = window_end - 1

        # -- on-time firing
        h.process_watermark(max_ts)
        for k in range(NUMBER_OF_DIFFERENT_KEYS):
            expected_firings[(k, session_no + k)] = [set(per_key_sets[k])]
            on_time_counter += EVENTS_PER_SESSION

        # -- late events: within lateness, each one re-fires the window
        for i in range(1, LATE_EVENTS_PER_SESSION + 1):
            for k in range(NUMBER_OF_DIFFERENT_KEYS):
                sid = session_no + k
                late_ts = rng.randrange(ts_list[0], ts_list[-1] + 1)
                payload = f"s{sid}_l{i}"
                h.process_element((k, late_ts, payload))
                grown = set(expected_firings[(k, sid)][-1]) | {payload}
                expected_firings[(k, sid)].append(grown)
                on_time_counter += EVENTS_PER_SESSION
                late_counter += i

        # -- cleanup passes, then dropped events (beyond lateness)
        h.process_watermark(max_ts + ALLOWED_LATENESS_MS)
        for k in range(NUMBER_OF_DIFFERENT_KEYS):
            sid = session_no + k
            for d in range(rng.randrange(1, MAX_DROPPED_EVENTS_PER_SESSION + 1)):
                ts = rng.randrange(ts_list[0], ts_list[-1] + 1)
                payload = f"s{sid}_d{d}"
                dropped_payloads.add(payload)
                h.process_element((k, ts, payload))

        session_no += NUMBER_OF_DIFFERENT_KEYS
        base = max_ts + ALLOWED_LATENESS_MS + MAX_SESSION_EVENT_GAP_MS + 1

    # ---- validate (ValidatingWindowFunction semantics) -------------------
    per_window: dict[tuple, list[set]] = {}
    for (start, end, contents), change in h.output:
        assert change is True
        got = set(contents)
        assert len(got) == len(contents), "duplicate events inside a firing"
        key_session = next(iter(got)).split("_")[0]
        per_window.setdefault((key_session, start, end), []).append(got)
        emitted += 1
        assert not (got & dropped_payloads), "a dropped event appeared in a firing"

    # each session fired exactly 1 + LATE_EVENTS_PER_SESSION times, with the
    # exact accumulated contents in order
    assert emitted == NUMBER_OF_SESSIONS * (1 + LATE_EVENTS_PER_SESSION)
    checked = 0
    for (k, sid), firings in expected_firings.items():
        key = f"s{sid}"
        actual = [
            f for (ks, _s, _e), fs in per_window.items() if ks == key for f in fs
        ]
        assert len(actual) == len(firings) == 1 + LATE_EVENTS_PER_SESSION
        # firings are ordered: on-time first, then one per late event
        for got, want in zip(actual, firings):
            assert got == want
        checked += 1
    assert checked == NUMBER_OF_SESSIONS

    # the two reference accumulators (SessionWindowITCase.java:85-92)
    assert on_time_counter == (LATE_EVENTS_PER_SESSION + 1) * NUMBER_OF_SESSIONS * EVENTS_PER_SESSION
    assert late_counter == NUMBER_OF_SESSIONS * (
        LATE_EVENTS_PER_SESSION * (LATE_EVENTS_PER_SESSION + 1) // 2
    )
    # every dropped event was counted by the side-output analog
    assert h.kernel.dropped == len(dropped_payloads)


def test_session_window_basics():
    """Unit pins for the kernel itself: gap merge incl. touching windows,
    out-of-order growth before the watermark, no spurious firings."""
    h = KeyedProcessHarness(
        SessionWindowKernel(gap_ms=10, allowed_lateness_ms=0, ts_idx=1, payload_idx=2),
        key_fn=lambda r: r[0],
    )
    h.process_element(("k", 1, "a"))
    h.process_element(("k", 30, "b"))   # separate session
    h.process_element(("k", 11, "c"))   # touches [1,11): merges -> [1,21)
    h.process_element(("k", 15, "d"))   # inside: [1,25)
    h.process_watermark(24)             # fires session 1: maxTs 24
    h.process_watermark(39)             # fires session 2: maxTs 39
    assert h.output == [
        ((1, 25, ("a", "c", "d")), True),
        ((30, 40, ("b",)), True),
    ]
    assert h.states == {}  # lateness 0: cleanup at the firing timer
