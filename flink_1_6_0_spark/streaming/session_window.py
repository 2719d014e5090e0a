"""Event-time session windows with allowedLateness — the WindowOperator
merging/lateness/re-fire protocol.

Reference: flink-streaming-java/.../runtime/operators/windowing/
WindowOperator.java:358 (processElement for MergingWindowAssigner: merge →
isWindowLate retire → trigger.onElement → FIRE → registerCleanupTimer),
:590 isWindowLate (cleanupTime(w) ≤ watermark), :602 isElementLate,
:610 registerCleanupTimer (maxTimestamp + allowedLateness),
EventTimeTrigger.java:39 (onElement FIREs immediately when maxTimestamp ≤
watermark — the LATE-DATA RE-FIRE — else registers the maxTimestamp timer;
onEventTime FIREs only at exactly maxTimestamp), TimeWindow.java
(maxTimestamp = end − 1), EventTimeSessionWindows.java:83 (assign
[ts, ts + gap)), and the acceptance suite SessionWindowITCase.java:63
(flink-tests/.../windowing/sessionwindows/).

Why a kernel: Spark's session_window() + watermark drops late rows at
admission and never re-fires an emitted window; Flink's allowedLateness
keeps the ACCUMULATED window state alive for `lateness` past the on-time
firing and re-emits the grown window per late element. That re-fire
protocol is this kernel, runnable per key on the deterministic harness
(tests) or distributed by key via applyInPandas (same argument as
streaming/cleanup_state.py — all state is per key).

At scale the state bound is Flink's: open sessions × contents, plus fired
windows retained for `lateness` — the cleanup timer is what reclaims them.
"""

from __future__ import annotations

from flink_1_6_0_spark.streaming.cleanup_state import CleanupKernelBase

__all__ = ["SessionWindowKernel"]

LONG_MAX = 2**63 - 1


class SessionWindowKernel(CleanupKernelBase):
    """Keyed session-window operator: gap merging, allowedLateness re-fires,
    late-beyond-lateness drops (counted in ``self.dropped``; the reference
    routes them to a side output).

    Emits ``((key_field..., window_start, window_end, contents_tuple), True)``
    per firing — accumulating trigger (PURGE_WINDOW_ON_FIRE=false in the
    ITCase), so each firing carries the FULL window contents so far.

    State per key: ``windows`` = {(start, end): [payload, ...]}.
    """

    def __init__(self, gap_ms: int, allowed_lateness_ms: int, ts_idx: int, payload_idx: int):
        super().__init__(None)
        if allowed_lateness_ms < 0:
            raise ValueError("The allowed lateness must be non-negative.")
        self.gap = gap_ms
        self.lateness = allowed_lateness_ms
        self.ts_idx = ts_idx
        self.payload_idx = payload_idx
        self.dropped = 0  # side-output analog (WindowOperator.java:434)

    # -- window math ------------------------------------------------------
    @staticmethod
    def _max_ts(window: tuple[int, int]) -> int:
        return window[1] - 1  # TimeWindow.maxTimestamp

    def _cleanup_time(self, window) -> int:
        t = self._max_ts(window) + self.lateness
        return t if t >= self._max_ts(window) else LONG_MAX

    def _is_window_late(self, window, ctx) -> bool:
        # WindowOperator.java:590
        return self._cleanup_time(window) <= ctx.current_watermark()

    # -- operator protocol --------------------------------------------------
    def process_element(self, state, ctx, row, change, out):
        ts = row[self.ts_idx]
        payload = row[self.payload_idx]
        windows = state.setdefault("windows", {})

        # EventTimeSessionWindows.assignWindows: [ts, ts + gap)
        new_window = (ts, ts + self.gap)
        # MergingWindowSet.addWindow: coalesce every overlapping window
        overlapping = [w for w in windows if w[0] <= new_window[1] and new_window[0] <= w[1]]
        contents: list = []
        for w in overlapping:
            contents.extend(windows.pop(w))
        actual = (
            min([new_window[0]] + [w[0] for w in overlapping]),
            max([new_window[1]] + [w[1] for w in overlapping]),
        )

        if self._is_window_late(actual, ctx):
            # retireWindow + side output (element is necessarily late too)
            self.dropped += 1
            if not windows:
                state.pop("windows", None)
            return

        contents.append(payload)
        windows[actual] = contents

        # EventTimeTrigger.onElement: immediate FIRE for a window whose
        # maxTimestamp the watermark already passed (the late-data re-fire),
        # else arm the on-time timer
        if self._max_ts(actual) <= ctx.current_watermark():
            self._emit(out, actual, contents)
        else:
            ctx.register_event_timer(self._max_ts(actual))
        ctx.register_event_timer(self._cleanup_time(actual))

    def on_timer(self, state, ctx, timestamp, is_proc_time, out):
        if is_proc_time:
            return
        windows = state.get("windows") or {}
        # fire windows whose maxTimestamp is exactly this timer (stale timers
        # of merged-away windows match nothing — the namespaced-timer no-op)
        for w in list(windows):
            if self._max_ts(w) == timestamp:
                self._emit(out, w, windows[w])
        # clear windows whose cleanup time arrived (accumulating trigger:
        # state lives until maxTimestamp + allowedLateness)
        for w in list(windows):
            if self._cleanup_time(w) == timestamp:
                del windows[w]
        if not windows:
            state.pop("windows", None)

    def _emit(self, out, window, contents):
        out.collect((window[0], window[1], tuple(contents)), True)
