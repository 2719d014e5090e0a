"""CEP — complex event pattern matching. SURVEY.md §2.12.

Reference: flink-libraries/flink-cep — Pattern DSL (pattern/Pattern.java:
begin:123, where:150, next:256, followedBy:285, followedByAny:316,
within:239) executed by an NFA (nfa/NFA.java:82).

Spark has no CEP; this module provides:
- the Pattern DSL (begin/next/followed_by/followed_by_any/within),
- a batch executor: per-key ordered scan inside ``applyInPandas`` (Arrow
  batches; each key's sequence is processed independently, so the operator
  scales with key count like the reference's keyed NFA),
- a streaming executor: ``applyInPandasWithState`` keeps a bounded buffer of
  events per key (the `within` horizon is the state bound — NFA state +
  timers analog) and re-scans on each micro-batch.

Contiguity semantics implemented (Pattern.java):
- ``next``            — strict: the immediately following event
- ``followed_by``     — relaxed: the FIRST later matching event
- ``followed_by_any`` — non-deterministic relaxed: EVERY later matching event
  (allowCombinations, Pattern.java:435)

Event order within a key is (ts, event_id) — a total order, so matches are
deterministic and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

NEXT = "next"
FOLLOWED_BY = "followed_by"
FOLLOWED_BY_ANY = "followed_by_any"


@dataclass
class Stage:
    name: str
    predicate: Callable[[dict[str, Any]], bool]
    contiguity: str = FOLLOWED_BY


@dataclass
class Pattern:
    """Fluent pattern DSL (Pattern.java:123ff)."""

    stages: list[Stage] = field(default_factory=list)
    within_seconds: float | None = None

    @staticmethod
    def begin(name: str, where: Callable[[dict[str, Any]], bool]) -> "Pattern":
        return Pattern(stages=[Stage(name, where)])

    def next(self, name: str, where) -> "Pattern":
        self.stages.append(Stage(name, where, NEXT))
        return self

    def followed_by(self, name: str, where) -> "Pattern":
        self.stages.append(Stage(name, where, FOLLOWED_BY))
        return self

    def followed_by_any(self, name: str, where) -> "Pattern":
        self.stages.append(Stage(name, where, FOLLOWED_BY_ANY))
        return self

    def within(self, seconds: float) -> "Pattern":
        self.within_seconds = seconds
        return self

    @property
    def within_micros(self) -> int | None:
        """Exact integer-µs horizon (float-second comparisons could flip a
        match exactly at the boundary; interval arithmetic must be exact)."""
        return None if self.within_seconds is None else int(round(self.within_seconds * 1_000_000))


def _scan(events: list[dict], pattern: Pattern) -> list[tuple[int, ...]]:
    """Ordered NFA scan over one key's events; returns index tuples, one per
    match. ``events[i]['__ts']`` is integer epoch-µs; `within` is enforced
    against the first stage's timestamp with exact integer arithmetic."""
    out: list[tuple[int, ...]] = []
    n = len(events)
    within_us = pattern.within_micros

    def expand(stage_i: int, last_idx: int, start_ts: int, acc: tuple[int, ...]):
        if stage_i == len(pattern.stages):
            out.append(acc)
            return
        st = pattern.stages[stage_i]
        if st.contiguity == NEXT:
            candidates = [last_idx + 1] if last_idx + 1 < n else []
        else:
            candidates = range(last_idx + 1, n)
        for idx in candidates:
            ev = events[idx]
            if within_us is not None and ev["__ts"] - start_ts > within_us:
                break  # events sorted: nothing later fits either
            if st.predicate(ev):
                expand(stage_i + 1, idx, start_ts, acc + (idx,))
                if st.contiguity in (NEXT, FOLLOWED_BY):
                    return  # strict/relaxed: only the first candidate
        # no candidate matched this stage from acc — dead path

    for i, ev in enumerate(events):
        if pattern.stages[0].predicate(ev):
            expand(1, i, ev["__ts"], (i,))
    return out


def _match_frame(pdf: pd.DataFrame, pattern: Pattern, key_cols: list[str], ts_col: str, id_col: str) -> pd.DataFrame:
    pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(drop=True)
    events = pdf.to_dict("records")
    for ev in events:
        ev["__ts"] = pd.Timestamp(ev[ts_col]).value // 1000  # exact epoch-µs
    rows = []
    for match in _scan(events, pattern):
        row = {k: events[0][k] for k in key_cols}
        for st, idx in zip(pattern.stages, match):
            row[f"{st.name}_id"] = events[idx][id_col]
        rows.append(row)
    cols = key_cols + [f"{s.name}_id" for s in pattern.stages]
    return pd.DataFrame(rows, columns=cols)


def cep_batch(df: DataFrame, pattern: Pattern, key_cols: list[str], ts_col: str, id_col: str) -> DataFrame:
    """Batch CEP: per-key ordered pattern scan (CEP.pattern + select analog).
    Output: key columns + one ``<stage>_id`` per stage, one row per match."""
    schema = ", ".join(
        [f"{k} long" for k in key_cols] + [f"{s.name}_id long" for s in pattern.stages]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _match_frame(pdf, pattern, key_cols, ts_col, id_col)

    return df.groupBy(*key_cols).applyInPandas(fn, schema=schema)


def cep_stream(
    stream: DataFrame,
    pattern: Pattern,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    type_col: str,
    buffer_horizon_seconds: float | None = None,
    use_cleanup_timer: bool = True,
):
    """Streaming CEP via applyInPandasWithState (PatternStream analog).

    The keyed state IS the NFA buffer: (id, ts, type) triples trimmed to the
    ``within`` horizon behind the newest event, plus the set of already
    emitted match signatures (so re-scans across micro-batches never
    re-emit). ``setTimeoutDuration`` plays the cleanup-timer role
    (IntervalJoin/NFA timers); timer wake-ups drop idle buffers. Disable
    ``use_cleanup_timer`` for bounded-replay tests driven by
    processAllAvailable — pending processing-time timers keep scheduling
    micro-batches, so the synchronous drain never observes an idle query
    (state is still trimmed on every arriving event either way).

    Constraint (documented): streaming predicates see only the event's
    ``type``/``ts``/``id`` fields — the state store keeps the buffer narrow.
    The batch executor has no such restriction.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    horizon_s = buffer_horizon_seconds or pattern.within_seconds
    if horizon_s is None:
        raise ValueError("streaming CEP needs within() or an explicit buffer horizon")
    horizon = int(round(horizon_s * 1_000_000))  # exact µs

    out_cols = [f"{s.name}_id" for s in pattern.stages]
    out_schema = ", ".join([f"{k} long" for k in key_cols] + [f"{c} long" for c in out_cols])
    state_schema = "buf_ids array<long>, buf_ts array<double>, buf_types array<string>, emitted array<string>"

    def fn(key, pdfs, state):
        if state.hasTimedOut:
            # horizon expired with no new events: the NFA cleanup timer fires,
            # the buffer is dropped (re-arming here would busy-loop the query)
            state.remove()
            return
        buf_ids: list[int] = []
        buf_ts: list[float] = []
        buf_types: list[str] = []
        emitted: set[str] = set()
        if state.exists:
            bi, bt, bty, em = state.get
            buf_ids, buf_ts, buf_types, emitted = list(bi), list(bt), list(bty), set(em)
        for pdf in pdfs:
            if not len(pdf):
                continue
            buf_ids += [int(x) for x in pdf[id_col]]
            buf_ts += [float(pd.Timestamp(t).value // 1000) for t in pdf[ts_col]]  # µs, exact in double
            buf_types += [str(x) for x in pdf[type_col]]
        if not buf_ids:
            return
        events = sorted(
            (
                {"__ts": t, id_col: i, type_col: y, "ts_epoch": t}
                for i, t, y in zip(buf_ids, buf_ts, buf_types)
            ),
            key=lambda e: (e["__ts"], e[id_col]),
        )
        # dedup (a row can reappear on retried batches); scan FIRST, trim the
        # stored buffer AFTER — trimming first would evict in-batch events
        # that still complete matches with the batch's newest arrivals
        seen: set[int] = set()
        events = [e for e in events if not (e[id_col] in seen or seen.add(e[id_col]))]
        rows = []
        for match in _scan(events, pattern):
            sig = ",".join(str(events[i][id_col]) for i in match)
            if sig in emitted:
                continue
            emitted.add(sig)
            row = dict(zip(key_cols, key))
            for st, idx in zip(pattern.stages, match):
                row[f"{st.name}_id"] = events[idx][id_col]
            rows.append(row)
        newest = events[-1]["__ts"]
        keep = [e for e in events if e["__ts"] >= newest - horizon]
        state.update(
            (
                [e[id_col] for e in keep],
                [float(e["__ts"]) for e in keep],
                [e[type_col] for e in keep],
                sorted(emitted),
            )
        )
        if use_cleanup_timer:
            state.setTimeoutDuration(int(horizon_s * 1000))
        if rows:
            yield pd.DataFrame(rows, columns=key_cols + out_cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if use_cleanup_timer else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )
