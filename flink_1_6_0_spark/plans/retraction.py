"""Retraction model → output-mode chooser — SURVEY.md §4.3 custom-work item 3.

Reference: Flink decorates the stream plan with retraction traits
(runtime/types/CRow.scala:32 change flag; retractionTraits.scala;
DATASTREAM_DECO_RULES FlinkRuleSets.scala:220) and sinks declare their
capability: AppendStreamTableSink / RetractStreamTableSink /
UpsertStreamTableSink (flink-table/.../sinks/*.scala).

Spark replaces the CRow changelog with output modes:
- append   — finalized rows only (needs watermark to finalize aggregates)
- update   — changed rows per micro-batch (the "new" half of retract+new)
- complete — full result every batch (small results only)

This module picks the mode from (query shape × sink capability) — the same
decision Flink's deco phase + sink selection makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

APPEND_ONLY = "append-only"  # AppendStreamTableSink
RETRACT = "retract"          # RetractStreamTableSink
UPSERT = "upsert"            # UpsertStreamTableSink


def _plan_has(df: DataFrame, *fragments: str) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(f in plan for f in fragments)


def is_append_only(df: DataFrame) -> bool:
    """True when the streaming query emits only inserts: no aggregation, or
    aggregation whose GROUPING contains the event-time window of a
    watermarked column — Spark finalizes (and therefore appends) aggregate
    rows only when the watermark bounds the group itself. A watermark
    elsewhere in the plan does NOT make a keyed aggregation append-safe
    (``withWatermark().groupBy('user').count()`` still updates forever —
    review finding: the old any-watermark test chose a mode Spark rejects
    at start())."""
    import re

    if not df.isStreaming:
        return True
    plan = df._jdf.queryExecution().analyzed().toString()
    if "Aggregate" not in plan:
        return True
    if "EventTimeWatermark" not in plan:
        return False
    # the analyzer tags watermark-bound attributes with a `-T<delay>ms`
    # suffix (e.g. `window#21-T60000ms`); append is legal exactly when such
    # a tagged attribute sits in the Aggregate's GROUPING list
    for line in plan.splitlines():
        m = re.search(r"Aggregate \[([^\]]*)\]", line)
        if m and re.search(r"-T\d+ms", m.group(1)):
            return True
    return False


def infer_output_mode(df: DataFrame, sink_capability: str = RETRACT) -> str:
    """Choose the Spark output mode for a streaming frame + sink capability.

    Raises when the combination is unsatisfiable — mirroring Flink's
    TableException for updating results on an append sink
    (StreamTableEnvironment.writeToSink)."""
    if sink_capability not in (APPEND_ONLY, RETRACT, UPSERT):
        # a typo'd capability must not silently fall through to 'complete'
        # (review finding)
        raise ValueError(f"unknown sink capability {sink_capability!r}")
    if is_append_only(df):
        return "append"
    if sink_capability == APPEND_ONLY:
        raise ValueError(
            "query produces updates but the sink is append-only "
            "(Flink: AppendStreamTableSink cannot accept retractions)"
        )
    return "update"
