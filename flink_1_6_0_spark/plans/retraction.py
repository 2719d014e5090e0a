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
    aggregation over event-time windows bounded by a watermark."""
    if not df.isStreaming:
        return True
    has_agg = _plan_has(df, "Aggregate")
    has_watermark = _plan_has(df, "EventTimeWatermark")
    return not has_agg or has_watermark


def infer_output_mode(df: DataFrame, sink_capability: str = RETRACT) -> str:
    """Choose the Spark output mode for a streaming frame + sink capability.

    Raises when the combination is unsatisfiable — mirroring Flink's
    TableException for updating results on an append sink
    (StreamTableEnvironment.writeToSink)."""
    if is_append_only(df):
        return "append"
    if sink_capability == APPEND_ONLY:
        raise ValueError(
            "query produces updates but the sink is append-only "
            "(Flink: AppendStreamTableSink cannot accept retractions)"
        )
    return "update" if sink_capability in (RETRACT, UPSERT) else "complete"
