"""Streaming OVER aggregates — SURVEY.md §2.6 (M3 build-plan row).

Reference: DataStreamOverAggregate.scala:45 with per-variant process
functions (ProcTimeUnboundedOver, RowTimeBoundedRowsOver, ...) — accumulators
live in keyed state, rows emit with the aggregate of everything up to the
row's position in time order.

Spark disallows window functions on streaming frames, so the operator runs
as ``applyInPandasWithState``: per key, state carries the running
accumulators (sum, count) across micro-batches; within a batch the rows are
processed in (ts, id) order — exactly RowTimeUnboundedOver's semantics under
in-order delivery (out-of-order rows across batches take the state as-of
arrival, the proc-time variant's behavior; document the difference).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def stream_running_agg(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Unbounded-preceding running sum/count per key over event order —
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW on a live stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = ", ".join(
        [f"{k} long" for k in key_cols]
        + [f"{id_col} long", "running_sum double", "running_n long"]
    )
    state_schema = "acc_sum double, acc_n long"

    def fn(key, pdfs, state):
        acc_sum, acc_n = (state.get if state.exists else (0.0, 0))
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        import numpy as np

        pdf = pd.concat(frames).sort_values([ts_col, id_col], kind="mergesort")
        out = pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "running_sum": (acc_sum + pdf[value_col].cumsum()).round(2).values,
                "running_n": acc_n + np.arange(1, len(pdf) + 1),
            }
        )
        for k, v in zip(key_cols, key):
            out[k] = v
        state.update((float(acc_sum + pdf[value_col].sum()), int(acc_n + len(pdf))))
        yield out[key_cols + [id_col, "running_sum", "running_n"]]

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
