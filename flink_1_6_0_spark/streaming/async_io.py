"""Async I/O enrichment — SURVEY.md §2.11.

Reference: AsyncDataStream.orderedWait/unorderedWait
(flink-streaming-java/.../AsyncDataStream.java:102-168) +
AsyncWaitOperator.java:77 — per-record async requests against an external
service with bounded in-flight capacity and a timeout; ordered mode preserves
input order.

Spark mapping: ``mapInPandas`` hands the operator whole Arrow batches, so the
natural translation issues the batch's requests concurrently from a thread
pool and re-assembles results (ordered by construction — results are written
back positionally). Capacity = pool size; timeout via future.result(timeout).
The async client rides inside each partition task: N partitions × capacity
in-flight requests cluster-wide, same back-pressure model as the reference.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame


def async_enrich(
    df: DataFrame,
    fn: Callable,
    input_col: str,
    output_col: str,
    output_type: str = "string",
    capacity: int = 32,
    timeout_seconds: float | None = None,
) -> DataFrame:
    """orderedWait: apply ``fn(value)`` (a blocking client call) concurrently
    per batch with ``capacity`` in-flight requests; row order within each
    partition is preserved. A failed/timed-out request yields null (the
    reference's timeout handler default completes empty)."""
    schema = f"{', '.join(f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields)}, {output_col} {output_type}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # No `with` block: ThreadPoolExecutor.__exit__ is shutdown(wait=True),
        # which would block the partition task FOREVER on a hung fn even
        # after its future timed out. Python cannot kill a running thread, so
        # the honest contract is: timed-out futures are cancelled (drops them
        # if not yet started) and shutdown never waits — a hung request costs
        # one pool slot, not the whole batch.
        pool = ThreadPoolExecutor(max_workers=capacity)
        try:
            for pdf in batches:
                futures = [pool.submit(fn, v) for v in pdf[input_col]]
                results = []
                for fut in futures:
                    try:
                        results.append(fut.result(timeout=timeout_seconds))
                    except Exception:
                        fut.cancel()
                        results.append(None)
                out = pdf.copy()
                out[output_col] = results
                yield out
        finally:
            pool.shutdown(wait=False, cancel_futures=True)

    return df.mapInPandas(run, schema=schema)
