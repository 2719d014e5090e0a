"""Benchmark harness — runs the headline (bench=True) registered queries.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default: all cores)

Prints ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion with a `noop` sink write — full plan
runs, nothing is collected to the driver (the 100 TB-honest way to measure).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from flink_1_6_0_spark.registry import load_all
from flink_1_6_0_spark.session import get_spark


def _consume(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    spark = get_spark(app_name="flink-1.6.0-spark-bench")
    specs = [s for s in load_all().values() if s.bench]

    # Warm-up pass at the smallest SF: compiles every query's codegen/plan once
    # so the timed runs measure steady-state execution, not first-run JIT.
    # (Expression-heavy queries pay multi-second one-time compilation that a
    # long-running cluster amortizes to zero — see SCALING.md.)
    warm_dir = "/root/testdata/sf0.001"
    for spec in specs:
        try:
            _consume(spec.fn(spark, warm_dir if os.path.isdir(warm_dir) else sf_dir))
        except Exception:
            pass

    timings: dict[str, float] = {}
    for spec in specs:
        t0 = time.perf_counter()
        try:
            _consume(spec.fn(spark, sf_dir))
            timings[spec.name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failing query must not sink the whole bench
            print(f"bench: {spec.name} FAILED: {exc}", file=sys.stderr)
            timings[spec.name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
