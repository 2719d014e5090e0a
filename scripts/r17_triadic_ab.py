"""r17 task 3: A/B the triadic-census pair-code pin (eager vs lazy) with the
bench's own methodology at sf0.1 AND the x10 tier.

Usage: python scripts/r17_triadic_ab.py eager|lazy [--skip-sf1]
The variant is forced by stubbing operators.graph._checkpoint's eager flag
for the pairs call site — the code itself ships one variant; this script
only measures the other without editing the tree.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from flink_1_6_0_spark.registry import load_all
from flink_1_6_0_spark.session import get_spark


def _consume(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    variant = sys.argv[1]
    skip_sf1 = "--skip-sf1" in sys.argv
    assert variant in ("eager", "lazy")
    spark = get_spark(app_name=f"r17-triadic-{variant}")

    if variant == "lazy":
        import flink_1_6_0_spark.operators.graph as g

        orig = g._checkpoint

        def patched(df, mode="local", eager=True, **kw):
            # force the PAIRS pin lazy; the edge-frame pin is lazy already
            return orig(df, mode, eager=False, **kw)

        g._checkpoint = patched

    spec = load_all()["graph_triadic_census_directed"]
    out = {"variant": variant}

    # bench methodology: warm-up at sf0.001, 3 timed noop runs, median
    _consume(spec.fn(spark, "/root/testdata/sf0.001"))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _consume(spec.fn(spark, "/root/testdata/sf0.1"))
        samples.append(round(time.perf_counter() - t0, 3))
    out["sf0.1"] = {"median": statistics.median(samples), "runs": samples}

    if not skip_sf1:
        from flink_1_6_0_spark.sources.scale_synth import sf1_dir

        d1 = sf1_dir(spark)
        _consume(spec.fn(spark, d1))  # per-query warm-up, as bench's blocks do
        s1 = []
        for _ in range(2):
            t0 = time.perf_counter()
            _consume(spec.fn(spark, d1))
            s1.append(round(time.perf_counter() - t0, 3))
        out["sf1"] = {"median": statistics.median(s1), "runs": s1}

    print(json.dumps(out))


if __name__ == "__main__":
    main()
