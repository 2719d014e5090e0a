"""CEP ``select(timeoutFn, selectFn)`` — the Either<L, R> overload
(flink-cep PatternStream.java:182; PatternTimeoutFunction.java:59) — plus
the late-data side output (PatternStream.java:496 sideOutputLateData).

A view→purchase funnel within 24 h: completed funnels carry the
PatternSelectFunction payload (value delta, dwell seconds), dead views the
PatternTimeoutFunction payload (the epoch-second deadline their window
closed at), one DataFrame tagged by ``timed_out`` with each side NULL-filled
on the other's columns. The second section shows the late-data helper over a
replay whose earliest dates arrive last: the rows the streaming kernel drops
as late come back as their own DataFrame.

Run: python examples/cep_timeout_select.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.graph import (
    cep_select_timeout_function,
)
from flink_1_6_0_spark.queries.lake import stream_cep_late_side
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="cep-timeout-select")

    out = cep_select_timeout_function(spark, sf_dir)
    out.orderBy("user_id", "view_id").show(10)
    out.groupBy("timed_out").count().show()

    late = stream_cep_late_side(spark, sf_dir)
    print(f"late-dropped rows recovered by the side output: {late.count()}")
    late.orderBy("user_id", "event_id").show(10)
