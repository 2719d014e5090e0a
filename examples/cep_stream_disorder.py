"""Streaming CEP under out-of-order delivery — the Flink watermark model
(flink-cep AbstractKeyedCEPPatternOperator: buffer in event-time order,
fold into the NFA as the watermark passes, drop late elements).

Runs a FIRST-MATCH view→click→purchase funnel over a deliberately scrambled
multi-micro-batch replay (2 dates per batch boundary arrive a whole batch
late), in watermark mode with the timeout side output enabled: completed
funnels print with timed_out=false, dead funnels print the stage they were
stuck on the moment the fold point passed their 24 h window.

Run: python examples/cep_stream_disorder.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.lake import (
    stream_multibatch_cep_timeout,
)
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = stream_multibatch_cep_timeout(get_spark(app_name="cep-disorder"), sf_dir)
    out.orderBy("user_id", "view_id").show(15)
    out.groupBy("timed_out", "pending_stage").count().show()
