"""CEP iterative conditions — flink-cep IterativeCondition parity
(pattern/conditions/IterativeCondition.java:96 getEventsForPattern): a
value-dependent funnel where the purchase stage's predicate compares the
candidate against the PRIOR matched view via the two-arg
``where(lambda e, ctx: ...)`` form. Batch and streaming executors share the
semantics (the streaming twin opts ``value`` into the state buffer with
``attr_cols`` and runs the watermark mode under cross-batch disorder).

Run: python examples/cep_iterative_condition.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.graph import cep_iterative_funnel
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cep_iterative_funnel(get_spark(app_name="cep-iterative"), sf_dir).show(10)
