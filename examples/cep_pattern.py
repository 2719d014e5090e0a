"""CEP pattern matching — flink-libraries/flink-cep parity: a begin→next
funnel with a within-window over the events table (the engine's NFA
executor; see streaming/cep.py for the full 16-combinator DSL).

Run: python examples/cep_pattern.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.graph import cep_funnel
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    cep_funnel(get_spark(app_name="cep-pattern"), sf_dir).show(10)
