"""TPC-H Q3 — the reference's own relational example
(flink-examples-batch relational/TPCHQuery3.java): shipping-priority query.

Run: python examples/tpch_q3.py [sf_dir]   (default /root/testdata/sf0.001)
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.queries.tpch import tpch_q3
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    tpch_q3(get_spark(app_name="tpch-q3"), sf_dir).show(10)
