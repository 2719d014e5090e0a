"""TransitiveClosureNaive — flink-examples-batch graph/
TransitiveClosureNaive.java: all reachable pairs by iterative path extension.

Run: python examples/transitive_closure.py
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.operators.graph import transitive_closure
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark(app_name="transitive-closure")
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    transitive_closure(edges).orderBy("src", "dst").show()
