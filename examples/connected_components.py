"""ConnectedComponents — flink-examples-batch graph/ConnectedComponents.java
(min-id label propagation to fixpoint) on a small sample graph.

Run: python examples/connected_components.py
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.operators.graph import connected_components
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark(app_name="connected-components")
    # two components: {0,1,2} and {3,4}
    edges = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "src long, dst long")
    vertices = spark.range(5).selectExpr("id")
    connected_components(vertices, edges).orderBy("id").show()
