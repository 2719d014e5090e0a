"""PageRank — flink-examples-batch graph/PageRank.java (power iteration
with damping) on a small sample graph.

Run: python examples/page_rank.py
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.operators.graph import pagerank
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    spark = get_spark(app_name="page-rank")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 1), (3, 2)], "src long, dst long"
    )
    vertices = spark.range(4).selectExpr("id")
    pagerank(vertices, edges, iterations=10, damping=0.85).orderBy("id").show()
