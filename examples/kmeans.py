"""KMeans — flink-examples-batch clustering/KMeans.java, on pyspark.ml
(the FlinkML-parity substrate; see operators/ml.py and the trained-IVF
query ann_ivf_kmeans_topk for the engine's own uses).

Run: python examples/kmeans.py
"""

import sys

sys.path.insert(0, ".")
from flink_1_6_0_spark.session import get_spark

if __name__ == "__main__":
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import VectorAssembler

    spark = get_spark(app_name="kmeans")
    pts = spark.createDataFrame(
        [(0.0, 0.1), (0.2, 0.0), (5.0, 5.1), (5.2, 4.9), (9.0, 0.2), (9.1, 0.0)],
        "x double, y double",
    )
    feats = VectorAssembler(inputCols=["x", "y"], outputCol="features").transform(pts)
    model = KMeans(k=3, seed=42).fit(feats)
    model.transform(feats).select("x", "y", "prediction").show()
