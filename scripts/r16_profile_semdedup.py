"""r16: stage-by-stage profile of dedup_semantic_ml at sf0.1 (guide §1).

Times each stage of the query separately so the 6.8 s headline cost is
attributed: footer count, kmeans|| fit, assignment transform+materialize,
pair-step joins. Prints one JSON dict of stage seconds.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from flink_1_6_0_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r16-profile-semdedup")
    from flink_1_6_0_spark.queries import T
    from flink_1_6_0_spark.queries.pipeline import _semdedup_ml_assign_path
    from flink_1_6_0_spark.pipeline.similarity import _semantic_dedup_from_assigned

    out: dict[str, float] = {}

    # warm-up whole query once at sf0.001 (JIT)
    from flink_1_6_0_spark.registry import load_all
    spec = load_all()["dedup_semantic_ml"]
    t0 = time.perf_counter()
    spec.fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    out["whole_warm_sf0.001"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    out["whole_sf0.1"] = time.perf_counter() - t0

    # stage breakdown
    t0 = time.perf_counter()
    emb = T(spark, sf_dir, "embeddings")
    n = emb.count()
    out["count"] = time.perf_counter() - t0
    k = max(8, int(math.sqrt(n)))
    out["n"] = n
    out["k"] = k

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    t0 = time.perf_counter()
    v = F.col("embedding").cast("array<double>")
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    feat = emb.select(
        F.col("vec_id").alias("id"), v.alias("arr"), unit.alias("u")
    ).withColumn("features", array_to_vector(F.col("u")))
    out["feat_nparts"] = feat.rdd.getNumPartitions()
    out["feat_build"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    model = KMeans(k=k, seed=42, maxIter=20).fit(feat)
    out["fit"] = time.perf_counter() - t0
    out["fit_iters"] = model.summary.numIter if model.hasSummary else -1

    path = _semdedup_ml_assign_path(sf_dir)
    t0 = time.perf_counter()
    assigned = model.transform(feat).select(
        "id", "arr", F.col("prediction").cast("long").alias("cid")
    )
    assigned.write.mode("overwrite").parquet(path)
    out["materialize_write"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    assigned = spark.read.parquet(path)
    _semantic_dedup_from_assigned(assigned, "vec_id", 0.35).write.format(
        "noop"
    ).mode("overwrite").save()
    out["pair_step"] = time.perf_counter() - t0

    print(json.dumps({k2: (round(v2, 3) if isinstance(v2, float) else v2) for k2, v2 in out.items()}, indent=1))


if __name__ == "__main__":
    main()
