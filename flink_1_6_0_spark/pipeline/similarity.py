"""Similarity search over embedding columns (engine extension).

- brute-force cosine top-k: the exact baseline; one scan, no shuffle until
  the final top-k (TakeOrderedAndProject — k·partitions rows to the driver).
- LSH-bucketed ANN: random-hyperplane signatures (Charikar '02) narrow the
  search to matching buckets — the 100 TB path; probes multiple tables to
  trade recall for cost.

Hyperplanes are generated deterministically (seeded numpy) and shipped as
literal arrays — broadcast-sized (tables × bits × dim doubles), no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_1_6_0_spark.pipeline.dedup import cosine


def cosine_topk(df: DataFrame, id_col: str, vec_col: str, query_vec: list[float], k: int) -> DataFrame:
    """Exact top-k by cosine against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim))


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id: bit j = 1 iff plane_j · v > 0."""
    sig = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec_col, lit_plane, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )
        sig = sig + F.when(dot > 0, F.lit(2**j).cast("long")).otherwise(F.lit(0))
    return sig


def lsh_ann_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: score only vectors whose LSH bucket matches the query's.

    At 100 TB: signatures are computed in the scan projection; the bucket
    filter prunes before any wide exchange. Recall < 1 by construction —
    raise `bits` tables / probe neighboring buckets for higher recall (the
    exact kernel cosine_topk is the correctness oracle).
    """
    dim = len(query_vec)
    planes = hyperplanes(dim, bits, seed)
    qsig = int(sum((1 << j) for j, p in enumerate(planes) if float(np.dot(p, query_vec)) > 0))
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("__sig", lsh_signature(v, planes))
        .filter(F.col("__sig") == qsig)
        .select(F.col(id_col), F.round(cosine(v, q), 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
