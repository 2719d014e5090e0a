"""Graph algorithms over vertex/edge DataFrames — SURVEY.md §2.13 (Gelly).

Reference: flink-libraries/flink-gelly — Graph<K,VV,EV> over vertex/edge
DataSets with vertex-centric / GSA iteration models; library algorithms
ConnectedComponents, PageRank (library/linkanalysis), TriangleEnumerator,
SingleSourceShortestPaths, LabelPropagation.

Spark mapping: a graph is a pair of DataFrames (vertices, edges); iterations
are driver-side loops of joins with ``localCheckpoint()`` every few rounds to
truncate the lineage (the analog of Flink's native iterate-with-feedback,
which Spark lacks — SURVEY.md §2.11 declares stream iterations out of
scope).

Scale notes: each superstep is one shuffle on vertex id (messages = edge
join), exactly Pregel's cost model. Convergence checks (`.count()` on the
changed set) are one cheap action per round; the checkpoint interval bounds
plan growth, which otherwise dominates at high iteration counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Make an edge list symmetric (Gelly Graph.getUndirected)."""
    return edges.select(src, dst).union(edges.select(F.col(dst).alias(src), F.col(src).alias(dst)))


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    max_iterations: int = 20,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Gelly ConnectedComponents (library/ConnectedComponents.java): iterative
    min-label propagation to a fixpoint. Returns (id, component)."""
    sym = undirect(edges).distinct()
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    for i in range(max_iterations):
        # neighbor-minimum per vertex, one shuffle
        msgs = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy(sym.src.alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(msgs, "id", "left")
            .select("id", F.least("component", F.coalesce("nbr_min", "component")).alias("component"))
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "id")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels = updated
        if i % checkpoint_interval == checkpoint_interval - 1:
            labels = labels.localCheckpoint()
        if changed == 0:
            break
    return labels


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Gelly PageRank (library/linkanalysis/PageRank.java): fixed-iteration
    power method, rank' = (1-d)/N + d·Σ rank/out_degree over in-edges.
    (No dangling-mass redistribution — matches the unrolled SQL oracle.)
    Returns (id, rank)."""
    n = vertices.count()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    ranks = vertices.select(F.col("id"), F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            edges.join(ranks, edges.src == ranks.id)
            .join(out_deg, edges.src == out_deg.id)
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = vertices.select("id").join(contribs, "id", "left").select(
            "id",
            (F.lit((1 - damping) / n) + damping * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
        )
        if i % checkpoint_interval == checkpoint_interval - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(edges: DataFrame) -> DataFrame:
    """Gelly TriangleEnumerator: count triangles via ordered two-hop join —
    edges oriented small→large id so each triangle is found exactly once.
    Returns a 1-row frame (n_triangles)."""
    e = (
        undirect(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def single_source_shortest_paths(
    vertices: DataFrame,
    edges: DataFrame,
    source_id,
    max_iterations: int = 10,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Gelly SingleSourceShortestPaths: Bellman-Ford supersteps over a
    weighted edge list (columns src, dst, weight). Returns (id, distance),
    unreachable vertices omitted."""
    dist = vertices.select(F.col("id")).withColumn(
        "distance", F.when(F.col("id") == source_id, F.lit(0.0))
    ).filter(F.col("distance").isNotNull())
    for i in range(max_iterations):
        relax = (
            edges.join(dist, edges.src == dist.id)
            .select(F.col("dst").alias("id"), (F.col("distance") + F.col("weight")).alias("d"))
            .groupBy("id")
            .agg(F.min("d").alias("d"))
        )
        updated = (
            dist.join(relax, "id", "full")
            .select("id", F.least(F.coalesce("distance", F.lit(float("inf"))), F.coalesce("d", F.lit(float("inf")))).alias("distance"))
        )
        changed = (
            updated.alias("u")
            .join(dist.alias("l"), "id", "left")
            .filter(F.col("l.distance").isNull() | (F.col("u.distance") < F.col("l.distance")))
            .count()
        )
        dist = updated
        if i % checkpoint_interval == checkpoint_interval - 1:
            dist = dist.localCheckpoint()
        if changed == 0:
            break
    return dist


def label_propagation(
    vertices: DataFrame,
    edges: DataFrame,
    label_col: str = "label",
    iterations: int = 5,
    checkpoint_interval: int = 3,
) -> DataFrame:
    """Gelly LabelPropagation (library/LabelPropagation.java): each superstep
    every vertex adopts the most frequent label among its neighbors (ties →
    smallest label, deterministic). Fixed iteration count like the reference.
    ``vertices`` carries (id, label); returns the same shape."""
    sym = undirect(edges).distinct()
    labels = vertices.select("id", F.col(label_col).alias("label"))
    for i in range(iterations):
        counts = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy(sym.src.alias("id"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        # most frequent neighbor label, ties by smallest label
        from pyspark.sql import Window as _W

        w = _W.partitionBy("id").orderBy(F.desc("cnt"), F.asc("label"))
        best = (
            counts.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", F.col("label").alias("new_label"))
        )
        labels = labels.join(best, "id", "left").select(
            "id", F.coalesce("new_label", "label").alias("label")
        )
        if i % checkpoint_interval == checkpoint_interval - 1:
            labels = labels.localCheckpoint()
    return labels
