"""Gelly graph generators — SURVEY.md §2.13.

Reference: flink-gelly org/apache/flink/graph/generator/ (CirculantGraph,
CompleteGraph, CycleGraph, EchoGraph, EmptyGraph, GridGraph, HypercubeGraph,
PathGraph, RMatGraph, SingletonEdgeGraph, StarGraph). Vertices are
0..n-1 longs; every undirected edge is emitted in BOTH directions, exactly
as the reference's flatMap emitters do.

Scale design: every generator is ``spark.range`` + Column arithmetic — the
edge set is never materialized on the driver, never relies on partition-local
RNG state, and parallelizes to any partition count. RMat uses a counter-based
hash in place of the reference's seeded RNG stream (RandomGenerableFactory):
same distribution family, but reproducible under any re-partitioning and
replayable by an external oracle — the right property for a 1000-executor
run (a sequential RNG stream is not).
"""

from __future__ import annotations

from math import prod

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def generated_vertices(spark: SparkSession, n: int) -> DataFrame:
    """Vertex set 0..n-1 (GraphGeneratorUtils.vertexSequence)."""
    return spark.range(n).select(F.col("id"))


def empty_graph(spark: SparkSession, n: int) -> DataFrame:
    """EmptyGraph.java: n vertices, no edges — empty frame, edge schema."""
    return spark.range(0).select(
        F.col("id").alias("src"), F.col("id").alias("dst")
    )


def grid_graph(spark: SparkSession, dimensions: list[tuple[int, bool]]) -> DataFrame:
    """GridGraph.java:115-160: lattice over the given (size, wrap) dims; the
    FIRST dimension is most significant (increment divides from the total,
    :131-137). Per vertex per dim: backward neighbor (or wrap to the far
    end) and forward neighbor (or wrap) — both directions emitted. Size-2
    dims force wrap off (:77-78, a wrap there would duplicate the edge).
    """
    if not dimensions:
        raise ValueError("grid_graph needs at least one dimension")
    dims = []
    for size, wrap in dimensions:
        if size < 2:
            raise ValueError("Dimension size must be at least 2")
        dims.append((size, bool(wrap) and size > 2))
    total = prod(s for s, _ in dims)
    v = spark.range(total)
    targets = []
    stride = total
    for size, wrap in dims:
        stride //= size
        idx = (F.col("id") / stride).cast("long") % size
        back = F.when(idx > 0, F.col("id") - stride)
        fwd = F.when(idx < size - 1, F.col("id") + stride)
        if wrap:
            back = back.otherwise(F.col("id") + stride * (size - 1))
            fwd = fwd.otherwise(F.col("id") - stride * (size - 1))
        targets.extend([back, fwd])
    return (
        v.select(F.col("id").alias("src"), F.explode(F.array(*targets)).alias("dst"))
        .filter(F.col("dst").isNotNull())
    )


def path_graph(spark: SparkSession, n: int) -> DataFrame:
    """PathGraph.java: one unwrapped grid dimension."""
    return grid_graph(spark, [(n, False)])


def cycle_graph(spark: SparkSession, n: int) -> DataFrame:
    """CycleGraph.java:57-63: one wrapped grid dimension."""
    return grid_graph(spark, [(n, True)])


def hypercube_graph(spark: SparkSession, d: int) -> DataFrame:
    """HypercubeGraph.java: d binary grid dimensions (neighbors differ in
    one bit)."""
    return grid_graph(spark, [(2, False)] * d)


def circulant_graph(
    spark: SparkSession, n: int, ranges: list[tuple[int, int]]
) -> DataFrame:
    """CirculantGraph.java:81-156: vertex u links to (u + offset) mod n for
    every offset in the configured (offset, length) ranges. Offsets live in
    [1, n-1] and the range must fit below n (addRange preconditions :82-85);
    an undirected graph requires the offset set to be complement-symmetric
    (offset ↔ n-offset), which Complete/Echo configurations guarantee.

    The offset table is broadcast against the vertex range — the edge count
    (n · Σ lengths) is the inherent output size, not a join blow-up."""
    if not ranges:
        raise ValueError("circulant_graph needs at least one offset range")
    offsets = None
    for offset, length in ranges:
        if offset < 1:
            raise ValueError("Range offset must be at least 1")
        if length > n - offset:
            raise ValueError(
                "Range length must not be greater than the vertex count minus the range offset"
            )
        part = spark.range(offset, offset + length).select(F.col("id").alias("off"))
        offsets = part if offsets is None else offsets.union(part)
    v = spark.range(n)
    return v.crossJoin(F.broadcast(offsets)).select(
        F.col("id").alias("src"), ((F.col("id") + F.col("off")) % n).alias("dst")
    )


def complete_graph(spark: SparkSession, n: int) -> DataFrame:
    """CompleteGraph.java: circulant with every offset 1..n-1."""
    return circulant_graph(spark, n, [(1, n - 1)])


def echo_graph(spark: SparkSession, n: int, vertex_degree: int) -> DataFrame:
    """EchoGraph.java:38-39: each vertex connects to the ``vertex_degree``
    vertices most distant on the cycle — circulant range starting at
    (n - d + 1) / 2. Exactly one of n, d must be even (precondition :28)."""
    if not ((n % 2 == 0) ^ (vertex_degree % 2 == 0)):
        raise ValueError("exactly one of vertex count and vertex degree must be even")
    return circulant_graph(spark, n, [((n - vertex_degree + 1) // 2, vertex_degree)])


def star_graph(spark: SparkSession, n: int) -> DataFrame:
    """StarGraph.java:88-104: center 0 ↔ each leaf, both directions."""
    leaves = spark.range(1, n)
    return leaves.select(F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")).union(
        leaves.select(F.col("id").alias("src"), F.lit(0).cast("long").alias("dst"))
    )


def singleton_edge_graph(spark: SparkSession, pairs: int) -> DataFrame:
    """SingletonEdgeGraph.java: ``pairs`` disjoint edges over 2·pairs
    vertices, both directions."""
    p = spark.range(pairs)
    a = (2 * F.col("id")).alias("src")
    b = (2 * F.col("id") + 1).alias("dst")
    return p.select(a, b).union(
        p.select((2 * F.col("id") + 1).alias("src"), (2 * F.col("id")).alias("dst"))
    )


# RMat quadrant thresholds live in exact 60-bit integer space so Spark and
# any SQL oracle compare the SAME integers — no float-boundary drift.
_HASH_BITS = 60


def _hash60(*cols) -> F.Column:
    """Engine-portable 60-bit hash (md5 hex prefix → bigint) — the repo-wide
    idiom, DuckDB-replayable as ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(F.concat_ws(":", *cols)), 1, 15), 16, 10).cast("long")


def rmat_graph(
    spark: SparkSession,
    scale: int,
    edge_count: int,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    noise_enabled: bool = False,
    noise: float = 0.10,
) -> DataFrame:
    """RMatGraph.java:49-55 (Graph500 defaults A=0.57, B=C=0.19, D=0.05,
    noise off): 2^scale vertices, ``edge_count`` edges drawn by recursive
    quadrant descent — per edge k and level ℓ one uniform draw picks the
    quadrant; the src/dst bits accumulate most-significant-first.

    The draw is the counter-based portable hash of (seed, k, ℓ) compared
    against exact integer thresholds ⌊cum·2⁶⁰⌋ — fully deterministic per
    (edge, level), independent of partitioning, and bit-replayable in SQL.
    Self-loops and duplicate edges are kept, as in the reference.

    ``noise_enabled`` (RMatGraph.setNoise:133, strength ∈ [0, 2]): after
    each level's draw, a/b/c/d are each scaled by (1 − noise/2 + u·noise)
    with four fresh hash draws and renormalized (GenerateEdges:243-249) —
    the per-edge parameter walk that de-correlates the quadrant fractal.
    The noise path folds a (a, b, c, d, x, y) struct across levels (same
    counter-hash determinism; float thresholds instead of integer ones)."""
    if not (0.0 <= noise <= 2.0):
        # validated eagerly regardless of the flag (RMatGraph.setNoise:134)
        raise ValueError("noise must be in [0, 2]")
    # a/b/c validated like the reference's setConstants (RMatGraph.java:117):
    # out-of-range values silently skewed or zeroed the d-quadrant before
    # (review finding); scale >= 1 because sequence(0, scale-1) at scale=0
    # descends to [0, -1] and emits vertex ids outside [0, 2^scale)
    if a < 0 or b < 0 or c < 0 or a + b + c > 1.0:
        raise ValueError(f"a, b, c must be non-negative with a+b+c <= 1 (got {a}, {b}, {c})")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    e = spark.range(edge_count).select(F.col("id").alias("k"))
    levels = F.sequence(F.lit(0), F.lit(scale - 1))

    def u(l, tag: str):
        return _hash60(
            F.lit(str(seed)), F.col("k").cast("string"), l.cast("string"), F.lit(tag)
        ).cast("double") / float(1 << _HASH_BITS)

    if not noise_enabled:
        t1 = int(a * (1 << _HASH_BITS))
        t2 = int((a + b) * (1 << _HASH_BITS))
        t3 = int((a + b + c) * (1 << _HASH_BITS))

        def bits(which: str):
            # level ℓ=0 first ⇒ most significant: fold acc·2 + bit, integers
            def per_level(l):
                h = _hash60(F.lit(str(seed)), F.col("k").cast("string"), l.cast("string"))
                if which == "src":
                    bit = F.when(h < t2, F.lit(0)).otherwise(F.lit(1))
                else:
                    bit = F.when((h < t1) | ((h >= t2) & (h < t3)), F.lit(0)).otherwise(F.lit(1))
                return bit.cast("long")

            return F.aggregate(
                F.transform(levels, per_level),
                F.lit(0).cast("long"),
                lambda acc, x: acc * 2 + x,
            )

        return e.select(bits("src").alias("src"), bits("dst").alias("dst"))

    def step(acc, l):
        av, bv, cv, dv = acc["a"], acc["b"], acc["c"], acc["d"]
        r = u(l, "q")
        xbit = F.when(r <= av + bv, F.lit(0)).otherwise(F.lit(1)).cast("long")
        ybit = (
            F.when((r <= av) | ((r > av + bv) & (r <= av + bv + cv)), F.lit(0))
            .otherwise(F.lit(1))
            .cast("long")
        )
        na = av * (1.0 - noise / 2 + u(l, "a") * noise)
        nb = bv * (1.0 - noise / 2 + u(l, "b") * noise)
        nc = cv * (1.0 - noise / 2 + u(l, "c") * noise)
        nd = dv * (1.0 - noise / 2 + u(l, "d") * noise)
        s = na + nb + nc + nd
        return F.struct(
            (na / s).alias("a"), (nb / s).alias("b"), (nc / s).alias("c"), (nd / s).alias("d"),
            (acc["x"] * 2 + xbit).alias("x"), (acc["y"] * 2 + ybit).alias("y"),
        )

    init = F.struct(
        F.lit(float(a)).alias("a"), F.lit(float(b)).alias("b"), F.lit(float(c)).alias("c"),
        F.lit(float(1.0 - a - b - c)).alias("d"),
        F.lit(0).cast("long").alias("x"), F.lit(0).cast("long").alias("y"),
    )
    folded = F.aggregate(levels, init, step)
    return e.select(folded["x"].alias("src"), folded["y"].alias("dst"))
