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


def _query_signature(planes: np.ndarray, query_vec) -> int:
    """Driver-side signature of the query vector, accumulated in the SAME
    left-to-right double order as ``lsh_signature``'s F.aggregate — np.dot's
    pairwise/SIMD summation can flip the sign of a near-zero plane product,
    bucketing a corpus vector IDENTICAL to the query differently from the
    query itself (review finding)."""
    sig = 0
    for j, plane in enumerate(planes):
        acc = 0.0
        for p, q in zip(plane, query_vec):
            acc += float(p) * float(q)
        if acc > 0:
            sig += 1 << j
    return sig


def ivf_assignments(df: DataFrame, id_col: str, vec_col: str, centroid_stride: int = 64) -> DataFrame:
    """IVF coarse quantizer, deterministic flavor: centroids are the vectors
    whose id is divisible by ``centroid_stride`` (a seeded k-means would work
    identically downstream; determinism keeps the oracle exact). Each vector
    is assigned to its nearest centroid by cosine.

    Plan shape: vectors × centroids is a broadcast nested-loop against a
    tiny broadcast centroid set (n/stride rows), then a per-vector argmax —
    one pass, no O(n²). Returns (id, centroid_id, score_to_centroid).
    """
    c = df.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vv"))
    scored = v.crossJoin(F.broadcast(c)).select(
        "id", "centroid_id", F.round(cosine(F.col("vv"), F.col("cv")), 6).alias("cscore")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy(F.desc("cscore"), F.asc("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "centroid_id", "cscore")
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    centroid_stride: int = 64,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` centroids nearest the query and
    scan only vectors assigned to them — the inverted-file scale path
    (candidate set ≈ nprobe/n_centroids of the data). Recall < 1 by
    construction; cosine_topk is the exact baseline."""
    assign = ivf_assignments(df, id_col, vec_col, centroid_stride)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    centroids = df.filter(F.col(id_col) % centroid_stride == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    probed = (
        centroids.select("centroid_id", F.round(cosine(F.col("cv"), q), 6).alias("qs"))
        .orderBy(F.desc("qs"), F.asc("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    candidates = assign.join(F.broadcast(probed), "centroid_id").select("id")
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vv"))
    return (
        candidates.join(vecs, "id")
        .select("id", F.round(cosine(F.col("vv"), q), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .withColumnRenamed("id", "vec_id")
    )


def embedding_near_dup_pairs_bucketed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    dim: int,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via sign-LSH bucketing + exact in-bucket cosine — the
    100 TB form of ``dedup.embedding_near_dup_pairs``.

    Plan shape: one scan computes the signature in the projection; the self
    join is an EQUI-join on the signature (hash exchange on sig — never a
    BroadcastNestedLoop/CartesianProduct over the full table); the exact
    cosine runs only on in-bucket pairs. Recall < 1 by construction
    (sign-LSH collision prob = (1-θ/π)^bits); raise recall at scale with
    more OR-ed tables (union of per-seed pair sets) rather than fewer bits.
    Skewed buckets split by AQE skew-join.

    Reference anchor: this replaces the reference's exact pairwise kernel;
    the global-exact form remains in dedup.embedding_near_dup_pairs as the
    test-only correctness baseline.
    """
    planes = hyperplanes(dim, bits, seed)
    v = F.col(vec_col).cast("array<double>")
    s = df.select(
        F.col(id_col).alias("id"), v.alias("v"), lsh_signature(v, planes).alias("sig")
    )
    a = s.select(F.col("id").alias("a"), F.col("v").alias("va"), "sig")
    b = s.select(F.col("id").alias("b"), F.col("v").alias("vb"), "sig")
    return (
        a.join(b, "sig")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )


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
    qsig = _query_signature(planes, query_vec)
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("__sig", lsh_signature(v, planes))
        .filter(F.col("__sig") == qsig)
        .select(F.col(id_col), F.round(cosine(v, q), 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def _topk_per_qid(scored: DataFrame, k: int, salt: int = 32) -> DataFrame:
    """Two-phase salted top-k per query id over (qid, id, score) rows.

    A single window partitioned by qid is the textbook skew trap: every
    scored corpus row for one query lands on one task. Phase 1 takes a local
    top-k inside (qid, id % salt) — ``salt`` bounded sorts that keep all
    cores busy; phase 2 ranks only salt·k survivors per qid. Deterministic
    ties: (score DESC, id ASC) in both phases, so the salting is invisible
    in the result."""
    from pyspark.sql import Window

    w1 = Window.partitionBy("qid", F.pmod(F.col("id"), F.lit(salt))).orderBy(
        F.desc("score"), F.asc("id")
    )
    local = scored.withColumn("__rn", F.row_number().over(w1)).filter(F.col("__rn") <= k)
    w2 = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("id"))
    return (
        local.drop("__rn")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
    )


def topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int,
    salt: int = 32,
) -> DataFrame:
    """Exact cosine top-k for EVERY query point (the batch form of
    cosine_topk): broadcast the query set, score in the scan projection,
    salted two-phase per-qid top-k. Returns (qid, id, score, rank)."""
    c = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qvec_col).cast("array<double>").alias("qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "id", F.round(cosine(F.col("v"), F.col("qv")), 4).alias("score")
    )
    return _topk_per_qid(scored, k, salt)


def lsh_topk_per_query(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    salt: int = 32,
) -> DataFrame:
    """Sign-LSH ANN top-k for every query point: both sides get the same
    deterministic signature; candidates meet on a sig equi-join (the query
    side broadcasts), so only in-bucket vectors are ever scored."""
    planes = hyperplanes(dim, bits, seed)
    c = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("sig", lsh_signature(F.col("v"), planes))
    q = queries.select(
        F.col(qid_col).alias("qid"), F.col(qvec_col).cast("array<double>").alias("qv")
    ).withColumn("sig", lsh_signature(F.col("qv"), planes))
    scored = c.join(F.broadcast(q), "sig").select(
        "qid", "id", F.round(cosine(F.col("v"), F.col("qv")), 4).alias("score")
    )
    return _topk_per_qid(scored, k, salt)


def ann_recall_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    k: int = 10,
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Recall@k of the sign-LSH index against the exact scan, per query —
    the measurement every ANN deployment runs before trusting the index
    (and re-runs as the corpus drifts). Both sides are deterministic, so
    the recall numbers themselves are oracle-checkable. Returns
    (qid, n_exact, n_hit, recall) with recall = n_hit / n_exact — the
    denominator is the EXACT result size, so a perfect index scores 1.0
    even when the corpus holds fewer than k vectors."""
    exact = topk_per_query(corpus, queries, id_col, vec_col, qid_col, qvec_col, k)
    approx = lsh_topk_per_query(
        corpus, queries, id_col, vec_col, qid_col, qvec_col, k, dim, bits, seed
    )
    hits = (
        exact.select("qid", "id")
        .join(approx.select("qid", "id"), ["qid", "id"])
        .groupBy("qid")
        .agg(F.count("*").alias("n_hit"))
    )
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    return (
        base.join(hits, "qid", "left")
        .select(
            "qid",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_exact"), 4).alias("recall"),
        )
    )


def l2_norm(vec_col: Column) -> Column:
    """Euclidean norm of an array column — F.aggregate dot product, JVM-side."""
    v = vec_col.cast("array<double>")
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def normalize_embeddings(
    df: DataFrame, id_col: str, vec_col: str, min_norm: float = 1e-6
) -> DataFrame:
    """Embedding hygiene for similarity pipelines: drop degenerate (near-zero
    norm) vectors, emit unit-normalized embeddings + the original norm.

    One scan, pure array expressions — the cleanup pass every ANN/dedup
    pipeline runs before indexing; at 100 TB it matters that this never
    leaves the scan projection (no UDF, no shuffle)."""
    v = F.col(vec_col).cast("array<double>")
    n = l2_norm(F.col(vec_col))
    return (
        df.select(F.col(id_col), v.alias(vec_col), n.alias("norm"))
        .filter(F.col("norm") > min_norm)
        .select(
            id_col,
            F.transform(F.col(vec_col), lambda x: x / F.col("norm")).alias("unit"),
            "norm",
        )
    )


def gram_matrix(df: DataFrame, vec_col: str, dim: int) -> np.ndarray:
    """Distributed Gram matrix XᵀX of an embedding column.

    The MLlib RowMatrix pattern: each Arrow batch contributes a dim×dim
    partial Gram (numpy, vectorized) emitted as dim² (index, value) rows —
    partitions × dim² tiny rows, summed engine-side, dim² doubles collected.
    Driver memory is bounded by the DIMENSION squared, never by row count —
    the only all-reduce a 100 TB PCA needs."""
    import pandas as pd
    import pyspark.sql.functions as _F

    idx = np.arange(dim * dim)

    def partial(batches):
        acc = np.zeros((dim, dim))
        for pdf in batches:
            X = np.array([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            if len(X):
                acc += X.T @ X
        yield pd.DataFrame({"ij": idx, "v": acc.ravel()})

    flat = (
        df.select(vec_col)
        .mapInPandas(partial, schema="ij long, v double")
        .groupBy("ij")
        .agg(_F.sum("v").alias("v"))
        .collect()
    )
    g = np.zeros(dim * dim)
    for r in flat:
        g[r["ij"]] = r["v"]
    return g.reshape(dim, dim)


def pca_components(df: DataFrame, vec_col: str, dim: int, k: int = 2):
    """Top-k principal components of an embedding column.

    Mean vector + count via plain JVM aggregates (dim avg expressions);
    covariance assembled on the driver from the distributed Gram
    (C = (G − n·μμᵀ)/(n−1), a dim×dim matrix); eigendecomposition is
    driver-side numpy on that tiny matrix (the standard big-data PCA split:
    the DATA never leaves the cluster, only dim²+dim floats do). Components
    are sign-fixed (largest-|entry| positive) so results are reproducible.
    Returns (mean, components[k, dim], eigenvalues[k])."""
    v = F.col(vec_col).cast("array<double>")
    row = df.select(v.alias("v")).agg(
        F.count("*").alias("n"),
        *[F.avg(F.element_at(F.col("v"), i + 1)).alias(f"m{i}") for i in range(dim)],
    ).first()
    n = row["n"]
    mean = np.array([row[f"m{i}"] for i in range(dim)])
    g = gram_matrix(df, vec_col, dim)
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    for i in range(len(comps)):  # deterministic sign
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i][j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals[order]


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 2
) -> DataFrame:
    """Project every embedding onto the top-k principal components —
    (id, pc1..pck). The projection itself is pure Column math over the
    broadcast component literals (one scan, no shuffle, no Python):
    pc_i = (v − μ)·c_i computed as v·c_i − μ·c_i with the scalar μ·c_i
    folded into the literal."""
    mean, comps, _ = pca_components(df, vec_col, dim, k)
    v = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for i, c in enumerate(comps):
        lit_c = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(v, lit_c, lambda x, y: x * y), F.lit(0.0), lambda s, t: s + t
        )
        cols.append(F.round(dot - F.lit(float(mean @ c)), 4).alias(f"pc{i + 1}"))
    return df.select(*cols)


#: Fixed-point PCA quantization grid: embeddings quantize to 1/PCA_QX,
#: iterate vectors to 1/PCA_QW. Shared by the Spark path and the DuckDB
#: oracle generator (queries/pipeline.py) — change together or hashes split.
PCA_QX = 10**4
PCA_QW = 10**6
PCA_ITERS = 16


def _int_moments(df: DataFrame, vec_col: str, dim: int, qx: int):
    """Exact integer first/second moments of the quantized embeddings in ONE
    distributed pass: x = floor(v·qx + 0.5) per element, then n, S_i = Σx_i,
    G_ij = Σx_i·x_j as BIGINT sums (order-independent — the float-sum
    nondeterminism that kept PCA rows-only lives exactly here). Same
    MLlib-RowMatrix shape as :func:`gram_matrix`: dim²+dim+1 (index, value)
    rows per partition, summed engine-side; driver traffic is dim², never n.
    int64 is safe: |x| ≤ qx, per-batch partial ≤ qx²·batch_rows ≪ 2⁶³."""
    import pandas as pd
    import pyspark.sql.functions as _F

    idx = np.arange(dim * dim + dim + 1)

    def partial(batches):
        g = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            V = np.array([np.asarray(v, dtype=float) for v in pdf[vec_col]])
            if len(V):
                X = np.floor(V * qx + 0.5).astype(np.int64)
                g += X.T @ X
                s += X.sum(axis=0)
                n += len(X)
        yield pd.DataFrame({"ij": idx, "v": np.concatenate([g.ravel(), s, [n]])})

    flat = (
        df.select(vec_col)
        .mapInPandas(partial, schema="ij long, v long")
        .groupBy("ij")
        .agg(_F.sum("v").alias("v"))
        .collect()
    )
    acc = np.zeros(dim * dim + dim + 1, dtype=np.int64)
    for r in flat:
        acc[r["ij"]] = r["v"]
    G = [[int(acc[i * dim + j]) for j in range(dim)] for i in range(dim)]
    S = [int(acc[dim * dim + i]) for i in range(dim)]
    return int(acc[-1]), S, G


def _power_iterate(M, qw: int, iters: int, deflate=None):
    """Deterministic fixed-point power iteration on an INTEGER matrix M
    (python ints — arbitrary precision, no overflow): L∞-renormalize to the
    qw grid each step via correctly-rounded IEEE double ops only
    (float(int) casts, one divide, one multiply, floor(x+0.5)) — the exact
    op sequence the DuckDB oracle replays, so both engines produce the SAME
    integer vector bit-for-bit. ``deflate`` projects a prior component out
    of every iterate (deflation for pc2+); sign-fixed like
    :func:`pca_components` (largest-|entry| positive, first index wins)."""
    import math

    d = len(M)
    w = [qw] * d
    for _ in range(iters):
        y = [sum(M[i][j] * w[j] for j in range(d)) for i in range(d)]
        if deflate is not None:
            v = deflate
            dot = sum(y[j] * v[j] for j in range(d))
            den = sum(v[j] * v[j] for j in range(d))
            y = [y[i] - math.floor(float(dot * v[i]) / float(den) + 0.5) for i in range(d)]
        ym = max(abs(t) for t in y)
        w = [math.floor(qw * (float(y[i]) / float(ym)) + 0.5) for i in range(d)]
    j = max(range(d), key=lambda i: (abs(w[i]), -i))
    if w[j] < 0:
        w = [-x for x in w]
    return w


def pca_project_power(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 2,
    qx: int = PCA_QX,
    qw: int = PCA_QW,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Hash-checkable distributed PCA (round-11 verdict task 6 — the
    exact-GD/exact-Lloyd recipe applied a third time): every
    order-dependent float reduction is replaced by an exact BIGINT sum, and
    the eigensolver by :func:`_power_iterate`'s fixed-point deflated power
    iteration, so the whole computation is a pure deterministic function of
    the data that a DuckDB CTE chain replays bit-for-bit.

    Declared semantics: the components are the ``iters``-step quantized
    power-iteration directions of the (scaled) covariance n·G − SSᵀ — equal
    to the eigh components whenever the spectrum has a real gap; on
    near-degenerate spectra (isotropic-ish embeddings) they are a
    deterministic orthogonal basis of the top eigenspace region (Rayleigh
    quotient within ~2% of λ₁/λ₂ on TESTDATA). :func:`pca_project` (eigh)
    stays the production path; this is the oracle-checkable twin.

    Scale shape: one mapInPandas pass for the integer moments (driver
    bounded by dim²), driver-side iteration on the dim×dim integer matrix,
    then projection as pure Column math over broadcast literals — identical
    dataflow to :func:`pca_project`."""
    n, S, G = _int_moments(df, vec_col, dim, qx)
    M = [[n * G[i][j] - S[i] * S[j] for j in range(dim)] for i in range(dim)]
    comps = []
    for _ in range(k):
        comps.append(_power_iterate(M, qw, iters, deflate=comps[-1] if comps else None))
    v = F.col(vec_col).cast("array<double>")
    x = F.transform(v, lambda e: F.floor(e * F.lit(float(qx)) + F.lit(0.5)).cast("long"))
    cols = [F.col(id_col)]
    for ci, w in enumerate(comps):
        lit_w = F.array(*[F.lit(int(c)).cast("long") for c in w])
        # per-row dot product is EXACT integer math (|x|·|w|·dim ≪ 2⁶³);
        # float enters only in the final centered, descaled rounding
        p = F.aggregate(
            F.zip_with(x, lit_w, lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )
        offset = float(sum(s * c for s, c in zip(S, w))) / float(n)
        # descale to the L2-UNIT component: w is L∞-normalized to the qw
        # grid, so the divisor is qx·‖w‖₂ (‖w‖₂² is an exact int; the sqrt
        # and multiply are single correctly-rounded IEEE ops the oracle
        # replays identically)
        import math as _math

        scale = float(qx) * _math.sqrt(float(sum(c * c for c in w)))
        cols.append(
            F.round(
                (p.cast("double") - F.lit(offset)) / F.lit(scale), 6
            ).alias(f"pc{ci + 1}")
        )
    return df.select(*cols)


def lsh_multitable_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    bits: int = 8,
    tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Multi-table sign-LSH ANN top-k: ``tables`` independent hash tables
    (seeds seed..seed+T-1) OR-ed together — the standard recall lever
    (P[miss] = (1-p)^T instead of 1-p) without touching the per-table
    precision.

    Scale shape: all T signatures are computed in the SAME scan projection
    and the candidate test is one OR of T equality predicates — no explode,
    no union (a T-branch union would re-scan the corpus T times), no extra
    exchange; exact cosine runs only on rows that match at least one table.
    ``cosine_topk`` is the exact baseline; recall is measurable with
    ``ann_recall_at_k``'s machinery."""
    dim = len(query_vec)
    v = F.col(vec_col).cast("array<double>")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cond = F.lit(False)
    for t in range(tables):
        planes = hyperplanes(dim, bits, seed + t)
        qsig = _query_signature(planes, query_vec)
        cond = cond | (lsh_signature(v, planes) == qsig)
    return (
        df.filter(cond)
        .select(F.col(id_col), F.round(cosine(v, q), 4).alias("score"))
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivf_kmeans_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    n_centroids: int = 8,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF ANN with TRAINED centroids (pyspark.ml KMeans, seeded) instead of
    ivf_topk's deterministic stride picks — the production coarse quantizer.

    Metric alignment (review finding): candidates are RANKED by cosine, so
    the quantizer trains, assigns, and probes on L2-NORMALIZED vectors —
    on the unit sphere Euclidean order ≡ cosine order (spherical k-means),
    whereas Euclid over raw magnitudes can put the cosine-nearest vectors
    in never-probed cells. Exact scores still compute on the RAW vectors
    (cosine is scale-invariant). Zero-norm vectors keep their raw form for
    assignment (their cosine is NULL and they never rank anyway).

    Scale: KMeans fit is Lloyd's over the (distributed) vectors with
    dataset-size-bounded passes; the centroid table (n_centroids × dim) and
    the probed centroid ids broadcast; the candidate scan touches
    ~nprobe/n_centroids of the data."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    unit = F.when(norm > 0, F.transform(v, lambda x: x / norm)).otherwise(v)
    feat = df.select(F.col(id_col).alias("id"), v.alias("arr"), unit.alias("u")).withColumn(
        "features", array_to_vector(F.col("u"))
    )
    # r16 (guide §5, measured on the semdedup twin of this pipeline):
    # KMeans.fit re-executes the input lineage per Lloyd/init job; persist
    # for the fit window (bit-identical centers — same values, same
    # partition order), release right after so repeated ANN sweeps don't
    # accumulate cache. The final candidate scan recomputes the lineage
    # once, exactly as before.
    feat = feat.persist()
    try:
        model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feat)
    finally:
        feat.unpersist()
    assigned = model.transform(feat).select("id", "arr", F.col("prediction").alias("cid"))
    centers = model.clusterCenters()
    q = np.asarray(query_vec, dtype=float)
    qn = float(np.linalg.norm(q))
    if qn > 0:
        q = q / qn
    probed = sorted(
        range(len(centers)), key=lambda i: (float(np.linalg.norm(centers[i] - q)), i)
    )[:nprobe]
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("cid").isin(probed))
        .select("id", F.round(cosine(F.col("arr"), qcol), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
        .withColumnRenamed("id", "vec_id")
    )


# Exact-deterministic Lloyd quantizer (ivf_kmeans_topk's oracle-checkable
# twin). The constants are a contract shared with the DuckDB oracle
# (queries/pipeline._ivf_lloyd_oracle_sql) — change them together.
KMEANS_VEC_QUANT = 1_000_000.0  # unit-vector fixed point: 6 decimal places
KMEANS_SCORE_QUANT = 100_000.0  # assignment-score fixed point: 5 places
KMEANS_ITERS = 3


def _exact_unit_quant(vec: "list[float]", quant: float = KMEANS_VEC_QUANT) -> list[int]:
    """Driver-side mirror of the uq column: L2-normalize then fix-point."""
    import math as _math

    nrm = _math.sqrt(sum(x * x for x in vec))
    u = [x / nrm for x in vec] if nrm > 0 else list(vec)
    return [int(_math.floor(x * quant + 0.5)) for x in u]


def _qscore(qu: "list[float]", c: "list[float]", quant: float = KMEANS_SCORE_QUANT) -> int:
    """Driver-side mirror of the quantized assignment score
    floor((u·c - 0.5*|c|²) * quant + 0.5): argmin L2 distance on the unit
    sphere, expressed so both engines compare identical BIGINTs."""
    import math as _math

    dot = 0.0
    for x, y in zip(qu, c):
        dot = dot + x * y
    nsq = 0.0
    for y in c:
        nsq = nsq + y * y
    return int(_math.floor((dot - 0.5 * nsq) * quant + 0.5))


def _lloyd_base(df: DataFrame, id_col: str, vec_col: str, fq: int) -> DataFrame:
    """(id, arr, uq) projection shared by the exact-Lloyd consumers: raw
    double vector plus the fixed-point quantized unit vector the clustering
    runs on (see ivf_kmeans_exact_topk's determinism docstring)."""
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    u = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
    uq = F.transform(u, lambda x: F.floor(x * F.lit(fq) + F.lit(0.5)))
    return df.select(F.col(id_col).alias("id"), v.alias("arr"), uq.alias("uq"))


def _exact_lloyd(base: DataFrame, dim: int, n_centroids: int, iters: int, fq: int, sq: int):
    """The exact-deterministic distributed Lloyd loop over a
    :func:`_lloyd_base` frame — returns (centroids, best_cid) where
    ``best_cid()`` is the final-assignment Column. Shared by
    ivf_kmeans_exact_topk and semantic_dedup; the DuckDB oracle unrolls the
    identical op sequence (queries/pipeline._ivf_lloyd_oracle_sql)."""
    init_rows = base.orderBy("id").limit(n_centroids).collect()
    centroids = [[q / fq for q in r["uq"]] for r in init_rows]

    def best_cid_for(cents) -> Column:
        ue = F.transform(F.col("uq"), lambda q: q / F.lit(fq))
        entries = []
        for cid, c in enumerate(cents):
            clit = F.array(*[F.lit(float(x)) for x in c])
            dot = F.aggregate(
                F.zip_with(ue, clit, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
            )
            nsq = 0.0
            for y in c:
                nsq = nsq + y * y
            qs = F.floor((dot - F.lit(0.5) * F.lit(nsq)) * F.lit(sq) + F.lit(0.5))
            entries.append(F.struct(qs.alias("s"), F.lit(-cid).alias("nc")))
        # array_max orders by (s, nc): max score, ties -> max nc = MIN cid
        return -F.array_max(F.array(*entries)).getField("nc")

    for _ in range(iters):
        sums = base.withColumn("cid", best_cid_for(centroids)).groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(F.element_at("uq", d + 1)).alias(f"s{d}") for d in range(dim)],
        )
        got = {r["cid"]: r for r in sums.collect()}
        centroids = [
            [(got[cid][f"s{d}"] / fq) / got[cid]["n"] for d in range(dim)]
            if cid in got
            else centroids[cid]  # empty cluster keeps its centroid
            for cid in range(n_centroids)
        ]

    final = list(centroids)
    return final, (lambda: best_cid_for(final))


def _semantic_dedup_from_assigned(assigned: DataFrame, id_col: str, tau: float) -> DataFrame:
    """SemDeDup's pair step over an (id, arr, cid) assignment frame: the
    within-cluster rounded-cosine pair rule shared by both assigners.

    r16 (guide §2.3/§1.2 — don't recompute per pair what is a per-row
    value): the join residual previously evaluated the FULL cosine per
    candidate pair, recomputing both vectors' norms each time —
    O(pairs·dim) interpreted higher-order-function work where O(rows·dim)
    suffices. The L2 norm is hoisted into a per-row projection below the
    self-join; the residual is then one dot product plus a divide. The
    float operations and their order are IDENTICAL to ``cosine()``
    (dot / (sqrt(Σa²)·sqrt(Σb²)), same fold order), so every pair score is
    bit-identical — r16 plan diff: the BroadcastHashJoin residual shrinks
    from 3 aggregate() folds to 1."""
    nrm = F.sqrt(
        F.aggregate(
            F.transform(F.col("arr"), lambda x: x * x), F.lit(0.0), lambda s, v: s + v
        )
    )
    an = assigned.withColumn("__nrm", nrm)
    a, b = an.alias("a"), an.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.arr"), F.col("b.arr"), lambda x, y: x * y),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    pair_cos = F.try_divide(dot, F.col("a.__nrm") * F.col("b.__nrm"))
    dup_ids = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid")) & (F.col("b.id") < F.col("a.id")),
        )
        .filter(F.round(pair_cos, 6) >= tau)
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dup_ids.withColumn("__dup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            "cid",
            F.when(F.col("__dup").isNull(), 1).otherwise(0).alias("kept"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    dim: int,
    n_centroids: int = 8,
    iters: int = KMEANS_ITERS,
    assigner: str = "exact",
    seed: int = 42,
    materialize_assignment: str | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embeddings, then flag semantic duplicates by pairwise cosine WITHIN each
    cluster only — the clustering is what bounds the quadratic (n²/k per
    cluster instead of n²). Deterministic keep rule: a vector is a duplicate
    iff some LOWER-id member of its cluster has round(cos, 6) >= tau (the
    paper keeps one representative per above-threshold group; lowest-id is
    the reproducible choice of representative). Returns (id, cid, kept
    0/1).

    ``assigner`` picks the clustering engine:

    - ``"exact"`` (default): the exact-deterministic distributed Lloyd loop
      (see _exact_lloyd) — every centroid bit-identical on any engine, so
      the WHOLE run value-hash-checks against a DuckDB oracle. Its assigner
      is O(n·k·dim) Column structs — fine for the correctness gate, not the
      production hot path.
    - ``"ml"``: pyspark.ml KMeans (kmeans|| init, seeded) trained on the
      L2-normalized vectors (spherical k-means — Euclid order ≡ cosine
      order on the unit sphere, the same metric alignment as
      ivf_kmeans_topk) — the production/bench path: assignment is a single
      vectorized model.transform pass, centroids converge in fewer passes,
      no per-centroid Column fanout. Cross-engine hash-checking of the
      CLUSTERING is impossible (kmeans|| float folds aren't SQL-derivable);
      agreement with the exact twin on gapped clusters is pytest-pinned.
      With ``materialize_assignment`` set, the learned (id, arr, cid) table
      is written to parquet and reread, so the pair/canonical step — pure
      SQL downstream of the assignment — IS value-hash-checkable by an
      oracle that reads the same table (r14 verdict task 2).

    Scale: the Lloyd step is bytes-per-task (see _exact_lloyd) or a
    pyspark.ml fit; the pair step is an equi-self-join on cid — never a
    cartesian; cluster count is the knob that trades dedup recall against
    pair volume (the SemDeDup design point)."""
    if assigner == "ml":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        v = F.col(vec_col).cast("array<double>")
        nrm = F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
        )
        unit = F.when(nrm > 0, F.transform(v, lambda x: x / nrm)).otherwise(v)
        feat = df.select(F.col(id_col).alias("id"), v.alias("arr"), unit.alias("u")).withColumn(
            "features", array_to_vector(F.col("u"))
        )
        # r16 (guide §5, measured): KMeans.fit re-executes the INPUT lineage
        # (parquet scan + norm/vector transforms) on every one of its ~20+
        # sequential Lloyd/init jobs — pyspark.ml's internal handlePersistence
        # caches an RDD derived AFTER that lineage runs, not the DataFrame
        # pipeline itself. Persisting the feature frame for the fit+transform
        # window halves the fit wall-clock (5.2 s → 2.7 s at sf0.1) with
        # BIT-IDENTICAL centers and assignments (same values, same partition
        # order — verified empirically; persist does not reorder rows).
        feat = feat.persist()
        try:
            model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(feat)
            assigned = model.transform(feat).select(
                "id", "arr", F.col("prediction").cast("long").alias("cid")
            )
            # localCheckpoint: the assignment is read three times by the
            # pair step (both self-join sides + the final flag join) —
            # materialize it once to executor storage with truncated
            # lineage; the ContextCleaner reclaims the blocks when the
            # frame is unreferenced.
            assigned = assigned.localCheckpoint(eager=True)
            if materialize_assignment is not None:
                # r15 (r14 verdict task 2): persist the learned assignment as
                # a parquet table so an external oracle can read the same
                # (id, arr, cid) rows — the clustering itself can't be
                # SQL-oracled (kmeans|| float folds), but everything
                # downstream of the assignment is pure SQL, so the whole
                # pair/canonical step is value-hash-checkable against it.
                # r17 (r16 verdict task 8): the pair step now reads the
                # PINNED frame instead of rereading the parquet — the write
                # serializes exactly the pinned rows (parquet roundtrips
                # doubles/longs exactly), so the oracle's view and the
                # engine's view stay bit-identical while the timed query
                # pays one write, not write + reread.
                assigned.write.mode("overwrite").parquet(materialize_assignment)
        finally:
            # the assignment is materialized (parquet or localCheckpoint) by
            # here — the feature cache has served its fit+transform window
            feat.unpersist()
        return _semantic_dedup_from_assigned(assigned, id_col, tau)
    if assigner != "exact":
        raise ValueError(f"unknown assigner: {assigner!r} (use 'exact' or 'ml')")
    fq, sq = KMEANS_VEC_QUANT, KMEANS_SCORE_QUANT
    base = _lloyd_base(df, id_col, vec_col, fq).persist()
    try:
        _, best_cid = _exact_lloyd(base, dim, n_centroids, iters, fq, sq)
        assigned = base.withColumn("cid", best_cid()).select("id", "arr", "cid")
        return _semantic_dedup_from_assigned(assigned, id_col, tau)
    finally:
        base.unpersist()


def ivf_kmeans_exact_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int,
    n_centroids: int = 8,
    nprobe: int = 2,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """ivf_kmeans_topk with an EXACT-deterministic distributed Lloyd
    quantizer instead of pyspark.ml KMeans — every centroid is bit-identical
    on any engine / partitioning / row order, so the entire training loop
    (init, every assignment, every centroid update, the probe, the final
    candidate set) is value-hash-checkable against an independent SQL
    engine. The tpch_q1 integer-unit-sum trick applied to clustering:

    - unit vectors are fixed-pointed ONCE (``uq = floor(u*1e6+0.5)`` longs);
      ``uq/1e6`` is the exact representation both engines cluster on;
    - assignment compares quantized scores ``floor((u·c - 0.5*|c|²)*1e5+0.5)``
      (argmin L2 ≡ argmax of that on the unit sphere) — float-fold
      association differences (~1e-14) vanish under the 1e-5 quantum; ties
      break on the lower centroid id on both engines;
    - centroid updates are EXACT long sums of uq per dimension; the new
      component ``(S_d/1e6)/n`` is one IEEE division sequence → identical
      doubles everywhere; empty clusters keep their previous centroid;
    - init = the ``n_centroids`` lowest-id vectors (deterministic, the
      classic Forgy choice made reproducible).

    Scale: the per-iteration shuffle is a ``groupBy(cid)`` over
    ``n_centroids`` groups with map-side partial aggregation of 64 long
    sums — bytes per task, not rows; driver state is n_centroids × dim
    doubles; candidates scan ~nprobe/n_centroids of the data. pyspark.ml
    KMeans (kmeans|| init, faster convergence) remains as ivf_kmeans_topk
    for production use where cross-engine bit-equality is not required."""
    fq, sq = KMEANS_VEC_QUANT, KMEANS_SCORE_QUANT
    base = _lloyd_base(df, id_col, vec_col, fq).persist()
    try:
        dim = len(query_vec)
        centroids, best_cid = _exact_lloyd(base, dim, n_centroids, iters, fq, sq)

        qu = [q / fq for q in _exact_unit_quant(query_vec, fq)]
        probed = sorted(
            range(n_centroids), key=lambda cid: (-_qscore(qu, centroids[cid], sq), cid)
        )[:nprobe]
        qraw = F.array(*[F.lit(float(x)) for x in query_vec])
        return (
            base.withColumn("cid", best_cid())
            .filter(F.col("cid").isin([int(c) for c in probed]))
            .select("id", F.round(cosine(F.col("arr"), qraw), 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(k)
            .withColumnRenamed("id", "vec_id")
        )
    finally:
        base.unpersist()
