"""FlinkML façade — SURVEY.md §2.13.

Reference: flink-libraries/flink-ml — SVM classification, multiple linear
regression, ALS recommendation, kNN, outlier scoring (SOS), preprocessing
(StandardScaler/MinMaxScaler/Splitter), chained pipelines.

pyspark.ml covers every one of these natively; this façade only pins the
mapping so a reference user finds the same capabilities:

| FlinkML                         | pyspark.ml                              |
|---------------------------------|-----------------------------------------|
| classification.SVM              | classification.LinearSVC                |
| regression.MultipleLinearRegression | regression.LinearRegression         |
| recommendation.ALS              | recommendation.ALS                      |
| nn.KNN                          | knn_join (below) / pipeline.similarity.* |
| outlier.StochasticOutlierSelection | sos_outlier (below)                  |
| preprocessing.StandardScaler    | feature.StandardScaler                  |
| preprocessing.MinMaxScaler      | feature.MinMaxScaler                    |
| preprocessing.Splitter          | DataFrame.randomSplit                   |
| pipeline (ChainedPredictor)     | ml.Pipeline                             |

Everything below is a thin, import-gated convenience layer — the heavy
lifting is pyspark.ml's (distributed, battle-tested at the target scale).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def standard_scaler(df: DataFrame, input_col: str, output_col: str = "scaled") -> DataFrame:
    """preprocessing.StandardScaler analog (fit+transform in one call)."""
    from pyspark.ml.feature import StandardScaler

    model = StandardScaler(
        inputCol=input_col, outputCol=output_col, withMean=True, withStd=True
    ).fit(df)
    return model.transform(df)


def min_max_scaler(df: DataFrame, input_col: str, output_col: str = "scaled") -> DataFrame:
    from pyspark.ml.feature import MinMaxScaler

    return MinMaxScaler(inputCol=input_col, outputCol=output_col).fit(df).transform(df)


def splitter(df: DataFrame, weights: list[float], seed: int = 42) -> list[DataFrame]:
    """preprocessing.Splitter analog."""
    return df.randomSplit(weights, seed=seed)


def _fit_cached(estimator, train: DataFrame):
    """Fit an iterative pyspark.ml estimator with the input persisted for
    the fit window only. Measured (r16, guide §5): ml optimizers re-execute
    the input DataFrame lineage on every optimizer pass — their internal
    handlePersistence caches a derived RDD only after the lineage has run,
    so an expensive upstream pipeline is recomputed per iteration. Persist
    does not change row values or partition order, so the fitted model is
    bit-identical (verified for KMeans and LogisticRegression)."""
    train = train.persist()
    try:
        return estimator.fit(train)
    finally:
        train.unpersist()


def linear_svc(train: DataFrame, features_col: str = "features", label_col: str = "label"):
    """classification.SVM analog — returns the fitted model."""
    from pyspark.ml.classification import LinearSVC

    return _fit_cached(LinearSVC(featuresCol=features_col, labelCol=label_col), train)


def linear_regression(train: DataFrame, features_col: str = "features", label_col: str = "label"):
    """regression.MultipleLinearRegression analog."""
    from pyspark.ml.regression import LinearRegression

    return _fit_cached(LinearRegression(featuresCol=features_col, labelCol=label_col), train)


def _sq_dist(a: str, b: str):
    """Squared euclidean distance between two array<float/double> columns —
    JVM-side via zip_with + aggregate (no Python in the hot path)."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_join(
    training: DataFrame,
    test: DataFrame,
    k: int = 3,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """FlinkML nn.KNN analog (flink-ml/.../nn/KNN.scala): exact brute-force
    k-nearest-neighbors join — every test point against every training point,
    per-test top-k by euclidean distance.

    Scale path: the cross join is a broadcast nested loop when `training`
    fits in memory (broadcast it at the call site); otherwise block-partition
    both sides (the reference blocks the same way via its cross strategy).
    Ties broken by training id for determinism. Returns
    (test_id, train_id, dist) with k rows per test point."""
    from pyspark.sql import Window as _W

    t = training.select(F.col(id_col).alias("train_id"), F.col(vec_col).alias("tv"))
    q = test.select(F.col(id_col).alias("test_id"), F.col(vec_col).alias("qv"))
    pairs = q.crossJoin(t).select(
        "test_id", "train_id", F.sqrt(_sq_dist("qv", "tv")).alias("dist")
    )
    w = _W.partitionBy("test_id").orderBy(F.asc("dist"), F.asc("train_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def sos_outlier(
    points: DataFrame,
    perplexity: float = 4.5,
    id_col: str = "id",
    vec_col: str = "vec",
) -> DataFrame:
    """FlinkML outlier.StochasticOutlierSelection analog
    (flink-ml/.../outlier/StochasticOutlierSelection.scala): per-point
    affinity with a perplexity-calibrated bandwidth, binding probabilities,
    and outlier probability Π_j (1 - p_{j→i}).

    Distributed shape: the O(n²) pairwise distances are a cross join (same
    asymptotics as the reference's cross), the per-point bandwidth binary
    search runs grouped-per-point in a pandas UDF (each group = one row of
    the affinity matrix), and the final product is a sum of log1p's grouped
    by the target point — no driver-side matrix ever materializes.
    Returns (id, outlier_prob).

    SCALE BOUNDARY (explicit): the cross-join kernel is inherently O(n²) —
    the algorithm itself is (every point's affinity references every other
    point), exactly as in the reference. Run it on samples (≤10⁵ points);
    at 100 TB, sample or pre-cluster first (e.g. IVF assignments from
    pipeline.similarity) and run SOS per partition — never on the full
    corpus."""
    import pandas as pd

    a = points.select(F.col(id_col).alias("i"), F.col(vec_col).alias("iv"))
    b = points.select(F.col(id_col).alias("j"), F.col(vec_col).alias("jv"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", _sq_dist("iv", "jv").alias("d2"))
    )

    logh = float(__import__("math").log(perplexity))

    def _bind(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d2 = pdf["d2"].to_numpy(dtype="float64")
        lo, hi, beta = 0.0, None, 1.0
        for _ in range(50):  # binary search the precision to hit perplexity
            aff = np.exp(-d2 * beta)
            s = aff.sum()
            if s <= 0:
                h = 0.0
            else:
                p = aff / s
                nz = p > 0
                h = float(-(p[nz] * np.log(p[nz])).sum())
            if abs(h - logh) < 1e-8:
                break
            if h > logh:  # too flat → raise precision
                lo = beta
                beta = beta * 2 if hi is None else (beta + hi) / 2
            else:
                hi = beta
                beta = (lo + beta) / 2
        aff = np.exp(-d2 * beta)
        s = aff.sum()
        p = aff / s if s > 0 else np.zeros_like(aff)
        return pd.DataFrame({"j": pdf["j"], "p": p})

    bound = pairs.groupBy("i").applyInPandas(_bind, schema="j long, p double")
    return (
        bound.groupBy(F.col("j").alias(id_col))
        .agg(F.exp(F.sum(F.log1p(-F.col("p")))).alias("outlier_prob"))
    )


SOS_QUANT = 10**4  # embedding quantization step for the hash-checkable path
SOS_ITERS = 50  # fixed bandwidth-search depth (the reference's max)


def sos_outlier_fixed(
    points: DataFrame,
    perplexity: float = 10.0,
    id_col: str = "id",
    vec_col: str = "vec",
    quant: int = SOS_QUANT,
    iters: int = SOS_ITERS,
) -> DataFrame:
    """HASH-CHECKABLE StochasticOutlierSelection (the exact-GD/Lloyd/PCA
    fixed-point recipe applied a 4th time): same distributed shape as
    :func:`sos_outlier`, but every step an oracle can replay —

    - inputs quantized to ``1/quant`` → squared distances are EXACT integer
      sums (order-independent), scaled by one correctly-rounded division;
    - the per-point bandwidth binary search runs a FIXED ``iters`` rounds
      (no convergence break) with the single-pass entropy form
      ``h = beta*t/s + ln(s)`` (t = Σ aff·d2), the identical float op
      sequence the DuckDB oracle unrolls;
    - binding probabilities use ``ln(1-p)`` (not log1p) so both engines
      share the op sequence, and the final product is rounded to 4 dp.

    Sub-ulp exp/log differences and sum-order noise are absorbed: a search
    comparison can only flip when h sits within float noise of log(perp),
    which leaves the bracket on the root either way, so both engines'
    betas — and the rounded output — agree. SCALE BOUNDARY: same O(n²)
    cross-join as sos_outlier; sample or pre-cluster first at 100 TB."""
    import pandas as pd

    qv = F.transform(F.col(vec_col), lambda x: F.floor(x * quant + F.lit(0.5)).cast("long"))
    a = points.select(F.col(id_col).alias("i"), qv.alias("iv"))
    b = points.select(F.col(id_col).alias("j"), qv.alias("jv"))
    d2int = F.aggregate(
        F.zip_with("iv", "jv", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("i") != F.col("j"))
        .select("i", "j", (d2int / F.lit(float(quant * quant))).alias("d2s"))
    )

    logh = math.log(perplexity)

    def _bind(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        d2 = pdf["d2s"].to_numpy(dtype="float64")
        lo, hi, beta = 0.0, None, 1.0
        for _ in range(iters):
            aff = np.exp(-d2 * beta)
            s = float(aff.sum())
            h = beta * float((aff * d2).sum()) / s + math.log(s) if s > 0 else 0.0
            if h > logh:
                lo = beta
                beta = beta * 2 if hi is None else (beta + hi) / 2
            else:
                hi = beta
                beta = (lo + beta) / 2
        aff = np.exp(-d2 * beta)
        s = aff.sum()
        p = aff / s if s > 0 else np.zeros_like(aff)
        return pd.DataFrame({"j": pdf["j"], "p": p})

    bound = pairs.groupBy("i").applyInPandas(_bind, schema="j long, p double")
    return (
        bound.groupBy(F.col("j").alias(id_col))
        .agg(F.round(F.exp(F.sum(F.log(F.lit(1.0) - F.col("p")))), 4).alias("outlier_prob"))
    )


def duck_sos_oracle(perplexity: float = 10.0, dim: int = 64, quant: int = SOS_QUANT, iters: int = SOS_ITERS, where: str = "") -> str:
    """Unrolled-CTE replay of :func:`sos_outlier_fixed` over the embeddings
    view: exact integer squared distances, then the same fixed-depth binary
    search per point (state (lo, hi, beta), NULL hi = still doubling), the
    same h = beta*t/s + ln(s), and round(Π(1-p), 4). The log(perplexity)
    target is embedded as the Python float's repr so both engines compare
    against the identical constant. ``where`` (a predicate string, WITHOUT
    the keyword) narrows the source — the r15 deterministic cap uses it so
    the quadratic stays tractable above the EMB_CAP tier."""
    logh = repr(math.log(perplexity))
    q2 = float(quant * quant)
    wh = f" WHERE {where}" if where else ""
    ctes = [
        f"xq AS MATERIALIZED (SELECT vec_id AS id, list_transform(embedding::DOUBLE[], e -> CAST(floor(e*{quant} + 0.5) AS BIGINT)) AS x FROM embeddings{wh})",
        f"pairs AS MATERIALIZED (SELECT a.id AS i, b.id AS j, list_sum(list_transform(range(1, {dim + 1}), k -> (a.x[k]-b.x[k])*(a.x[k]-b.x[k])))::DOUBLE / {q2!r} AS d2s FROM xq a JOIN xq b ON a.id <> b.id)",
        "st0 AS MATERIALIZED (SELECT id AS i, 0.0::DOUBLE AS lo, NULL::DOUBLE AS hi, 1.0::DOUBLE AS beta FROM xq)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"a{t} AS MATERIALIZED (SELECT p.i, any_value(st.beta) AS beta, "
            f"sum(exp(-p.d2s*st.beta)) AS s, sum(exp(-p.d2s*st.beta)*p.d2s) AS tv "
            f"FROM pairs p JOIN st{t-1} st USING (i) GROUP BY p.i)"
        )
        ctes.append(
            f"h{t} AS MATERIALIZED (SELECT i, beta, "
            f"CASE WHEN s > 0 THEN beta*tv/s + ln(s) ELSE 0.0 END AS hv FROM a{t})"
        )
        ctes.append(
            f"st{t} AS MATERIALIZED (SELECT h.i, "
            f"CASE WHEN h.hv > {logh} THEN h.beta ELSE st.lo END AS lo, "
            f"CASE WHEN h.hv > {logh} THEN st.hi ELSE h.beta END AS hi, "
            f"CASE WHEN h.hv > {logh} THEN (CASE WHEN st.hi IS NULL THEN h.beta*2 ELSE (h.beta+st.hi)/2 END) "
            f"ELSE (st.lo+h.beta)/2 END AS beta "
            f"FROM h{t} h JOIN st{t-1} st USING (i))"
        )
    ctes.append(
        f"fin AS MATERIALIZED (SELECT p.i, p.j, exp(-p.d2s*st.beta) AS aff FROM pairs p JOIN st{iters} st USING (i))"
    )
    ctes.append("sden AS MATERIALIZED (SELECT i, sum(aff) AS s FROM fin GROUP BY i)")
    ctes.append(
        "bind AS MATERIALIZED (SELECT f.j, CASE WHEN sd.s > 0 THEN f.aff/sd.s ELSE 0.0 END AS p FROM fin f JOIN sden sd USING (i))"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT j AS id, round(exp(sum(ln(1.0 - p))), 4) AS outlier_prob FROM bind GROUP BY j"
    )


def als(
    ratings: DataFrame, user_col: str = "user", item_col: str = "item", rating_col: str = "rating", rank: int = 10
):
    """recommendation.ALS analog."""
    from pyspark.ml.recommendation import ALS

    return _fit_cached(
        ALS(userCol=user_col, itemCol=item_col, ratingCol=rating_col, rank=rank, seed=42), ratings
    )


def quality_classifier(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """Document-quality classifier (the GPT-3 appendix-A quality-filter
    shape: a linear model over cheap text features, trained on weak labels,
    scores the whole corpus). Weak label = the heuristic quality gate;
    features = token count, stopword ratio, mean token length, punctuation
    ratio — all JVM Column expressions; training is pyspark.ml
    LogisticRegression (distributed LBFGS, the same treeAggregate pattern
    the PCA Gram uses). Returns (doc_id, label, prediction).

    At 100 TB: featurization is one scan; LBFGS passes are bounded by
    max_iter; scoring broadcasts the coefficient vector inside the model
    transform. Swap the weak label for human ratings / an LM judge column
    and nothing else changes."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from flink_1_6_0_spark.pipeline.text import (
        mean_token_len,
        punct_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    feats = docs.select(
        F.col(doc_id),
        token_count(text_col).cast("double").alias("f_ntok"),
        F.coalesce(stopword_ratio(text_col), F.lit(0.0)).alias("f_stop"),
        F.coalesce(mean_token_len(text_col), F.lit(0.0)).alias("f_mtl"),
        F.coalesce(punct_ratio(text_col), F.lit(0.0)).alias("f_punct"),
        (quality_score(text_col) >= 0.5).cast("double").alias("label"),
    )
    assembled = VectorAssembler(
        inputCols=["f_ntok", "f_stop", "f_mtl", "f_punct"], outputCol="features"
    ).transform(feats)
    # r16 (guide §5, measured): LBFGS re-executes the featurization lineage
    # (4 tokenizing Column passes over text) per iteration pass — persist for
    # the fit window (3.7 s → 2.5 s at sf0.01, coefficients bit-identical),
    # release immediately so corpus-sized text features don't pin memory.
    assembled = assembled.persist()
    try:
        model = LogisticRegression(maxIter=max_iter).fit(assembled)
    finally:
        assembled.unpersist()
    # Score with the EXTRACTED coefficient vector as plain Column math
    # rather than model.transform: (a) the margin w·x + b > 0 IS the
    # transform's binary decision at the default 0.5 threshold, and pure
    # codegen arithmetic beats the ml prediction UDF at scale; (b) Spark
    # 4.1.2 has a session-poisoning bug — once ANY pyspark.sql.Observation
    # has completed in the session, collecting a model.transform plan dies
    # in closure cleaning ("NotSerializableException: ObservationManager"),
    # reproduced minimally in tests/test_udf_ml.py::
    # test_ml_transform_survives_observation.
    w = model.coefficients
    margin = (
        F.lit(float(model.intercept))
        + F.col("f_ntok") * float(w[0])
        + F.col("f_stop") * float(w[1])
        + F.col("f_mtl") * float(w[2])
        + F.col("f_punct") * float(w[3])
    )
    return assembled.select(
        doc_id, "label", (margin > 0).cast("double").alias("prediction")
    )


# Exact-deterministic logistic regression (quality_classifier's
# oracle-checkable twin). Quantization constants are part of the CONTRACT
# shared with the DuckDB oracle (queries/pipeline_ext._logreg_oracle_sql) —
# change them together or the cross-engine bitwise-weight invariant breaks.
LOGREG_FEATURE_QUANT = 1_000_000.0  # feature fixed-point: 6 decimal places
LOGREG_GRAD_QUANT = 10_000.0  # per-row gradient fixed-point: 4 places
LOGREG_ITERS = 25
LOGREG_LR = 1.0


def quality_classifier_gd(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    iters: int = LOGREG_ITERS,
    lr: float = LOGREG_LR,
) -> DataFrame:
    """quality_classifier's exact-deterministic twin: the same weak-label /
    cheap-feature quality filter, trained by full-batch class-weighted
    gradient descent whose every weight is BIT-IDENTICAL on any engine,
    any partitioning, any row order — so the whole training run is
    value-hash-checkable against an independent SQL engine.

    How the determinism works (the tpch_q1 integer-unit-sum trick applied
    to an iterative algorithm):

    - features are fixed-pointed once: ``q = floor(f * 1e6 + 0.5)`` —
      per-row IEEE ops on identical inputs, so identical longs everywhere;
    - standardization stats are EXACT long/decimal sums of those longs
      (order-independent), so mean/std come out as identical doubles;
    - each GD step aggregates ``floor(err * fs * 1e4 + 0.5)`` per-row
      BIGINT contributions — the long sum is exact and order-independent,
      and the only cross-engine wobble (libm ``exp`` last-ulp differences
      inside the sigmoid) is ~1e-8 of a quantum, so both engines floor to
      the same long with overwhelming probability;
    - the weight update ``w - lr*((s/1e4)/n)`` is a fixed scalar IEEE
      sequence on identical inputs → weights stay bitwise equal across
      engines for every iteration;
    - the final score ``z = w·x + b`` involves no transcendentals, so the
      ``z > 0`` decision is exact (measured min |z| ≥ 1.7e-4 at sf0.1,
      ~12 orders of magnitude above double noise).

    Class weighting (negatives weighted n_pos/n_neg) makes the imbalanced
    weak label learnable: at sf0.01/sf0.1 the trained model reaches TNR
    1.0 / TPR ~0.92 vs the heuristic gate — a real decision boundary, not
    the all-positive collapse unweighted GD gives here.

    At 100 TB: featurization + fixed-pointing is one scan (cached);
    each of the ``iters`` passes is a map-side-combined 5-column long-sum
    aggregate (the classic distributed-GD treeAggregate shape) collecting
    ONE row to the driver; driver state is 5 doubles. Long-sum headroom:
    per-row |contribution| ≤ ~1e6, so sums stay exact past 1e12 rows;
    beyond that, widen the gradient sums to DECIMAL(38,0) like the stats
    sums already are.  Reference anchor: flink-ml's SGD optimizer
    (optimization/GradientDescent.scala) iterates the same
    broadcast-weights → per-element gradient → reduce cycle."""
    from flink_1_6_0_spark.pipeline.text import (
        mean_token_len,
        punct_ratio,
        quality_score,
        stopword_ratio,
        token_count,
    )

    fq, gq = LOGREG_FEATURE_QUANT, LOGREG_GRAD_QUANT
    feats = docs.select(
        F.col(doc_id),
        (token_count(text_col) / F.lit(64.0)).alias("f1"),
        F.coalesce(stopword_ratio(text_col), F.lit(0.0)).alias("f2"),
        F.coalesce(mean_token_len(text_col), F.lit(0.0)).alias("f3"),
        F.coalesce(punct_ratio(text_col), F.lit(0.0)).alias("f4"),
        # CASE-shaped so a NULL quality (empty text) labels 0.0 on both
        # engines instead of Spark's NULL vs SQL's ELSE-branch 0.0
        F.when(quality_score(text_col) >= 0.5, 1.0).otherwise(0.0).alias("y"),
    )
    qcols = [F.floor(F.col(f"f{j}") * F.lit(fq) + F.lit(0.5)).alias(f"q{j}") for j in range(1, 5)]
    qfeats = feats.select(doc_id, *qcols, "y")

    stats = qfeats.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"q{j}").alias(f"s{j}") for j in range(1, 5)],
        *[
            F.sum((F.col(f"q{j}") * F.col(f"q{j}")).cast("decimal(38,0)")).alias(f"ss{j}")
            for j in range(1, 5)
        ],
        F.sum(F.col("y").cast("long")).alias("npos"),
    ).first()
    n = stats["n"]
    npos = stats["npos"]
    nneg = n - npos
    if nneg == 0 or npos == 0:  # degenerate corpus: nothing to separate
        return feats.select(
            doc_id, F.col("y").alias("label"), F.col("y").alias("prediction")
        )
    ratio = npos / nneg
    mean, std = [], []
    for j in range(1, 5):
        m = (float(stats[f"s{j}"]) / fq) / n
        var = (float(stats[f"ss{j}"]) / (fq * fq)) / n - m * m
        mean.append(m)
        std.append(math.sqrt(var) if var > 0 else 1.0)

    sfeats = qfeats.select(
        doc_id,
        *[
            ((F.col(f"q{j}") / F.lit(fq) - F.lit(mean[j - 1])) / F.lit(std[j - 1])).alias(
                f"fs{j}"
            )
            for j in range(1, 5)
        ],
        "y",
    ).persist()
    try:
        w = [0.0, 0.0, 0.0, 0.0]
        b = 0.0
        for _ in range(iters):
            z = (
                F.lit(w[0]) * F.col("fs1")
                + F.lit(w[1]) * F.col("fs2")
                + F.lit(w[2]) * F.col("fs3")
                + F.lit(w[3]) * F.col("fs4")
                + F.lit(b)
            )
            sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            wgt = F.when(F.col("y") == 1.0, F.lit(1.0)).otherwise(F.lit(ratio))
            err = (sig - F.col("y")) * wgt
            g = sfeats.agg(
                *[
                    F.sum(F.floor(err * F.col(f"fs{j}") * F.lit(gq) + F.lit(0.5))).alias(
                        f"g{j}"
                    )
                    for j in range(1, 5)
                ],
                F.sum(F.floor(err * F.lit(gq) + F.lit(0.5))).alias("gb"),
            ).first()
            w = [w[j] - lr * ((g[f"g{j + 1}"] / gq) / n) for j in range(4)]
            b = b - lr * ((g["gb"] / gq) / n)
        z = (
            F.lit(w[0]) * F.col("fs1")
            + F.lit(w[1]) * F.col("fs2")
            + F.lit(w[2]) * F.col("fs3")
            + F.lit(w[3]) * F.col("fs4")
            + F.lit(b)
        )
        return sfeats.select(
            doc_id,
            F.col("y").alias("label"),
            F.when(z > 0.0, 1.0).otherwise(0.0).alias("prediction"),
        )
    finally:
        # lazy-safe: a post-unpersist collect just recomputes the (cheap,
        # deterministic) featurization scan once more
        sfeats.unpersist()


def _poly_exponents(dim: int, degree: int) -> list[list[int]]:
    """Exponent vectors of the polynomial base, in the reference's exact
    order (preprocessing/PolynomialFeatures.scala:166,194): all monomials of
    degree d first, then d-1, ... down to 1; within a degree the first
    factor's exponent descends (calculateCombinations' `value to 0 by -1`
    recursion)."""

    def combos(length: int, value: int) -> list[list[int]]:
        if length == 0:
            return []
        if length == 1:
            return [[value]]
        out = []
        for v in range(value, -1, -1):
            out.extend([v] + rest for rest in combos(length - 1, value - v))
        return out

    result: list[list[int]] = []
    for d in range(degree, 0, -1):
        result.extend(combos(dim, d))
    return result


def polynomial_features(
    df: DataFrame,
    input_col: str,
    dim: int,
    degree: int = 2,
    output_col: str = "poly",
) -> DataFrame:
    """preprocessing.PolynomialFeatures analog
    (PolynomialFeatures.scala:32-58,166): maps an array column (x, y, ...)
    into the polynomial feature space of the given degree — e.g. (x, y) at
    degree 3 → (x³, x²y, xy², y³, x², xy, y², x, y).

    Pure Column arithmetic: the exponent combinatorics run driver-side over
    INDICES only (O(dim^degree) expressions, independent of row count); each
    monomial is an explicit left-to-right product of element_at factors cast
    to double, so evaluation is whole-stage-codegen'd JVM work — no Python
    in the row path, and the IEEE result is bit-reproducible across engines
    (no pow()).
    """
    factors_per_monomial = [
        [i for i, e in enumerate(exps) for _ in range(e)]
        for exps in _poly_exponents(dim, degree)
    ]

    def product(idxs: list[int]):
        expr = F.element_at(F.col(input_col), idxs[0] + 1).cast("double")
        for i in idxs[1:]:
            expr = expr * F.element_at(F.col(input_col), i + 1).cast("double")
        return expr

    return df.withColumn(output_col, F.array(*[product(m) for m in factors_per_monomial]))
