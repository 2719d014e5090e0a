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
| nn.KNN                          | (no direct op — pipeline.similarity.*)  |
| outlier.StochasticOutlierSelection | (density approx via clustering)      |
| preprocessing.StandardScaler    | feature.StandardScaler                  |
| preprocessing.MinMaxScaler      | feature.MinMaxScaler                    |
| preprocessing.Splitter          | DataFrame.randomSplit                   |
| pipeline (ChainedPredictor)     | ml.Pipeline                             |

Everything below is a thin, import-gated convenience layer — the heavy
lifting is pyspark.ml's (distributed, battle-tested at the target scale).
"""

from __future__ import annotations

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


def linear_svc(train: DataFrame, features_col: str = "features", label_col: str = "label"):
    """classification.SVM analog — returns the fitted model."""
    from pyspark.ml.classification import LinearSVC

    return LinearSVC(featuresCol=features_col, labelCol=label_col).fit(train)


def linear_regression(train: DataFrame, features_col: str = "features", label_col: str = "label"):
    """regression.MultipleLinearRegression analog."""
    from pyspark.ml.regression import LinearRegression

    return LinearRegression(featuresCol=features_col, labelCol=label_col).fit(train)


def als(
    ratings: DataFrame, user_col: str = "user", item_col: str = "item", rating_col: str = "rating", rank: int = 10
):
    """recommendation.ALS analog."""
    from pyspark.ml.recommendation import ALS

    return ALS(userCol=user_col, itemCol=item_col, ratingCol=rating_col, rank=rank, seed=42).fit(ratings)
