"""DataSetUtils-parity operators (operators/utils.py): zipWithIndex /
zipWithUniqueId / deterministic sampling."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_1_6_0_spark.operators import utils as U


def test_zip_with_index_dense_and_ordered(spark):
    # deliberately many partitions + shuffled input order
    df = spark.range(0, 1000).select((999 - F.col("id")).alias("k")).repartition(13)
    out = U.zip_with_index(df, "k", "idx")
    rows = {r.k: r.idx for r in out.collect()}
    assert len(rows) == 1000
    # dense 0..n-1, and idx follows k order exactly
    assert sorted(rows.values()) == list(range(1000))
    assert all(rows[k] == k for k in (0, 1, 499, 998, 999))


def test_zip_with_index_no_global_single_partition_sort(spark):
    # the scalable two-phase plan must not funnel data through one partition:
    # the only Window in the plan is partitioned by _pid, never a global one
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    plan = U.zip_with_index(df, "k")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "row_number" in line:
            assert "_pid" in line  # partition-local, not Window [globalsort]


def test_zip_with_unique_id_unique(spark):
    df = spark.range(0, 500).repartition(7)
    out = U.zip_with_unique_id(df)
    ids = [r.uid for r in out.collect()]
    assert len(set(ids)) == 500


def test_deterministic_sample_stable_under_repartitioning(spark):
    df = spark.range(0, 2000).select(F.col("id"))
    a = {r.id for r in U.deterministic_sample(df, F.col("id"), 300).collect()}
    b = {
        r.id
        for r in U.deterministic_sample(df.repartition(17), F.col("id"), 300).collect()
    }
    assert a == b  # physical layout must not change the sample
    assert 0.2 < len(a) / 2000 < 0.4  # ~30% rate

    # different salt → different (but still deterministic) subset
    c = {r.id for r in U.deterministic_sample(df, F.col("id"), 300, salt="x").collect()}
    assert c != a


def test_deterministic_sample_rate_column(spark):
    df = spark.range(0, 1000).withColumn("grp", F.col("id") % 2)
    rate = F.when(F.col("grp") == 0, 500).otherwise(100)
    out = U.deterministic_sample(df, F.col("id"), rate)
    by_grp = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert by_grp[0] > 3 * by_grp[1]  # stratified rates actually differ


def test_bigrams_and_word_segments_edges(spark):
    """Edge guards for the repetition/segment-dedup builders: below-threshold
    docs yield EMPTY arrays (Spark's sequence() turns descending without the
    guard and would fabricate elements), trailing partial segments drop."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.pipeline import text as tx

    df = spark.createDataFrame(
        [("one",), ("a b",), ("a b c d e f g",), ("",)], "text string"
    )
    rows = df.select(
        tx.bigrams("text").alias("bg"),
        tx.word_segments("text", 3).alias("segs"),
    ).collect()
    assert rows[0].bg == [] and rows[0].segs == []          # single token
    assert rows[1].bg == ["a b"] and rows[1].segs == []     # below width
    assert rows[2].bg == ["a b", "b c", "c d", "d e", "e f", "f g"]
    assert rows[2].segs == ["a b c", "d e f"]               # partial "g" dropped
    assert rows[3].bg == [] and rows[3].segs == []          # empty text
