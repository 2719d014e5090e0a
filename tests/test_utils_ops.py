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


def test_bulk_iteration_termination_criterion(spark):
    """DataSet.iterate + closeWith(result, terminationCriterion)
    (IterativeDataSet.java:82): loop ends the pass AFTER the criterion
    frame turns empty, before max_iterations."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.operators.iterations import iterate

    df = spark.createDataFrame([(0,), (1,)], "v long")
    passes = []

    def step(d):
        passes.append(1)
        return d.select((F.col("v") + 1).alias("v"))

    out = iterate(
        df, step, max_iterations=50,
        termination_fn=lambda prev, cur: cur.filter(F.col("v") < 4),
    )
    got = sorted(r["v"] for r in out.collect())
    # criterion {v<4} first empty when min value reaches 4 -> 0,1 advanced 4 passes
    assert got == [4, 5]
    assert len(passes) == 4 < 50


def test_delta_iteration_upsert_and_drain(spark):
    """DataSet.iterateDelta (DataSet.java:1206): per-pass solution upsert by
    key + workset-driven termination — min-label propagation on a path graph
    converges in path-length passes, then the workset drains."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.operators.iterations import iterate_delta

    # path 0-1-2-3; solution starts as own id; workset = initial labels
    solution = spark.createDataFrame([(i, i) for i in range(4)], "id long, label long")
    workset = spark.createDataFrame([(i, i) for i in range(4)], "id long, label long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)], "src long, dst long"
    )

    def step(sol, ws):
        cand = (
            ws.join(edges, ws["id"] == edges["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("label"))
        )
        improved = (
            cand.alias("c")
            .join(sol.alias("s"), "id")
            .filter(F.col("c.label") < F.col("s.label"))
            .select("id", F.col("c.label").alias("label"))
        )
        return improved, improved

    out = iterate_delta(solution, workset, step, max_iterations=50, key_cols=["id"])
    assert {(r["id"], r["label"]) for r in out.collect()} == {(0, 0), (1, 0), (2, 0), (3, 0)}


def test_split_assign_exclusive_and_stable(spark):
    """split_assign: every row gets exactly one split, assignment is a pure
    function of the key (stable across re-partitioning), ranges are
    exclusive, permille overflow raises."""
    import pytest

    from flink_1_6_0_spark.operators.utils import split_assign

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    out = split_assign(df, "k", {"train": 800, "val": 100, "test": 100})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # roughly proportional (hash-uniform; generous bounds)
    assert counts["train"] > 1400 and counts["val"] > 100 and counts["test"] > 100
    # stability: same assignment regardless of physical layout
    again = split_assign(df.repartition(13), "k", {"train": 800, "val": 100, "test": 100})
    assert out.select("k", "split").exceptAll(again.select("k", "split")).count() == 0
    with pytest.raises(ValueError):
        split_assign(df, "k", {"a": 600, "b": 600})


def test_accumulators_and_observation(spark):
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.accumulators import (
        AverageAccumulator,
        broadcast_variable,
        histogram,
        int_counter,
        observe_metrics,
    )

    df = spark.createDataFrame([(i,) for i in range(10)], "x long")
    # plan-side: Observation metrics piggyback on the action
    out, obs = observe_metrics(df, "job", n=F.count(F.lit(1)), total=F.sum("x"))
    assert out.count() == 10
    assert obs.get == {"n": 10, "total": 45}
    # python-side: counters + histogram inside mapInPandas
    acc = int_counter(spark)
    hist = histogram(spark)

    def count_batch(it):
        for pdf in it:
            acc.add(len(pdf))
            hist.add({int(k): int(v) for k, v in (pdf["x"] % 3).value_counts().items()})
            yield pdf

    df.repartition(4).mapInPandas(count_batch, "x long").write.format("noop").mode(
        "overwrite"
    ).save()
    assert acc.value == 10
    assert hist.value == {0: 4, 1: 3, 2: 3}
    # average accumulator
    avg = AverageAccumulator(spark)
    avg.add(2.0), avg.add(4.0)
    assert avg.local_value == 3.0
    # broadcast variable (withBroadcastSet analog)
    bc = broadcast_variable(spark.createDataFrame([("k", 7)], "k string, v long"))
    assert bc.value[0].v == 7


def test_summarize_missing_counts(spark):
    from flink_1_6_0_spark.operators.utils import summarize

    df = spark.createDataFrame([(1.0, "a"), (None, "b"), (3.0, "c")], "x double, s string")
    r = {row.column: row for row in summarize(df).collect()}
    assert set(r) == {"x"}  # string column excluded
    assert (r["x"].non_missing, r["x"].missing) == (2, 1)
    assert (r["x"].min, r["x"].max, r["x"].sum, r["x"].mean) == (1.0, 3.0, 4.0, 2.0)
    assert r["x"].variance == 2.0  # sample variance, (n-1) denominator


def test_summarize_strings_and_booleans(spark):
    from flink_1_6_0_spark.operators.utils import summarize_booleans, summarize_strings

    df = spark.createDataFrame(
        [("abc", True), ("", False), (None, None), ("de", True)], "s string, b boolean"
    )
    srow = summarize_strings(df).collect()[0]
    assert (srow.non_null, srow.nulls, srow.empty) == (3, 1, 1)
    assert (srow.min_length, srow.max_length) == (0, 3)
    brow = summarize_booleans(df).collect()[0]
    assert (brow.true_count, brow.false_count, brow.null_count) == (2, 1, 1)


def test_examples_batch_programs_run(spark):
    """The canonical example programs (flink-examples parity) run end-to-end
    on their sample inputs."""
    from examples.word_count import SAMPLE, word_count

    df = spark.createDataFrame([(line,) for line in SAMPLE], "value string")
    rows = word_count(df).collect()
    assert rows[0].word == "to" and rows[0]["count"] == 3

    from flink_1_6_0_spark.operators.graph import transitive_closure

    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    tc = {(r.src, r.dst) for r in transitive_closure(e).collect()}
    assert tc == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}


def test_example_pretrain_pipeline_runs(spark, sf_dir):
    """The end-to-end pretraining pipeline example survives its sample run:
    some docs filtered, every kept doc binned, attributes carried through."""
    from examples.pretrain_pipeline import pretrain_pipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pretrain_pipeline(docs)
    rows = out.collect()
    assert 0 < len(rows) < docs.count()
    assert {"doc_id", "lang", "quality", "shard", "n_tokens", "offset", "bin"} <= set(out.columns)
    assert all(r["bin"] >= 0 and r["quality"] >= 0.5 for r in rows)


def test_skew_report_null_and_dominant_key(spark):
    """NULL join keys group like any value (the null-heavy-FK case the op
    exists to catch) and the dominant key's suggested fan-out levels it."""
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.operators.utils import skew_report

    rows = [(None,)] * 60 + [(1,)] * 30 + [(2,)] * 6 + [(3,)] * 4
    df = spark.createDataFrame(rows, "k long")
    got = {r["k"]: r for r in skew_report(df, "k", top_n=10).collect()}
    assert got[None]["n"] == 60 and got[None]["share"] == 0.6
    # mean per key = 25 -> null key is 2.4x the average, split in 3
    assert got[None]["skew_factor"] == 2.4 and got[None]["suggested_salts"] == 3
    assert got[1]["suggested_salts"] == 2 and got[3]["suggested_salts"] == 1


def test_skew_report_composite_key(spark):
    import pyspark.sql.functions as F

    from flink_1_6_0_spark.operators.utils import skew_report

    rows = [(1, "a")] * 8 + [(1, "b")] * 2 + [(2, "a")] * 2
    df = spark.createDataFrame(rows, "k long, s string")
    got = {(r["k"], r["s"]): r["n"] for r in skew_report(df, ["k", "s"], top_n=5).collect()}
    assert got == {(1, "a"): 8, (1, "b"): 2, (2, "a"): 2}


def test_min_max_by_tie_sense(spark):
    """r14 ADVICE: both helpers take ``tie`` in ASCENDING sense by default
    (smallest tie value wins) regardless of min/max direction — max_by used
    to silently require a caller-side negation."""
    from flink_1_6_0_spark.operators.aggregations import max_by, min_by

    rows = [(1, 10.0, 7), (1, 10.0, 3), (1, 5.0, 1), (2, 4.0, 9), (2, 4.0, 2)]
    df = spark.createDataFrame(rows, "k long, v double, id long")
    got = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            max_by("id", "v", tie=F.col("id")).alias("mx_asc"),
            max_by("id", "v", tie=F.col("id"), tie_asc=False).alias("mx_desc"),
            min_by("id", "v", tie=F.col("id")).alias("mn_asc"),
            min_by("id", "v", tie=F.col("id"), tie_asc=False).alias("mn_desc"),
        )
        .collect()
    }
    # k=1: max v=10.0 ties ids {3,7}; min v=5.0 unique id 1
    assert got[1]["mx_asc"] == 3 and got[1]["mx_desc"] == 7
    assert got[1]["mn_asc"] == 1 and got[1]["mn_desc"] == 1
    # k=2: single v=4.0 ties ids {2,9}
    assert got[2]["mx_asc"] == 2 and got[2]["mx_desc"] == 9
    assert got[2]["mn_asc"] == 2 and got[2]["mn_desc"] == 9


def test_min_max_by_nonnumeric_tie_raises(spark):
    """r15 ADVICE: the negated-tie branch must FAIL LOUDLY on a non-numeric
    tie column instead of casting to double, yielding NULL, and silently
    restoring partition-order nondeterminism. The non-negated directions
    keep accepting strings (no negation fires there)."""
    import pytest

    from flink_1_6_0_spark.operators.aggregations import max_by, min_by

    rows = [(1, 10.0, "b"), (1, 10.0, "a")]
    df = spark.createDataFrame(rows, "k long, v double, s string")
    # under ANSI (Spark 4 default) the -string cast itself throws; under
    # non-ANSI it yields NULL and _checked_neg's raise_error fires — both
    # regimes must be LOUD, neither silently nondeterministic
    try:
        for ansi, pat in (
            ("true", "CAST_INVALID_INPUT"),
            ("false", "tie column must be NUMERIC"),
        ):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            for bad in (
                max_by("s", "v", tie=F.col("s")),    # maximize + asc => -tie
                min_by("s", "v", tie=F.col("s"), tie_asc=False),
            ):
                with pytest.raises(Exception, match=pat):
                    df.groupBy("k").agg(bad.alias("x")).collect()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
    # no-negation directions still work on strings
    ok = (
        df.groupBy("k")
        .agg(
            max_by("s", "v", tie=F.col("s"), tie_asc=False).alias("mx"),
            min_by("s", "v", tie=F.col("s")).alias("mn"),
        )
        .collect()[0]
    )
    assert ok["mx"] == "b" and ok["mn"] == "a"
