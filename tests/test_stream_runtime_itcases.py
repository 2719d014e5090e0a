"""Portable goldens from the reference's flink-tests streaming/runtime suites
(round-11 verdict task 1): CoStreamITCase, SelfConnectionITCase,
DirectedOutputITCase, OutputSplitterITCase, PartitionerITCase, IterateITCase,
TimestampITCase — replayed over this package's DataStream facade /
Structured Streaming surfaces with the reference's fixture values and
expected outputs.

Mapping notes (runtime constructs the Spark model spells differently):
- Subtask indexes are Spark partition ids; asserts pin the PROPERTY the
  reference's verifier checks (co-location, evenness, single-target), not
  absolute indexes — Spark's hash differs from MathUtils.murmurHash.
- `broadcast()` is a join-side annotation here, not a per-record fan-out;
  the fan-out goldens are replayed with an explicit duplication that models
  parallelism-2 broadcast (documented per test).
- Watermark.MAX at end of finite input has no Spark analog (the final
  micro-batch does not advance the watermark to +inf); the propagation test
  pins Spark's actual drain behavior as the declared mapping.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pytest

from flink_1_6_0_spark.datastream_api import DataStream
from flink_1_6_0_spark.sources.batch import from_elements, generate_sequence


# ---------------------------------------------------------------------------
# CoStreamITCase.java:46 — filter->keyBy connected with map->rebalance->
# filter->keyBy, CoFlatMap stringifies each side.
# ---------------------------------------------------------------------------


def test_co_stream_itcase_golden(spark):
    src = DataStream(from_elements(spark, [(1,), (3,), (5,)], "v int"))
    filter1 = src.filter(F.lit(True)).key_by("v")
    filter2 = (
        src.map_expr(F.col("v").alias("f0"), (F.col("v") + 1).alias("f1"))
        .rebalance()
        .filter(F.lit(True))
        .key_by("f0")
    )
    connected = DataStream(filter1.df).connect(DataStream(filter2.df)).map_expr(
        [F.col("v").cast("string").alias("s")],
        [F.format_string("(%d,%d)", "f0", "f1").alias("s")],
    )
    got = sorted(r["s"] for r in connected.df.collect())
    assert got == ["(1,2)", "(3,4)", "(5,6)", "1", "3", "5"]


# ---------------------------------------------------------------------------
# SelfConnectionITCase.java:46,85 — CoMap over two derivations of one source,
# same chain (parallelism 1) and different chains (parallelism 3): chaining
# is a physical detail; the result set is the golden both times.
# ---------------------------------------------------------------------------


def test_self_connection_same_chain_golden(spark):
    src = from_elements(spark, [(1,), (3,), (5,)], "v int")
    string_map = DataStream(src).map_expr(F.format_string("x %d", "v").alias("s"))
    out = string_map.connect(DataStream(src)).map_expr(
        [F.col("s")],
        [(F.col("v") + 1).cast("string").alias("s")],
    )
    got = sorted(r["s"] for r in out.df.collect())
    assert got == sorted(["x 1", "x 3", "x 5", "2", "4", "6"])


def test_self_connection_different_chain_golden(spark):
    src = DataStream(from_elements(spark, [(1,), (3,), (5,)], "v int")).rebalance(3)
    string_map = (
        src.map_expr(F.format_string("x %d", "v").alias("s"), F.col("v"))
        .key_by("s")  # keyBy(String::length) — key choice doesn't affect the set
    )
    long_map = (
        src.map_expr((F.col("v") + 1).cast("long").alias("l")).key_by("l")
    )
    out = DataStream(string_map.df).connect(DataStream(long_map.df)).map_expr(
        [F.col("s")],
        [F.col("l").cast("string").alias("s")],
    )
    got = sorted(r["s"] for r in out.df.collect())
    assert got == sorted(["x 1", "x 3", "x 5", "2", "4", "6"])


# ---------------------------------------------------------------------------
# DirectedOutputITCase.java:69 — one OutputSelector, four sinks. An element
# may carry several tags (10 -> even+ten); select(a, b) unions tags without
# duplicating an element that matches both; an unknown tag ("nonSelected")
# reaches no select() but the unsplit stream sees everything.
# ---------------------------------------------------------------------------


def test_directed_output_selector_golden(spark):
    source = DataStream(generate_sequence(spark, 1, 11)).split(
        even=F.col("value") % 2 == 0,
        odd=F.col("value") % 2 == 1,
        ten=F.col("value") == 10,
        nonSelected=F.col("value") == 11,
    )
    even = sorted(r["value"] for r in source.select("even").df.collect())
    odd_ten = sorted(r["value"] for r in source.select("odd", "ten").df.collect())
    even_odd = sorted(r["value"] for r in source.select("even", "odd").df.collect())
    assert even == [2, 4, 6, 8, 10]
    assert odd_ten == [1, 3, 5, 7, 9, 10, 11]
    assert even_odd == list(range(1, 12))


# ---------------------------------------------------------------------------
# OutputSplitterITCase.java:40,96 — two DIFFERENT splits applied to the same
# (merged) stream route independently.
# ---------------------------------------------------------------------------


def test_output_splitter_on_merged_stream_golden(spark):
    d1 = DataStream(from_elements(spark, [(0,), (2,), (4,), (6,), (8,)], "v int"))
    d2 = DataStream(from_elements(spark, [(1,), (3,), (5,), (7,), (9,)], "v int"))
    merged = d1.union(d2)
    gt = merged.split(hi=F.col("v") > 4).select("hi")
    mod3 = merged.split(yes=F.col("v") % 3 == 0).select("yes")
    assert sorted(r["v"] for r in gt.df.collect()) == [5, 6, 7, 8, 9]
    assert sorted(r["v"] for r in mod3.df.collect()) == [0, 3, 6, 9]


def test_output_splitter_on_single_stream_golden(spark):
    ds = DataStream(from_elements(spark, [(i,) for i in range(10)], "v int"))
    even = ds.split(even=F.col("v") % 2 == 0).select("even")
    by4 = ds.split(yes=F.col("v") % 4 == 0).select("yes")
    assert sorted(r["v"] for r in even.df.collect()) == [0, 2, 4, 6, 8]
    assert sorted(r["v"] for r in by4.df.collect()) == [0, 4, 8]


# ---------------------------------------------------------------------------
# PartitionerITCase.java:75 partitionerTest — the verifier properties over
# the reference's 7-tuple fixture (a b b a a c a) at parallelism 3:
# hash co-locates equal keys; custom routes by the partitioner alone;
# rebalance spreads evenly; global lands everything on one subtask.
# CustomPartitioningITCase.java:38 — an all-zero partitioner must put every
# record of generateSequence(1,1000) on a single subtask.
# ---------------------------------------------------------------------------


def test_partitioner_itcase_properties(spark):
    src = DataStream(
        from_elements(spark, [("a",), ("b",), ("b",), ("a",), ("a",), ("c",), ("a",)], "k string")
    ).rebalance(3)

    def pids(ds):
        return ds.df.withColumn("pid", F.spark_partition_id()).select("k", "pid").collect()

    # hash partitioning: every occurrence of a key on ONE subtask
    by_key = {}
    for r in pids(src.partition_by_hash("k")):
        by_key.setdefault(r["k"], set()).add(r["pid"])
    assert all(len(v) == 1 for v in by_key.values())

    # custom partitioner (c -> its own target, others together): the routing
    # expression alone decides placement — 'c' rows never share a partition
    # with the rest (absolute subtask indexes are the non-portable part)
    routed = pids(src.partition_custom(F.when(F.col("k") == "c", 2).otherwise(0), num_partitions=3))
    c_pids = {r["pid"] for r in routed if r["k"] == "c"}
    rest_pids = {r["pid"] for r in routed if r["k"] != "c"}
    assert len(c_pids) == 1 and len(rest_pids) == 1 and c_pids.isdisjoint(rest_pids)

    # rebalance: the reference's verifier pins exact round-robin indexes;
    # Spark's rebalance contract is redistribution across ALL subtasks with
    # approximate evenness (exact per-row rotation is not part of the
    # DataFrame contract) — the portable property: every subtask receives
    # work and nothing is lost
    sizes = [
        r["n"]
        for r in DataStream(src.df.coalesce(1))
        .rebalance(3)
        .df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert sum(sizes) == 7 and len(sizes) == 3 and min(sizes) >= 1

    # global: every record on ONE subtask
    gp = {r["pid"] for r in pids(src.global_())}
    assert len(gp) == 1


def test_custom_partitioning_all_zero_golden(spark):
    # CustomPartitioningITCase: AllZeroPartitioner over generateSequence(1,1000)
    ds = DataStream(generate_sequence(spark, 1, 1000)).rebalance(4)
    routed = ds.partition_custom(F.lit(0), num_partitions=4).df.withColumn("pid", F.spark_partition_id())
    per_pid = routed.groupBy("pid").agg(F.count("*").alias("n")).collect()
    assert len(per_pid) == 1 and per_pid[0]["n"] == 1000


# ---------------------------------------------------------------------------
# IterateITCase goldens over the declared stream-iteration workaround
# (streaming/iterate.py) and plain driver feedback.
# ---------------------------------------------------------------------------


def test_iterate_group_by_feedback_countdown(spark, tmp_path):
    """IterateITCase.java:516 testGroupByFeedback: keyed feedback loop where
    value v re-enters until it reaches 0; every element must pass the body
    more than once (received > 1) and keying by v%3 must survive the
    feedback edge. Ported through iterate_stream (per-epoch feedback): the
    emitted exits are three zeros, the body ran value+1 times per element,
    and each pass kept equal keys co-located."""
    from flink_1_6_0_spark.sources.stream import read_parquet_stream
    from flink_1_6_0_spark.streaming.iterate import iterate_stream

    src = str(tmp_path / "src")
    from_elements(spark, [(1,), (2,), (3,)], "v int").coalesce(1).write.parquet(src)
    emitted: list[tuple[int, int]] = []
    passes = {"n": 0}

    def step(df):
        passes["n"] += 1
        # keyed body: co-location assert — after partitioning by v%3 each
        # partition holds one residue class (the reference's key check)
        part = df.repartition(3, (F.col("v") % 3))
        classes = (
            part.withColumn("pid", F.spark_partition_id())
            .select((F.col("v") % 3).alias("r"), "pid")
            .distinct()
            .groupBy("r")
            .agg(F.countDistinct("pid").alias("n"))
            .collect()
        )
        assert all(r["n"] == 1 for r in classes)
        return part.select((F.col("v") - 1).alias("v"))

    def emit(df, epoch):
        emitted.extend((epoch, r["v"]) for r in df.collect())

    q = iterate_stream(
        read_parquet_stream(spark, src),
        step,
        exit_predicate=F.col("v") <= 0,
        emit_fn=emit,
        max_iterations=10,
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(v for _, v in emitted) == [0, 0, 0]
    assert passes["n"] == 3  # max start value 3 -> three feedback passes


def test_co_iteration_feedback_golden(spark):
    """IterateITCase.java:415 testCoIteration: ints (0,0) enter flatMap1 ->
    "1","1"; the feedback edge carries head.broadcast().union(otherSource)
    at parallelism 2 — modeled as an explicit x2 duplication (broadcast to 2
    subtasks) — and flatMap2 increments values < 2 while 1000/2000 from the
    other source circulate without output. Collected head output is the
    reference's golden list."""
    collected: list[str] = []
    head = DataStream(from_elements(spark, [(0,), (0,)], "v int")).map_expr(
        (F.col("v") + 1).cast("string").alias("s")
    )
    out = [r["s"] for r in head.df.collect()]
    other = from_elements(spark, [("1000",), ("2000",)], "s string")
    seen_from_source = {"n": 0}
    while out:
        collected.extend(out)
        fed = (
            from_elements(spark, [(s,) for s in out + out], "s string")  # broadcast x2
            .unionByName(other)
        )
        other = other.limit(0)  # the other source is finite: first pass only
        seen_from_source["n"] += fed.filter(F.col("s").cast("int") >= 1000).count()
        out = [
            r["s"]
            for r in fed.filter(F.col("s").cast("int") < 2)
            .select((F.col("s").cast("int") + 1).cast("string").alias("s"))
            .collect()
        ]
    assert sorted(collected) == ["1", "1", "2", "2", "2", "2"]
    assert seen_from_source["n"] == 2  # close() asserts seenFromSource


# ---------------------------------------------------------------------------
# TimestampITCase — the watermark/timestamp semantics that survive the model
# change (the rest of the suite tests Flink's operator-to-operator watermark
# plumbing, which Spark owns internally).
# ---------------------------------------------------------------------------


def _write_ts_parquet(spark, path, seconds):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)  # naive; session tz pinned UTC
    rows = [(i, base + timedelta(seconds=s)) for i, s in enumerate(seconds)]
    from_elements(spark, rows, "id long, ts timestamp").coalesce(1).write.parquet(path)


def test_watermark_propagation_min_across_inputs(spark, tmp_path):
    """TimestampITCase.java:111 testWatermarkPropagation: with two sources,
    the downstream watermark is the MIN across inputs — the source that
    stops at numWatermarks/2 caps what the topology sees. Spark analog:
    per-source withWatermark before a union; the global watermark follows
    spark.sql.streaming.multipleWatermarkPolicy=min (default), so append-mode
    windows finalize only below the SLOWER source's event-time progress."""
    import uuid

    fast, slow = str(tmp_path / "fast"), str(tmp_path / "slow")
    _write_ts_parquet(spark, fast, list(range(10)))  # event times 0..9 s
    _write_ts_parquet(spark, slow, list(range(5)))  # the early-closing source: 0..4 s
    from flink_1_6_0_spark.sources.stream import read_parquet_stream

    s1 = read_parquet_stream(spark, fast).withWatermark("ts", "0 seconds")
    s2 = read_parquet_stream(spark, slow).withWatermark("ts", "0 seconds")
    agg = (
        s1.unionByName(s2)
        .groupBy(F.window("ts", "1 second"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").cast("long").alias("ws"), "n")
    )
    name = f"wmprop_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    finalized = {r["ws"] - 1704067200 for r in spark.sql(f"SELECT * FROM {name}").collect()}
    # min-policy watermark = slower source's max event time (4 s): only
    # windows strictly below it finalize — the reference's "only guaranteed
    # to see numWatermarks/2 watermarks" assertion
    assert finalized == {0, 1, 2, 3}
    # Watermark.MAX at input end has NO Spark analog: the 4s..9s windows
    # stay pending at drain (declared mapping; the engine's job-end flush
    # conventions are the closer-event/cleanup-timer paths, tested in
    # test_streaming/test_lake).


def test_ascending_extractor_watermark_monotone_drop(spark, tmp_path):
    """TimestampITCase.java:304/:426: the ascending-timestamp extractor emits
    watermark = last timestamp, and a later DECREASING element cannot
    regress it — late elements behind the committed watermark are dropped
    and finalized windows never re-emit. Replay: file 0 advances event time
    to 10 s, file 1 to 50 s (committing watermark 50 and finalizing the low
    windows), files 2/3 deliver events at 2 s and 3 s — both behind the
    watermark — into a 0-second-delay append window: the engine drops them
    (numRowsDroppedByWatermark) and their windows stay absent.

    (Spark nuance pinned on purpose: the late-row FILTER uses the watermark
    committed by the PREVIOUS batch, so a late row arriving in the very
    batch that first advances the watermark may still be admitted — the
    drop golden therefore commits the watermark one batch ahead, matching
    the reference's two-step emit-then-drop scenario.)"""
    import glob as _glob
    import os
    import shutil
    import time
    import uuid

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    base = time.time() - 600
    for i, seconds in enumerate([[0, 1, 10], [50], [2], [3]]):
        stage = str(tmp_path / f"stage{i}")
        _write_ts_parquet(spark, stage, seconds)
        part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        final = os.path.join(src, f"g{i}.parquet")
        os.replace(part, final)
        shutil.rmtree(stage)
        os.utime(final, (base + i * 10, base + i * 10))

    schema = spark.read.parquet(os.path.join(src, "g0.parquet")).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .withWatermark("ts", "0 seconds")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 second"))
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").cast("long").alias("ws"), "n")
    )
    name = f"wmmono_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    q.stop()
    got = {r["ws"] - 1704067200: r["n"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    assert got.get(0) == 1 and got.get(1) == 1 and got.get(10) == 1
    assert 2 not in got and 3 not in got  # late elements never resurrect windows
    assert dropped == 2  # both regressed elements engine-dropped


def test_timestamps_ride_through_operators(spark, sf_dir):
    """TimestampITCase.java:252 testTimestampHandling: element timestamps
    survive map and connect unchanged. In the column model the ts column IS
    the timestamp — pin that the facade ops forward it untouched."""
    from flink_1_6_0_spark.queries import T

    ev = DataStream(T(spark, sf_dir, "events").select("event_id", "ts", "value"))
    mapped = ev.map_expr("event_id", "ts", (F.col("value") * 2).alias("v2"))
    co = mapped.connect(ev).map_expr(
        [F.col("event_id"), F.col("ts")],
        [F.col("event_id"), F.col("ts")],
    )
    orig = {r["event_id"]: r["ts"] for r in ev.df.select("event_id", "ts").collect()}
    for r in co.df.collect():
        assert r["ts"] == orig[r["event_id"]]


# ---------------------------------------------------------------------------
# IntervalJoinITCase.java — keyed time-bounded join bounds semantics.
# between(lo, hi) means right.ts in [left.ts + lo, left.ts + hi]; this
# package's (lower, upper) are magnitudes on each side of left.ts, so
# between(0, 1) maps to lower='0 ms' via a negated lower magnitude — spelled
# per test. Bounds are inclusive by default; *_exclusive flips them.
# ---------------------------------------------------------------------------


def _kv_ms(spark, pairs):
    """(key, v) rows with ts = v milliseconds (AscendingTuple2TimestampExtractor)."""
    return (
        from_elements(spark, list(pairs), "k string, v int")
        .withColumn("ts", F.timestamp_millis(F.col("v").cast("long")))
    )


def test_interval_join_same_key_zero_bounds(spark):
    """IntervalJoinITCase.java:58 testCanJoinOverSameKey: between(0,0) pairs
    each element with its exact-timestamp twin only."""
    from flink_1_6_0_spark.operators.joins import interval_join

    one = _kv_ms(spark, [("key", i) for i in range(6)])
    two = _kv_ms(spark, [("key", i) for i in range(6)]).select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2")
    )
    out = interval_join(one, two, [("k", "k2")], "ts", "ts2", "0 milliseconds", "0 milliseconds")
    got = sorted((r["v"], r["v2"]) for r in out.collect())
    assert got == [(i, i) for i in range(6)]


def test_interval_join_multiple_keys_golden(spark):
    """IntervalJoinITCase.java:111: between(0,1) on alternating keys — were
    the join not keyed, (1,2),(2,3)... would pair; key separation plus the
    bound admits only the exact twins."""
    from flink_1_6_0_spark.operators.joins import interval_join

    rows = [("key1", 0), ("key2", 1), ("key1", 2), ("key2", 3), ("key1", 4), ("key2", 5)]
    one = _kv_ms(spark, rows)
    two = _kv_ms(spark, rows).select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2")
    )
    out = interval_join(one, two, [("k", "k2")], "ts", "ts2", "0 milliseconds", "1 milliseconds")
    got = sorted((r["k"], r["v"], r["v2"]) for r in out.collect())
    assert got == sorted((k, v, v) for k, v in rows)


def test_interval_join_bounds_inclusive_default_and_explicit(spark):
    """IntervalJoinITCase.java:318/:356: between(0,2) inclusive (default and
    explicit) over values 0,1,2 -> the 6 golden pairs."""
    from flink_1_6_0_spark.operators.joins import interval_join

    one = _kv_ms(spark, [("key", i) for i in range(3)])
    two = _kv_ms(spark, [("key", i) for i in range(3)]).select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2")
    )
    expected = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    for kw in ({}, {"lower_exclusive": False, "upper_exclusive": False}):
        out = interval_join(
            one, two, [("k", "k2")], "ts", "ts2", "0 milliseconds", "2 milliseconds", **kw
        )
        assert sorted((r["v"], r["v2"]) for r in out.collect()) == expected


def test_interval_join_bounds_exclusive_golden(spark):
    """IntervalJoinITCase.java:284 testBoundsCanBeExclusive: between(0,2)
    with BOTH bounds exclusive keeps only (0,1) and (1,2)."""
    from flink_1_6_0_spark.operators.joins import interval_join

    one = _kv_ms(spark, [("key", i) for i in range(3)])
    two = _kv_ms(spark, [("key", i) for i in range(3)]).select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2")
    )
    out = interval_join(
        one, two, [("k", "k2")], "ts", "ts2", "0 milliseconds", "2 milliseconds",
        lower_exclusive=True, upper_exclusive=True,
    )
    assert sorted((r["v"], r["v2"]) for r in out.collect()) == [(0, 1), (1, 2)]


def test_interval_join_requires_both_bounds(spark):
    """IntervalJoinITCase.java:254,269: a missing bound fails loudly."""
    from flink_1_6_0_spark.operators.joins import interval_join
    from flink_1_6_0_spark.streaming.interval_join import stream_interval_join

    one = _kv_ms(spark, [("1", 1)])
    two = one.select(F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2"))
    with pytest.raises(ValueError, match="BOTH bounds"):
        interval_join(one, two, [("k", "k2")], "ts", "ts2", "0 milliseconds", None)
    with pytest.raises(ValueError, match="BOTH bounds"):
        interval_join(one, two, [("k", "k2")], "ts", "ts2", None, "1 milliseconds")
    with pytest.raises(ValueError, match="BOTH bounds"):
        stream_interval_join(one, two, [("k", "k2")], "ts", "ts2", None, "1 milliseconds")


def test_interval_join_unordered_streams_golden(spark, tmp_path):
    """IntervalJoinITCase.java:159 testBoundedUnorderedStreamsStillJoinCorrectly:
    both sides delivered OUT OF ORDER across a mid-stream watermark, bounds
    (-1, +1) — the buffered keyed state must still produce every golden pair.
    Replayed as two 2-file streams (file = micro-batch; in-batch and
    cross-batch disorder within the 5ms watermark delay) through the real
    stream-stream interval join."""
    import glob as _glob
    import os
    import shutil
    import time
    import uuid

    def replay_dir(name, batches):
        src = str(tmp_path / name)
        os.makedirs(src, exist_ok=True)
        base = time.time() - 600
        for i, vals in enumerate(batches):
            stage = str(tmp_path / f"{name}_st{i}")
            _kv_ms(spark, [("key", v) for v in vals]).coalesce(1).write.parquet(stage)
            part = _glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            final = os.path.join(src, f"g{i}.parquet")
            os.replace(part, final)
            shutil.rmtree(stage)
            os.utime(final, (base + i * 10, base + i * 10))
        schema = spark.read.parquet(os.path.join(src, "g0.parquet")).schema
        return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)

    from flink_1_6_0_spark.streaming.interval_join import stream_interval_join

    one = replay_dir("one", [[5, 1, 4, 3, 2], [9, 8, 7, 6]])
    two = replay_dir("two", [[2, 1, 3, 4, 5], [8, 7, 9, 6]]).select(
        F.col("k").alias("k2"), F.col("v").alias("v2"), F.col("ts").alias("ts2")
    )
    out = stream_interval_join(
        one, two, [("k", "k2")], "ts", "ts2", "1 milliseconds", "1 milliseconds",
        left_delay="5 milliseconds", right_delay="5 milliseconds",
    ).select("v", "v2")
    name = f"ij_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.outputMode("append").format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    got = sorted((r["v"], r["v2"]) for r in spark.sql(f"SELECT * FROM {name}").collect())
    expected = sorted(
        (a, b) for a in range(1, 10) for b in range(1, 10) if abs(a - b) <= 1
    )
    assert got == expected


# ---------------------------------------------------------------------------
# SideOutputITCase.java — ProcessFunction-driven side outputs (the window
# late-data goldens live in test_streaming.py). ctx.output(tag, ...) maps to
# a second derivation of the same source (split/select or a filtered
# projection): each sink is one filtered write over the common frame, the
# same dataflow the reference's OutputTag routing produces.
# ---------------------------------------------------------------------------

_SIDE_ELEMENTS = [1, 2, 5, 3, 4]  # SideOutputITCase.java:69


def test_process_function_side_output_golden(spark):
    """SideOutputITCase.java:334 testProcessFunctionSideOutput: the main
    output passes every element through; the side output carries
    'sideout-<v>' per element."""
    ds = DataStream(from_elements(spark, [(v,) for v in _SIDE_ELEMENTS], "v int"))
    main = ds.map_expr("v")
    side = ds.map_expr(F.format_string("sideout-%d", "v").alias("s"))
    assert sorted(r["v"] for r in main.df.collect()) == [1, 2, 3, 4, 5]
    assert sorted(r["s"] for r in side.df.collect()) == [
        "sideout-1", "sideout-2", "sideout-3", "sideout-4", "sideout-5"
    ]


def test_side_output_multiple_consumers_golden(spark):
    """SideOutputITCase.java:190 testSideOutputWithMultipleConsumers: two
    sinks on the SAME side output each see the full side stream."""
    ds = DataStream(from_elements(spark, [(v,) for v in _SIDE_ELEMENTS], "v int"))
    side = ds.map_expr(F.format_string("sideout-%d", "v").alias("s"))
    golden = ["sideout-1", "sideout-2", "sideout-3", "sideout-4", "sideout-5"]
    assert sorted(r["s"] for r in side.df.collect()) == golden
    assert sorted(r["s"] for r in side.df.collect()) == golden  # second consumer


def test_side_output_different_types_golden(spark):
    """SideOutputITCase.java:261 testDifferentSideOutputTypes: one operator
    feeds an Integer main output and a String side output — differently
    typed frames derived from one source."""
    ds = DataStream(from_elements(spark, [(v,) for v in _SIDE_ELEMENTS], "v int"))
    main = ds.map_expr("v")
    side = ds.map_expr(F.format_string("side-%d", "v").alias("s"))
    assert dict(main.df.dtypes)["v"] == "int"
    assert dict(side.df.dtypes)["s"] == "string"
    assert sorted(r["v"] for r in main.df.collect()) == [1, 2, 3, 4, 5]
    assert sorted(r["s"] for r in side.df.collect()) == [
        "side-1", "side-2", "side-3", "side-4", "side-5"
    ]


# ---------------------------------------------------------------------------
# BroadcastStateITCase.java:51 testKeyedWithBroadcastTranslation — a keyed
# stream connected to a broadcast control stream: when each keyed element's
# timer fires, it must see the COMPLETE broadcast map {k: "test:k"} and emit
# one row. Spark mapping (streaming/broadcast_state.py): the control table
# re-broadcasts per micro-batch; with the control rows in place, every keyed
# element joins the full map — one output per element, each matched to its
# own entry, and the per-batch rules snapshot equals the expected state.
# ---------------------------------------------------------------------------


def test_broadcast_state_keyed_translation_golden(spark, tmp_path):
    from flink_1_6_0_spark.sources.stream import read_parquet_stream
    from flink_1_6_0_spark.streaming.broadcast_state import broadcast_rules_join

    expected = {k: f"test:{k}" for k in range(6)}
    rules_path = str(tmp_path / "rules")
    from_elements(
        spark, [(k, v) for k, v in expected.items()], "k long, txt string"
    ).write.parquet(rules_path)
    src = str(tmp_path / "src")
    from_elements(spark, [(k,) for k in range(6)], "k long").coalesce(1).write.parquet(src)

    got: list[tuple[int, str]] = []
    snapshots: list[dict] = []

    def sink(df, epoch):
        rows = df.collect()
        got.extend((r["k"], r["txt"]) for r in rows)
        snapshots.append({r["k"]: r["txt"] for r in spark.read.parquet(rules_path).collect()})

    q = broadcast_rules_join(
        read_parquet_stream(spark, src), spark, rules_path, "k", sink
    )
    q.processAllAvailable()
    q.stop()
    # TestSink: exactly expected.size() outputs; onTimer: each key sees its
    # own entry and the broadcast state equals the full expected map
    assert sorted(got) == sorted(expected.items())
    assert all(s == expected for s in snapshots)


# ---------------------------------------------------------------------------
# DataStreamPojoITCase.java — composite/nested field expressions on keyed
# rolling aggregates (FLINK-3697). KeyedStream.sum in Flink is a ROLLING
# aggregate (StreamGroupedReduce + SumAggregator): one emission per input,
# the aggregated field running, the other fields carried from the key's
# first element — including NESTED field paths like "stats.count".
# ---------------------------------------------------------------------------

_POJO_ROWS = [
    # Data(aaa, abc, wxyz): sum=1, stats.count=123 (DataStreamPojoITCase.java:36)
    (1, a, b, w, {"count": 123}) for (a, b, w) in
    [(0, 0, 0), (0, 0, 0), (1, 1, 1), (1, 1, 1), (2, 2, 3), (2, 2, 3)]
]
_POJO_ROWS = [(i,) + r for i, r in enumerate(_POJO_ROWS)]
_POJO_SCHEMA = "seq int, sum int, aaa int, abc int, wxyz long, stats struct<count:long>"


def test_pojo_composite_key_rolling_sum(spark):
    """DataStreamPojoITCase.java:47 testCompositeKeyOnNestedPojo — first
    emission per (aaa, abc, wxyz) has sum 1, the second sum 2, keys intact."""
    df = spark.createDataFrame(_POJO_ROWS, _POJO_SCHEMA)
    out = (
        DataStream(df)
        .key_by("aaa", "abc", "wxyz")
        .rolling_sum("sum", order_by=["seq"])
        .df.orderBy("seq")
        .collect()
    )
    seen: dict = {}
    for r in out:
        k = (r["aaa"], r["abc"], r["wxyz"])
        if k not in seen:
            seen[k] = r
            assert r["sum"] == 1, "Expected the sum to be one"
        else:
            assert r["sum"] == 2, "Expected the sum to be two"
            assert (seen[k]["aaa"], seen[k]["abc"], seen[k]["wxyz"]) == k
    assert len(seen) == 3


def test_pojo_nested_key_rolling_sum(spark):
    """DataStreamPojoITCase.java:88 testNestedKeyOnNestedPojo — a NESTED
    field ("stats.count") as part of the key; stats.count rides unchanged."""
    df = spark.createDataFrame(_POJO_ROWS, _POJO_SCHEMA)
    out = (
        DataStream(df)
        .key_by("aaa", "stats.count")
        .rolling_sum("sum", order_by=["seq"])
        .df.orderBy("seq")
        .collect()
    )
    firsts: dict = {}
    for r in out:
        assert r["stats"]["count"] == 123, "Wrong value for value.stats.count"
        if r["aaa"] not in firsts:
            firsts[r["aaa"]] = r
            assert r["sum"] == 1
        else:
            assert r["sum"] == 2


def test_pojo_nested_field_accessor_rolling_sum(spark):
    """DataStreamPojoITCase.java:131 testNestedPojoFieldAccessor — summing
    the nested field itself: 123 then 246, updated IN PLACE in the struct."""
    df = spark.createDataFrame(_POJO_ROWS, _POJO_SCHEMA)
    out = (
        DataStream(df)
        .key_by("aaa")
        .rolling_sum("stats.count", order_by=["seq"])
        .df.orderBy("seq")
        .collect()
    )
    firsts: set = set()
    for r in out:
        if r["aaa"] not in firsts:
            firsts.add(r["aaa"])
            assert r["stats"]["count"] == 123, "Expected stats.count to be 123"
        else:
            assert r["stats"]["count"] == 2 * 123, "Expected stats.count to be 2 * 123"


def test_pojo_invalid_nested_field_raises(spark):
    """DataStreamPojoITCase.java:159 testFailOnNestedPojoFieldAccessor —
    InvalidFieldReferenceException analog."""
    df = spark.createDataFrame(_POJO_ROWS, _POJO_SCHEMA)
    with pytest.raises(ValueError, match="Invalid field reference"):
        DataStream(df).key_by("aaa", "stats.count").rolling_sum(
            "stats.nonExistingField", order_by=["seq"]
        )
