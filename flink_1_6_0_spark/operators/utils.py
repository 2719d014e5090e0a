"""DataSet utility operators — index assignment and sampling.

Reference parity: flink-java DataSetUtils
(flink-java/src/main/java/org/apache/flink/api/java/utils/DataSetUtils.java):
- zipWithIndex (:54) — two-phase: count elements per partition, broadcast the
  per-partition offsets, then assign ``offset + local position``.
- zipWithUniqueId (:95) — unique but non-consecutive labels from
  (counter << shifter) + taskId, one pass.
- sample / sampleWithSize (:179, :216) — Bernoulli/reservoir sampling.

Spark-first translations that keep the same scale behavior:
- ``zip_with_index`` reproduces the two-phase plan with DataFrame ops: an
  optional range-repartition by the order key, a per-partition count (tiny
  shuffle of #partitions rows), and a window ``row_number`` WITHIN each
  partition — no global single-partition sort, which is what a naive
  ``row_number() OVER (ORDER BY …)`` would do and what dies at 100 TB.
- ``zip_with_unique_id`` is ``monotonically_increasing_id()`` — Spark's
  built-in is exactly Flink's (partitionId << shift) + counter scheme.
- ``deterministic_sample`` is hash-gated (md5-portable), not RNG-gated:
  reproducible across runs/engines and cluster-size independent — the
  property a training-data pipeline actually needs from sampling.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def count_elements_per_partition(df: DataFrame) -> DataFrame:
    """DataSetUtils.countElementsPerPartition (DataSetUtils.java:47): one
    (partition_id, count) row per physical partition — the first phase of
    zipWithIndex, exposed as its own utility. Map-side combined: the groupBy
    on spark_partition_id() reduces each partition to one row before the
    tiny #partitions-row shuffle."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def checksum_hash_code(df: DataFrame, hash_col: Column | str | None = None) -> DataFrame:
    """Utils.ChecksumHashCode via DataSetUtils.checksumHashCode
    (DataSetUtils.java:150; flink-java Utils.java ChecksumHashCodeHelper):
    one row (count, checksum) where checksum = Σ element hashCodes.

    ``hash_col`` is the hash expression; None = Java semantics for a
    single-column integral frame (Integer/Long.hashCode == the value, so the
    checksum is the plain column sum — DataSetUtilsITCase.java:110's golden:
    15 ints summing 55). Pass an explicit expression for other types."""
    if hash_col is None:
        if len(df.columns) != 1:
            raise ValueError("checksum_hash_code: pass hash_col for multi-column frames")
        hash_col = F.col(df.columns[0]).cast("long")
    elif isinstance(hash_col, str):
        hash_col = F.col(hash_col).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(hash_col).alias("checksum")
    )


def zip_with_index(df: DataFrame, order_col: str, index_name: str = "idx") -> DataFrame:
    """Dense 0-based index in ``order_col`` order (DataSetUtils.zipWithIndex:54).

    Two-phase, no global sort bottleneck:
    1. range-repartition by the key → partitions hold contiguous key ranges;
    2. count rows per partition (shuffles #partitions rows, not data);
    3. cumulative offsets broadcast back; index = offset + local row_number.
    """
    ranged = df.repartitionByRange(F.col(order_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    # Per-partition counts → cumulative offset per partition (tiny frame).
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    local = Window.partitionBy("_pid").orderBy(order_col)
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(index_name, (F.row_number().over(local) - 1 + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_offset")
    )


def zip_with_unique_id(df: DataFrame, index_name: str = "uid") -> DataFrame:
    """Unique, non-consecutive 64-bit ids (DataSetUtils.zipWithUniqueId:95).
    Spark's monotonically_increasing_id is the same (partition << 33) + counter
    scheme — one narrow pass, no shuffle."""
    return df.withColumn(index_name, F.monotonically_increasing_id())


def portable_hash(col: Column) -> Column:
    """Engine-portable 60-bit hash (md5 hex → bigint; matches DuckDB
    ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key: Column, rate_permille: Column | int, salt: str = ""
) -> DataFrame:
    """Keep a row iff hash(key, salt) mod 1000 < rate_permille.

    Unlike ``df.sample()`` (RNG seeded per partition → result depends on the
    physical split), the hash gate is a pure function of the data: stable
    under repartitioning, re-runs, and engine changes — reproducible
    train-data subsets (DataSetUtils.sample:179 semantics, determinism added).
    ``rate_permille`` may be a per-row Column for stratified designs.
    """
    rate = F.lit(rate_permille) if isinstance(rate_permille, int) else rate_permille
    gate = F.pmod(portable_hash(F.concat(key.cast("string"), F.lit(salt))), F.lit(1000))
    return df.filter(gate < rate)


def split_assign(
    df: DataFrame,
    key: str,
    splits: dict[str, int],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in exactly one
    named split by its hash bucket (permille ranges over the same
    engine-portable md5 gate as ``deterministic_sample``). Pure projection —
    no shuffle, no RNG, stable under re-partitioning and re-runs, so a
    100 TB corpus splits identically on every cluster.

    ``splits``: name → permille, must sum to <= 1000; rows above the last
    range get NULL (held out)."""
    if sum(splits.values()) > 1000:
        raise ValueError("split permilles exceed 1000")
    gate = F.pmod(portable_hash(F.concat(F.col(key).cast("string"), F.lit(salt))), F.lit(1000))
    expr = F.lit(None).cast("string")
    lo = 0
    conds = []
    for name, permille in splits.items():
        conds.append((lo, lo + permille, name))
        lo += permille
    for a, b, name in reversed(conds):
        expr = F.when((gate >= a) & (gate < b), F.lit(name)).otherwise(expr)
    return df.select("*", expr.alias("split"))


def corpus_shuffle_key(df: DataFrame, key: str, salt: str = "shuffle") -> DataFrame:
    """Deterministic global shuffle order for training: a portable-hash sort
    key (md5 of id+salt). Downstream writers sort WITHIN shards by it
    (shard via doc_shard_assign / pack_sequences) — the pseudo-random
    training order every epoch pipeline needs, reproducible across engines
    and cluster layouts, without a global sort."""
    return df.select(
        "*",
        portable_hash(F.concat(F.col(key).cast("string"), F.lit(salt))).alias("shuffle_key"),
    )


def sample_n_per_key(df: DataFrame, key: str, id_col: str, n: int, salt: str = "pick") -> DataFrame:
    """Uniform-without-replacement sample of ``n`` rows per key, deterministic:
    rank by the portable md5 hash of the row id inside each key and keep the
    first ``n``. No RNG state, stable across engines/partitionings (the
    'inspect 1000 random docs per source' operator); one hash shuffle on the
    key — the same cost as any per-key top-n."""
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(key).orderBy(
            portable_hash(F.concat(F.col(id_col).cast("string"), F.lit(salt))).asc(),
            F.col(id_col).asc(),
        )
    )
    return df.withColumn("__rk", rk).filter(F.col("__rk") <= n).drop("__rk")


def skew_report(df: DataFrame, key: str | list[str], top_n: int = 20) -> DataFrame:
    """Join-key skew diagnostic — the pre-flight check before shuffling
    100 TB on ``key`` (a column name or a composite-key list): the ``top_n``
    heaviest keys with their row count, corpus share, skew factor
    (count / mean-per-key) and a suggested salt fan-out
    (``ceil(skew_factor)``, the split count that levels that key's
    partition to the average — feed it to joins.skew_salted_join or rely on
    AQE's skew splitting past it).

    Shape: one map-side-combined groupBy on the key (the same shuffle the
    join itself would do), a broadcast 1-row stats frame, TakeOrdered for
    the top-n — never a global sort or a driver-side histogram.
    """
    keys = [key] if isinstance(key, str) else list(key)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    stats = counts.agg(
        F.sum("n").alias("__total"), F.avg("n").alias("__mean")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *keys,
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(F.col("n") / F.col("__mean"), 3).alias("skew_factor"),
            F.ceil(F.col("n") / F.col("__mean")).cast("int").alias("suggested_salts"),
        )
        # NULL keys (advertised: a NULL join key is a real group here) sort
        # LAST on the tiebreak — pinned explicitly because engines disagree
        # on ASC NULL order (Spark: first, DuckDB/ANSI default: last) and a
        # NULL tying on n at the limit boundary must pick the same rows
        # everywhere (round-7 advice)
        .orderBy(F.desc("n"), *[F.asc_nulls_last(k) for k in keys])
        .limit(top_n)
    )


def summarize(df: DataFrame) -> DataFrame:
    """DataSetUtils.summarize (flink-java utils/DataSetUtils.java +
    summarize/aggregation/NumericSummaryAggregator.java): per-NUMERIC-column
    statistics — non-missing / missing counts, min, max, sum, mean,
    variance, standard deviation. Variance is the SAMPLE variance
    (m2/(n-1), NumericSummaryAggregator.java:134), matching var_samp.

    Missing semantics follow the reference exactly (r12,
    NumericSummaryAggregator.java:60 aggregate(): null, NaN AND ±Infinity
    all count as missing and are EXCLUDED from min/max/sum/mean/variance —
    DataSetUtilsITCase.java:121's golden has nonMissing 6 / missing 2 for a
    double column carrying one Infinity and one NaN, with a FINITE max).

    One scan: every column's aggregates run in a single agg pass; the
    per-column rows come from exploding a schema-sized struct array — no
    driver loop over data, and column count (not row count) bounds the
    expression size. All stats are cast to double for a uniform row type.
    """
    from pyspark.sql.types import DoubleType, FloatType, NumericType

    num_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)]
    if not num_cols:
        raise ValueError("summarize: no numeric columns")
    floaty = {
        f.name for f in df.schema.fields if isinstance(f.dataType, (FloatType, DoubleType))
    }
    aggs = []
    for c in num_cols:
        cc = F.col(c)
        if c in floaty:
            # NaN / ±Infinity -> missing (NULL), like the reference
            cc = F.when(~(F.isnan(cc) | (F.abs(cc) == float("inf"))), cc)
        aggs.extend(
            [
                F.count(cc).alias(f"__nm_{c}"),
                (F.count(F.lit(1)) - F.count(cc)).alias(f"__ms_{c}"),
                F.min(cc).cast("double").alias(f"__mn_{c}"),
                F.max(cc).cast("double").alias(f"__mx_{c}"),
                F.sum(cc).cast("double").alias(f"__sm_{c}"),
                F.avg(cc).cast("double").alias(f"__av_{c}"),
                F.var_samp(cc).cast("double").alias(f"__vr_{c}"),
                F.stddev_samp(cc).cast("double").alias(f"__sd_{c}"),
            ]
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__nm_{c}").alias("non_missing"),
            F.col(f"__ms_{c}").alias("missing"),
            F.col(f"__mn_{c}").alias("min"),
            F.col(f"__mx_{c}").alias("max"),
            F.col(f"__sm_{c}").alias("sum"),
            F.col(f"__av_{c}").alias("mean"),
            F.col(f"__vr_{c}").alias("variance"),
            F.col(f"__sd_{c}").alias("std_dev"),
        )
        for c in num_cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def summarize_strings(df: DataFrame) -> DataFrame:
    """StringColumnSummary (summarize/StringColumnSummary.java:29-36): per
    STRING column — non-null / null / empty counts, min/max/mean length.
    Same one-scan struct-explode shape as ``summarize``."""
    from pyspark.sql.types import StringType

    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    if not cols:
        raise ValueError("summarize_strings: no string columns")
    aggs = []
    for c in cols:
        ln = F.length(c)
        aggs.extend(
            [
                F.count(c).alias(f"__nn_{c}"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"__nl_{c}"),
                F.count(F.when(F.col(c) == "", 1)).alias(f"__em_{c}"),
                F.min(ln).alias(f"__mn_{c}"),
                F.max(ln).alias(f"__mx_{c}"),
                F.avg(ln).alias(f"__av_{c}"),
            ]
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__nn_{c}").alias("non_null"),
            F.col(f"__nl_{c}").alias("nulls"),
            F.col(f"__em_{c}").alias("empty"),
            F.col(f"__mn_{c}").alias("min_length"),
            F.col(f"__mx_{c}").alias("max_length"),
            F.col(f"__av_{c}").alias("mean_length"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def summarize_booleans(df: DataFrame) -> DataFrame:
    """BooleanColumnSummary (summarize/BooleanColumnSummary.java:29-34):
    true / false / null counts per BOOLEAN column."""
    from pyspark.sql.types import BooleanType

    cols = [f.name for f in df.schema.fields if isinstance(f.dataType, BooleanType)]
    if not cols:
        raise ValueError("summarize_booleans: no boolean columns")
    aggs = []
    for c in cols:
        aggs.extend(
            [
                F.count(F.when(F.col(c), 1)).alias(f"__t_{c}"),
                F.count(F.when(~F.col(c), 1)).alias(f"__f_{c}"),
                (F.count(F.lit(1)) - F.count(c)).alias(f"__n_{c}"),
            ]
        )
    one = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__t_{c}").alias("true_count"),
            F.col(f"__f_{c}").alias("false_count"),
            F.col(f"__n_{c}").alias("null_count"),
        )
        for c in cols
    ]
    return one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")
