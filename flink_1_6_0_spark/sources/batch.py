"""Batch sources & sinks — SURVEY.md §2.1.

Reference surface → Spark reader/writer:
- env.fromElements/fromCollection (StreamExecutionEnvironment.java:704,772)
  → spark.createDataFrame
- env.generateSequence (:679) → spark.range
- env.readTextFile (:942) / CsvInputFormat / CsvTableSource
  (flink-table/.../sources/CsvTableSource.scala:50) → spark.read.text/csv
- JSON (JsonRowDeserializationSchema) → spark.read.json / from_json
- parquet (flink-formats/flink-parquet) → spark.read.parquet
- JDBC (flink-connectors JDBCInputFormat) → spark.read.format("jdbc")
- CsvTableSink / writeAsCsv (DataStream.java:1065) → df.write.csv
- BucketingSink partitioned output → df.write.partitionBy(...)

Pushdown contracts (ProjectableTableSource / FilterableTableSource,
flink-table/.../sources/*.scala) are DataSource-V2 built-ins here: parquet
scans receive pruned columns + pushed filters from Catalyst automatically
(verified in tests/test_plans.py by inspecting PushedFilters/ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession


def from_elements(spark: SparkSession, rows: Iterable, schema) -> DataFrame:
    """env.fromElements / fromCollection."""
    return spark.createDataFrame(list(rows), schema)


def generate_sequence(spark: SparkSession, start: int, end: int) -> DataFrame:
    """env.generateSequence — inclusive bounds like the reference."""
    return spark.range(start, end + 1).withColumnRenamed("id", "value")


def read_text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = False, delimiter: str = ",") -> DataFrame:
    """CsvTableSource — explicit schema strongly preferred (inferSchema scans twice)."""
    reader = spark.read.option("header", header).option("sep", delimiter)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC format (reference: flink-connectors/flink-orc OrcTableSource) —
    Spark-native columnar reader with the same pushdown contracts as parquet
    (predicate pushdown + column pruning reach the ORC scan)."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro format (reference: flink-formats/flink-avro). Spark's avro
    DataSource lives in the external spark-avro module; this image ships only
    the avro core jars, so the call shape is declared and gated."""
    try:
        return spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - depends on jar presence
        raise NotImplementedError(
            "spark-avro module jar not present in this image; "
            "add org.apache.spark:spark-avro to spark.jars.packages"
        ) from exc


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro module jar not present in this image; "
            "add org.apache.spark:spark-avro to spark.jars.packages"
        ) from exc


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    """JDBCInputFormat / JDBCTableSource (flink-connectors/flink-jdbc/.../
    JDBCInputFormat.java, JDBCTableSource). Works against any driver on the
    classpath; the Spark distribution ships embedded Derby (the Hive
    metastore's store), so ``jdbc:derby:...`` round-trips are tested in this
    image. At scale use ``partitionColumn``/``lowerBound``/``upperBound``/
    ``numPartitions`` options for a parallel partitioned read."""
    return spark.read.format("jdbc").option("url", url).option("dbtable", table).options(**options).load()


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", **options) -> None:
    """JDBCOutputFormat / JDBCAppendTableSink (flink-connectors/flink-jdbc/
    .../JDBCOutputFormat.java, JDBCAppendTableSink.java): batched inserts per
    partition (Spark's JDBC writer batches ``batchsize`` rows per round
    trip, one connection per partition — the reference's flush-interval
    analog)."""
    df.write.format("jdbc").option("url", url).option("dbtable", table).options(**options).mode(mode).save()


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = False) -> None:
    """CsvTableSink / writeAsCsv."""
    df.write.mode(mode).option("header", header).csv(path)


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).text(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    """BucketingSink-style partitioned columnar output."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
