"""Session management — the analog of Flink's ExecutionEnvironment/TableEnvironment.

Reference surface: StreamExecutionEnvironment (flink-streaming-java/.../
StreamExecutionEnvironment.java) and TableEnvironment
(flink-table/.../api/TableEnvironment.scala). In this engine a single
SparkSession carries both batch and streaming; the TableEnvironment wrapper
adds the catalog, the SQL front-end shim (TUMBLE/HOP/SESSION), time-attribute
registration, and UDF registration.

Scale notes (100 TB design intent):
- AQE on: runtime re-planning, skew-join splitting, dynamic coalescing.
- shuffle.partitions defaults to cores locally; on a real cluster set it to
  2-3x total executor cores (AQE coalesces down from there).
- UTC session timezone pins timestamp semantics to the parquet storage values
  (and to the DuckDB oracle).
- Arrow enabled: every pandas-UDF boundary is vectorized batch transfer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "flink-1.6.0-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the tuned SparkSession.

    Mirrors StreamExecutionEnvironment.getExecutionEnvironment
    (StreamExecutionEnvironment.java:1588) — a process-wide environment the
    rest of the API hangs off.
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # -- correctness-critical --------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # -- scale / performance ---------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # TESTDATA's events.ts is TIMESTAMP(NANOS) parquet, which the vectorized
        # reader rejects; read as long and convert in the catalog loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Streaming state store: RocksDB would be the 100TB choice; the local
        # image ships the default HDFS-backed store which is fine for tests.
        .config("spark.sql.streaming.stateStore.compression.codec", "lz4")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


_STATE_BACKENDS = {
    # Flink state backends (state/memory/MemoryStateBackend.java,
    # filesystem/FsStateBackend.java) — Spark's default HDFS-backed store
    # keeps state on-heap with a checkpoint file per batch: same contract.
    "memory": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    "fs": "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    # flink-state-backends/flink-statebackend-rocksdb (incremental
    # checkpoints) — Spark ships a RocksDB provider whose changelog
    # checkpointing is the incremental-checkpoint analog. This is the 100 TB
    # choice: state larger than executor heap spills to local SSD.
    "rocksdb": "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
}


def set_state_backend(spark: SparkSession, backend: str) -> None:
    """env.setStateBackend(...) (StreamExecutionEnvironment.java:428) analog.

    Applies to streaming queries STARTED AFTER the call (the provider class is
    read at query start). ``rocksdb`` also enables changelog checkpointing —
    the incremental-checkpoint mode of the reference backend.
    """
    provider = _STATE_BACKENDS.get(backend.lower())
    if provider is None:
        raise ValueError(f"unknown state backend {backend!r}; choose from {sorted(_STATE_BACKENDS)}")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        str(backend.lower() == "rocksdb").lower(),
    )


class TableEnvironment:
    """Unified batch/stream table environment.

    Reference: flink-table/.../api/TableEnvironment.scala:646 (sqlQuery),
    :417/:437 (registerTable/registerTableSource), :337 (registerFunction).
    Here the Calcite pipeline is replaced by Catalyst; we only add the SQL
    front-end shim for Flink group-window syntax and the time-attribute
    registry (SURVEY.md §4.3 "needs custom work" items 1-2).
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        # table name -> rowtime column (event-time attribute + watermark delay)
        self._rowtime: dict[str, tuple[str, str]] = {}

    # -- catalog ---------------------------------------------------------
    def register_table(self, name: str, df: DataFrame) -> None:
        """registerTable (TableEnvironment.scala:417)."""
        df.createOrReplaceTempView(name)

    def register_parquet(self, name: str, path: str) -> DataFrame:
        """registerTableSource for a parquet source (CsvTableSource analog,
        flink-table/.../sources/CsvTableSource.scala:50 — parquet because the
        engine is columnar-first; CSV via ``sources.batch.read_csv``)."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import TimestampNTZType

        from flink_1_6_0_spark.catalog import normalize_table

        # route through the catalog's ns-timestamp normalization, then cast
        # any remaining TIMESTAMP_NTZ column to TIMESTAMP regardless of the
        # registered view name (normalize_table keys on 'events'): a raw NTZ
        # column breaks TUMBLE and withWatermark downstream, and under the
        # UTC session timezone the cast is value-preserving
        df = normalize_table(name, self.spark.read.parquet(path))
        for f in df.schema.fields:
            if isinstance(f.dataType, TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        df.createOrReplaceTempView(name)
        return df

    def register_rowtime(self, table: str, column: str, delay: str = "0 seconds") -> None:
        """Declare an event-time attribute + bounded-out-of-orderness watermark.

        Reference: DefinedRowtimeAttributes (flink-table/.../sources/
        definedTimeAttributes.scala:50) + BoundedOutOfOrderTimestamps
        (sources/wmstrategies/). In Spark this becomes
        ``df.withWatermark(column, delay)`` injected when the table is read
        as a stream (plans.time_attributes).
        """
        self._rowtime[table] = (column, delay)

    def rowtime_of(self, table: str) -> tuple[str, str] | None:
        return self._rowtime.get(table)

    # -- SQL -------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """sqlQuery (TableEnvironment.scala:646) with the Flink group-window
        front-end shim applied (TUMBLE/HOP/SESSION → window()/session_window())."""
        from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql

        return self.spark.sql(rewrite_flink_sql(query))

    # -- UDFs --------------------------------------------------------------
    def register_function(self, name: str, fn, return_type=None) -> None:
        """registerFunction (TableEnvironment.scala:337) for ScalarFunction.
        UDTF/UDAF registration lives in functions.udf."""
        self.spark.udf.register(name, fn, return_type)

    # -- catalog introspection / DML --------------------------------------
    def scan(self, name: str):
        """TableEnvironment.scan (TableEnvironment.scala:502): a registered
        table as a fluent Table."""
        from flink_1_6_0_spark.table_api import Table

        return Table(self.spark.table(name))

    def list_tables(self) -> list[str]:
        """listTables (TableEnvironment.scala:480)."""
        return sorted(t.name for t in self.spark.catalog.listTables())

    def explain(self, table_or_df) -> str:
        """TableEnvironment.explain: the optimized physical plan as a string
        (Catalyst's formatted explain replaces the AST/logical/physical
        triptych the reference prints)."""
        df = getattr(table_or_df, "df", table_or_df)
        return df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    def sql_update(self, stmt: str) -> None:
        """sqlUpdate (TableEnvironment.scala:715): INSERT INTO <table>
        <query> — the query side gets the same Flink-SQL front-end rewrite,
        the sink side appends via the DataFrameWriterV2 path."""
        import re as _re

        from flink_1_6_0_spark.plans.sql_frontend import rewrite_flink_sql

        # target = dot-separated segments, each bare or backquoted (mixed
        # quoting like db.`my t` is valid Spark SQL), optional column list;
        # whitespace before the query is optional after a column list. The
        # parenthesized group is a COLUMN LIST only when it is not itself a
        # query — `INSERT INTO t (SELECT ...)` is valid in both engines, so a
        # paren opening a SELECT/WITH/VALUES stays on the query side
        m = _re.match(
            r"\s*INSERT\s+INTO\s+"
            r"((?:`[^`]+`|\w+)(?:\.(?:`[^`]+`|\w+))*"
            r"(?:\s*\((?!\s*(?:SELECT|WITH|VALUES)\b)[^)]*\))?)\s*(.+)",
            stmt,
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m or not m.group(2).strip():
            raise ValueError("sql_update supports INSERT INTO <table> <query>")
        target, query = m.group(1), m.group(2).strip()
        # strip outer parens wrapping the whole query (the Flink-SQL
        # rewriter expects a bare SELECT/WITH/VALUES) — a level is removed
        # only when the opening paren's match IS the final character, so a
        # query like `(SELECT a) UNION (SELECT b)` is left untouched; the
        # strip LOOPS so `((SELECT ...))` also reaches the rewriter. The scan
        # skips quoted regions ('...' literals and "..." literals with
        # doubled-quote escapes, `...` identifiers) so parens INSIDE strings
        # don't derail the depth count (ADVICE r6: '"' was missing and only
        # one level was stripped)
        while query.startswith("(") and query.endswith(")"):
            depth, i, n = 0, 0, len(query)
            stripped = False
            while i < n:
                ch = query[i]
                if ch in ("'", '"', "`"):
                    i += 1
                    while i < n:
                        if query[i] == ch:
                            if ch in ("'", '"') and i + 1 < n and query[i + 1] == ch:
                                i += 2  # doubled-quote escape inside a literal
                                continue
                            break
                        i += 1
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        if i == n - 1:
                            query = query[1:-1].strip()
                            stripped = True
                        break
                i += 1
            if not stripped:
                break
        # the query half gets the Flink front-end rewrite, then the whole
        # statement runs as engine SQL (works for v1 and v2 catalog tables)
        self.spark.sql(f"INSERT INTO {target} {rewrite_flink_sql(query)}")

    def connect(self, connector):
        """TableEnvironment.connect (TableEnvironment.scala:554): start a
        descriptor-based registration — see flink_1_6_0_spark.descriptors."""
        from flink_1_6_0_spark.descriptors import ConnectTableDescriptor

        return ConnectTableDescriptor(self, connector)
