"""Descriptor-based table registration — SURVEY.md §2.1.

Reference: flink-table org/apache/flink/table/descriptors/ +
TableEnvironment.connect (api/TableEnvironment.scala:554): the fluent
``tableEnv.connect(FileSystem().path(p)).with_format(Csv()...)
.with_schema(Schema()...).register_table_source(name)`` registration path
of Flink 1.6 (the declarative alternative to registerTableSource).

The facade collects the same properties the reference's DescriptorProperties
would and materializes them as one ``spark.read``/``spark.readStream`` —
formats and schema resolve to the engine's built-in readers, so the scan
keeps pushdown/pruning. Kafka stays call-shape-only like sources.stream
(no broker/jar in this image).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType, _parse_datatype_string

# Flink 1.6 type strings (Types.scala) → Spark DDL types
_TYPE_MAP = {
    "STRING": "string", "VARCHAR": "string", "BOOLEAN": "boolean",
    "BYTE": "tinyint", "TINYINT": "tinyint", "SHORT": "smallint",
    "SMALLINT": "smallint", "INT": "int", "LONG": "bigint",
    "BIGINT": "bigint", "FLOAT": "float", "DOUBLE": "double",
    "DECIMAL": "decimal(38,18)", "SQL_DATE": "date", "DATE": "date",
    "SQL_TIMESTAMP": "timestamp", "TIMESTAMP": "timestamp",
}


def _spark_type(flink_type: str) -> str:
    return _TYPE_MAP.get(flink_type.upper(), flink_type)


class ConnectorDescriptor:
    """descriptors/ConnectorDescriptor.scala — base of FileSystem/Kafka."""


class FileSystem(ConnectorDescriptor):
    """descriptors/FileSystem.scala: ``FileSystem().path(p)``."""

    def __init__(self):
        self._path: str | None = None

    def path(self, p: str) -> "FileSystem":
        self._path = p
        return self


class Kafka(ConnectorDescriptor):
    """Kafka connector descriptor (call-shape; requires the
    spark-sql-kafka package at runtime, like sources.stream.kafka_stream)."""

    def __init__(self):
        self._topic = self._bootstrap = None

    def topic(self, t: str) -> "Kafka":
        self._topic = t
        return self

    def property(self, key: str, value: str) -> "Kafka":
        if key == "bootstrap.servers":
            self._bootstrap = value
        return self


class FormatDescriptor:
    pass


class Csv(FormatDescriptor):
    """descriptors/Csv.scala: field list + delimiter/header options."""

    def __init__(self):
        self._fields: list[tuple[str, str]] = []
        self._delim = ","
        self._header = False

    def field(self, name: str, flink_type: str) -> "Csv":
        self._fields.append((name, _spark_type(flink_type)))
        return self

    def field_delimiter(self, d: str) -> "Csv":
        self._delim = d
        return self

    def ignore_first_line(self) -> "Csv":
        self._header = True
        return self


class Json(FormatDescriptor):
    """descriptors/Json analog (flink-formats/flink-json): the record schema
    comes from the declared Schema (or engine inference for batch reads)."""

    def derive_schema(self) -> "Json":
        """Fluent no-op kept for reference-API parity — schema derivation
        from the declared Schema is ALWAYS on here (``_read`` consults only
        ``with_schema``)."""
        return self


class Rowtime:
    """descriptors/Rowtime.scala: event-time column + bounded watermark."""

    def __init__(self):
        self._field: str | None = None
        self._delay_ms = 0

    def timestamps_from_field(self, name: str) -> "Rowtime":
        self._field = name
        return self

    def watermarks_periodic_bounded(self, delay_ms: int) -> "Rowtime":
        self._delay_ms = delay_ms
        return self


class Schema:
    """descriptors/Schema.scala: field(name, type) chain + rowtime."""

    def __init__(self):
        self._fields: list[tuple[str, str]] = []
        self._rowtime: Rowtime | None = None

    def field(self, name: str, flink_type: str) -> "Schema":
        self._fields.append((name, _spark_type(flink_type)))
        return self

    def rowtime(self, rt: Rowtime) -> "Schema":
        self._rowtime = rt
        return self

    def to_struct(self) -> StructType:
        return StructType(
            [StructField(n, _parse_datatype_string(t), True) for n, t in self._fields]
        )


class ConnectTableDescriptor:
    """descriptors/ConnectTableDescriptor.scala: accumulates connector +
    format + schema + update mode, then registers."""

    def __init__(self, table_env, connector: ConnectorDescriptor):
        self._env = table_env
        self._connector = connector
        self._format: FormatDescriptor | None = None
        self._schema: Schema | None = None
        self._streaming = False

    def with_format(self, fmt: FormatDescriptor) -> "ConnectTableDescriptor":
        self._format = fmt
        return self

    def with_schema(self, schema: Schema) -> "ConnectTableDescriptor":
        self._schema = schema
        return self

    def in_append_mode(self) -> "ConnectTableDescriptor":
        """StreamTableDescriptor.inAppendMode — read as a stream."""
        self._streaming = True
        return self

    def _read(self) -> DataFrame:
        spark = self._env.spark
        if isinstance(self._connector, Kafka):
            if not self._connector._bootstrap or not self._connector._topic:
                raise ValueError(
                    "Kafka descriptor needs .topic(...) and "
                    ".property('bootstrap.servers', ...)"
                )
            from flink_1_6_0_spark.sources.stream import kafka_stream

            return kafka_stream(spark, self._connector._bootstrap, self._connector._topic)
        if not isinstance(self._connector, FileSystem) or self._connector._path is None:
            raise ValueError("connector must be FileSystem().path(...) or Kafka()")
        path = self._connector._path
        reader = spark.readStream if self._streaming else spark.read
        if isinstance(self._format, Csv):
            if not self._format._fields and not (self._schema and self._schema._fields):
                # the reference requires declared fields; a bare Csv() would
                # silently register a zero-column view
                raise ValueError("Csv format needs field(...) calls or a with_schema(...)")
            schema = StructType(
                [
                    StructField(n, _parse_datatype_string(t), True)
                    for n, t in self._format._fields
                ]
            )
            if self._schema and self._schema._fields:
                schema = self._schema.to_struct()
            return reader.csv(
                path, schema=schema, sep=self._format._delim, header=self._format._header
            )
        if isinstance(self._format, Json):
            if self._schema and self._schema._fields:
                return reader.schema(self._schema.to_struct()).json(path)
            if self._streaming:
                raise ValueError("streaming JSON needs an explicit Schema")
            return reader.json(path)
        raise ValueError("with_format(Csv()|Json()) is required for FileSystem")

    def register_table_source(self, name: str) -> DataFrame:
        """registerTableSource — reads per the descriptors and registers the
        view; a declared Rowtime also lands in the env's time-attribute
        registry (rowtime column + bounded-out-of-orderness delay)."""
        df = self._read()
        df.createOrReplaceTempView(name)
        sch = self._schema
        if sch is not None and sch._rowtime is not None and sch._rowtime._field:
            delay_s = sch._rowtime._delay_ms / 1000.0
            self._env.register_rowtime(name, sch._rowtime._field, f"{delay_s} seconds")
        return df
