"""Avro Object Container File support — pure-Python codec over the public
Avro 1.x specification (https://avro.apache.org/docs/1.11.1/specification/).

Reference surface: flink-formats/flink-avro AvroInputFormat.java /
AvroOutputFormat.java (container-file read/write) and
AvroRowSerializationSchema.java (Row <-> record mapping). The image ships
only the avro *core* jars — Spark's `format("avro")` DataSource (the
external spark-avro module) is absent — so this module implements the
container format itself:

- binary encoding: zigzag-varint ints/longs, little-endian IEEE floats,
  length-prefixed bytes/strings, field-concatenated records, block-encoded
  arrays/maps, index-prefixed unions (nullable columns = ["null", T]);
- container framing: `Obj\\x01` magic, file-metadata map carrying
  avro.schema / avro.codec, 16-byte sync marker, per-block row count +
  byte size + payload + sync; codecs `null` and `deflate` (raw zlib,
  wbits=-15 per the spec);
- logical types: date (int days), timestamp-micros (long).

Scale: reads distribute one file per task via Spark's `binaryFile` source
+ `mapInPandas` (Arrow-batched decode); writes emit one container file per
partition (TaskContext.partitionId names the file) — the same
file-per-split parallelism as the reference's AvroInputFormat/
AvroOutputFormat. Block-level splitting within one huge file is NOT
implemented (document: write many medium files, the norm for 100 TB
layouts). Unsupported Spark types (decimal, struct-in-map keys other than
string) raise.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# Schema conversion: Spark StructType <-> Avro record schema (JSON)
# ---------------------------------------------------------------------------

_PRIMITIVES = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def spark_to_avro_schema(schema: T.StructType, name: str = "topLevelRecord") -> dict:
    def field_type(dt: T.DataType, nullable: bool, path: str):
        avro = _convert(dt, path)
        return ["null", avro] if nullable else avro

    def _convert(dt: T.DataType, path: str):
        for cls, prim in _PRIMITIVES.items():
            if isinstance(dt, cls):
                return prim
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.ArrayType):
            return {
                "type": "array",
                "items": field_type(dt.elementType, dt.containsNull, path + ".item"),
            }
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise TypeError(f"avro map keys must be string at {path}")
            return {
                "type": "map",
                "values": field_type(dt.valueType, dt.valueContainsNull, path + ".value"),
            }
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": path.replace(".", "_"),
                "fields": [
                    {
                        "name": f.name,
                        "type": field_type(f.dataType, f.nullable, f"{path}.{f.name}"),
                    }
                    for f in dt.fields
                ],
            }
        raise TypeError(f"unsupported Spark type for avro: {dt} at {path}")

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": field_type(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


def avro_to_spark_schema(avro: dict) -> T.StructType:
    def _convert(a) -> tuple[T.DataType, bool]:
        """Returns (sparkType, nullable)."""
        if isinstance(a, list):  # union — only [null, T] / [T, null] supported
            branches = [b for b in a if b != "null"]
            if len(branches) != 1:
                raise TypeError(f"unsupported avro union {a}")
            dt, _ = _convert(branches[0])
            return dt, True
        if isinstance(a, dict) and a.get("logicalType") == "date":
            return T.DateType(), False
        if isinstance(a, dict) and a.get("logicalType") in ("timestamp-micros", "timestamp-millis"):
            return T.TimestampType(), False
        if isinstance(a, dict):
            kind = a["type"]
            if kind == "array":
                dt, nullable = _convert(a["items"])
                return T.ArrayType(dt, nullable), False
            if kind == "map":
                dt, nullable = _convert(a["values"])
                return T.MapType(T.StringType(), dt, nullable), False
            if kind == "record":
                fields = []
                for f in a["fields"]:
                    dt, nullable = _convert(f["type"])
                    fields.append(T.StructField(f["name"], dt, nullable))
                return T.StructType(fields), False
            a = kind  # {"type": "string"} style primitive
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "string": T.StringType(),
            "bytes": T.BinaryType(),
        }.get(a)
        if prim is None:
            raise TypeError(f"unsupported avro type {a!r}")
        return prim, False

    dt, _ = _convert(avro)
    if not isinstance(dt, T.StructType):
        raise TypeError("top-level avro schema must be a record")
    return dt


# ---------------------------------------------------------------------------
# Binary encoding (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def _write_long(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def _read_long(buf) -> int:
    shift, acc = 0, 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _is_null(value) -> bool:
    """Null check that survives the pandas trip: None, NaN (Arrow renders a
    null int/double cell as float nan), NaT, and pd.NA all mean SQL NULL."""
    if value is None:
        return True
    if isinstance(value, float):
        return value != value
    try:
        import pandas as pd

        return value is pd.NaT or value is pd.NA
    except ImportError:  # pragma: no cover
        return False


def _encode(buf: io.BytesIO, avro, value) -> None:
    if isinstance(avro, list):  # union
        if _is_null(value):
            idx = avro.index("null")
            _write_long(buf, idx)
            return
        branches = [(i, b) for i, b in enumerate(avro) if b != "null"]
        idx, branch = branches[0]
        _write_long(buf, idx)
        _encode(buf, branch, value)
        return
    logical = avro.get("logicalType") if isinstance(avro, dict) else None
    kind = avro["type"] if isinstance(avro, dict) else avro
    if kind == "null":
        return
    if kind == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif kind == "int" or kind == "long":
        if logical == "date":
            import datetime

            value = (value - datetime.date(1970, 1, 1)).days
        elif logical == "timestamp-micros":
            import pandas as pd

            value = int(pd.Timestamp(value).value // 1_000)
        _write_long(buf, int(value))
    elif kind == "float":
        buf.write(struct.pack("<f", float(value)))
    elif kind == "double":
        buf.write(struct.pack("<d", float(value)))
    elif kind == "string":
        raw = str(value).encode("utf-8")
        _write_long(buf, len(raw))
        buf.write(raw)
    elif kind == "bytes":
        raw = bytes(value)
        _write_long(buf, len(raw))
        buf.write(raw)
    elif kind == "array":
        items = list(value)
        if items:
            _write_long(buf, len(items))
            for it in items:
                _encode(buf, avro["items"], it)
        _write_long(buf, 0)
    elif kind == "map":
        entries = dict(value)
        if entries:
            _write_long(buf, len(entries))
            for k, v in entries.items():
                _encode(buf, "string", k)
                _encode(buf, avro["values"], v)
        _write_long(buf, 0)
    elif kind == "record":
        for f in avro["fields"]:
            fv = value.get(f["name"]) if isinstance(value, dict) else getattr(value, f["name"])
            _encode(buf, f["type"], fv)
    else:
        raise TypeError(f"unsupported avro type {avro!r}")


def _decode(buf, avro):
    if isinstance(avro, list):  # union
        idx = _read_long(buf)
        branch = avro[idx]
        if branch == "null":
            return None
        return _decode(buf, branch)
    logical = avro.get("logicalType") if isinstance(avro, dict) else None
    kind = avro["type"] if isinstance(avro, dict) else avro
    if kind == "null":
        return None
    if kind == "boolean":
        return buf.read(1) == b"\x01"
    if kind in ("int", "long"):
        v = _read_long(buf)
        if logical == "date":
            import datetime

            return datetime.date(1970, 1, 1) + datetime.timedelta(days=v)
        if logical == "timestamp-micros":
            import pandas as pd

            return pd.Timestamp(v, unit="us")
        if logical == "timestamp-millis":
            import pandas as pd

            return pd.Timestamp(v, unit="ms")
        return v
    if kind == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if kind == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if kind == "string":
        return buf.read(_read_long(buf)).decode("utf-8")
    if kind == "bytes":
        return buf.read(_read_long(buf))
    if kind == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix (spec: skippable blocks)
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(_decode(buf, avro["items"]))
    if kind == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _decode(buf, "string")
                out[k] = _decode(buf, avro["values"])
    if kind == "record":
        return {f["name"]: _decode(buf, f["type"]) for f in avro["fields"]}
    raise TypeError(f"unsupported avro type {avro!r}")


# ---------------------------------------------------------------------------
# Container file framing
# ---------------------------------------------------------------------------


def write_container(records, avro_schema: dict, codec: str = "deflate") -> bytes:
    """Serialize records (dicts matching the record schema) into one Avro
    Object Container File (header + single block + sync)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(avro_schema).encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _encode(out, "string", k)
        _encode(out, "bytes", v)
    _write_long(out, 0)
    out.write(sync)

    payload = io.BytesIO()
    n = 0
    for rec in records:
        _encode(payload, avro_schema, rec)
        n += 1
    raw = payload.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)  # raw deflate per spec
        raw = comp.compress(raw) + comp.flush()
    if n:
        _write_long(out, n)
        _write_long(out, len(raw))
        out.write(raw)
        out.write(sync)
    return out.getvalue()


def _read_header(buf) -> tuple[dict, str, bytes]:
    """Parse the container header -> (schema, codec, sync marker)."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            _read_long(buf)
        for _ in range(n):
            k = _decode(buf, "string")
            meta[k] = _decode(buf, "bytes")
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    return schema, codec, buf.read(16)


def read_schema(data: bytes) -> dict:
    """Header-only parse (cheap schema sniff — no block decode)."""
    schema, _, _ = _read_header(io.BytesIO(data))
    return schema


def read_container(data: bytes) -> tuple[dict, list[dict]]:
    """Parse one container file -> (avro schema, records)."""
    buf = io.BytesIO(data)
    schema, codec, sync = _read_header(buf)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("avro block sync marker mismatch (corrupt file)")
    return schema, records
