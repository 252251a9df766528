"""Pure-Python Avro container-file writer/reader — the A17 fallback.

The reference's raw layer is Avro on HDFS (reference
spark/streaming-shorttime.py:73-78). Spark needs the external
``spark-avro`` datasource jar for ``df.write.format("avro")``; this
environment has no network and ships only the core Apache Avro *Java*
library (avro-1.12.1.jar), not the Spark datasource. Instead of leaving
the sink as a remedy-raising stub, this module implements the Avro 1.x
**object container file** format (a public, stable spec) directly:

* ``write_avro(df, path)`` — distributed: each partition serializes its
  rows executor-side (plain Python, no py4j) into one ``part-*.avro``
  container file. Null and deflate codecs.
* ``read_avro(spark, path)`` — distributed: file list is parallelized,
  each task decodes its file; returns a DataFrame with the original
  Spark schema (round-trips the type mapping below).
* Interop is proven in tests by re-reading our files through the JVM's
  bundled ``org.apache.avro`` DataFileReader via py4j (driver-side) —
  if the Java reference implementation accepts the bytes, a real
  spark-avro deployment will too.

Type mapping (both directions):

  string↔string, long↔long, int/short/byte↔int, double↔double,
  float↔float, boolean↔boolean, binary↔bytes,
  timestamp↔long+logicalType=timestamp-micros, date↔int+logicalType=date,
  decimal(p,s)↔bytes+logicalType=decimal, array<T>↔array.

Every field is written as the nullable union ``["null", T]`` — Spark
columns are nullable by default. At 100 TB the write path is the same
shape as any file sink: one file per task, no driver funnel; the read
path assigns one task per container file (Avro files are splittable on
sync markers, but per-file tasks are fine for a raw-landing format that
is immediately compacted to parquet — SURVEY.md §1.1).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from datetime import date, datetime, timezone
from decimal import Decimal, localcontext

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"
_EPOCH_DATE = date(1970, 1, 1)

# ----------------------------------------------------------------- encoding


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            break


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc)


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    _write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


# ------------------------------------------------- Spark type <-> Avro type


def _avro_type(dt: T.DataType):
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _avro_type(dt.elementType)}
    raise TypeError(f"avro fallback: unsupported Spark type {dt.simpleString()}")


def avro_schema_json(schema: T.StructType, name: str = "spark_row") -> str:
    fields = [
        {"name": f.name, "type": ["null", _avro_type(f.dataType)]}
        for f in schema.fields
    ]
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _spark_type_from_avro(at) -> T.DataType:
    if isinstance(at, list):  # ["null", T]
        inner = [x for x in at if x != "null"]
        return _spark_type_from_avro(inner[0])
    if isinstance(at, dict):
        lt = at.get("logicalType")
        if lt == "timestamp-micros":
            return T.TimestampType()
        if lt == "date":
            return T.DateType()
        if lt == "decimal":
            return T.DecimalType(at["precision"], at["scale"])
        if at.get("type") == "array":
            return T.ArrayType(_spark_type_from_avro(at["items"]))
        return _spark_type_from_avro(at["type"])
    return {
        "string": T.StringType(),
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
    }[at]


def spark_schema_from_avro(schema_json: str) -> T.StructType:
    rec = json.loads(schema_json)
    return T.StructType(
        [
            T.StructField(f["name"], _spark_type_from_avro(f["type"]))
            for f in rec["fields"]
        ]
    )


# -------------------------------------------------------------- value codecs


def _encode_value(buf: io.BytesIO, v, dt: T.DataType) -> None:
    if isinstance(dt, T.StringType):
        _write_bytes(buf, str(v).encode("utf-8"))
    elif isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        _write_long(buf, int(v))
    elif isinstance(dt, T.DoubleType):
        buf.write(struct.pack("<d", float(v)))
    elif isinstance(dt, T.FloatType):
        buf.write(struct.pack("<f", float(v)))
    elif isinstance(dt, T.BooleanType):
        buf.write(b"\x01" if v else b"\x00")
    elif isinstance(dt, T.BinaryType):
        _write_bytes(buf, bytes(v))
    elif isinstance(dt, T.TimestampType):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        delta = v - datetime(1970, 1, 1, tzinfo=timezone.utc)
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        _write_long(buf, micros)
    elif isinstance(dt, T.DateType):
        _write_long(buf, (v - _EPOCH_DATE).days)
    elif isinstance(dt, T.DecimalType):
        # default Decimal context is 28 significant digits — not enough
        # for decimal(38,18); widen locally so the unscaled int is exact
        with localcontext() as ctx:
            ctx.prec = dt.precision + dt.scale + 2
            unscaled = int(Decimal(v).scaleb(dt.scale).to_integral_value())
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        _write_bytes(buf, unscaled.to_bytes(nbytes, "big", signed=True))
    elif isinstance(dt, T.ArrayType):
        items = list(v)
        if items:
            _write_long(buf, len(items))
            for item in items:
                _encode_nullable(buf, item, dt.elementType)
        _write_long(buf, 0)
    else:  # pragma: no cover
        raise TypeError(f"unsupported type {dt}")


def _encode_nullable(buf: io.BytesIO, v, dt: T.DataType) -> None:
    if v is None:
        _write_long(buf, 0)
    else:
        _write_long(buf, 1)
        _encode_value(buf, v, dt)


def _decode_value(buf: io.BytesIO, dt: T.DataType):
    if isinstance(dt, T.StringType):
        return _read_bytes(buf).decode("utf-8")
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return _read_long(buf)
    if isinstance(dt, T.DoubleType):
        return struct.unpack("<d", buf.read(8))[0]
    if isinstance(dt, T.FloatType):
        return struct.unpack("<f", buf.read(4))[0]
    if isinstance(dt, T.BooleanType):
        return buf.read(1) == b"\x01"
    if isinstance(dt, T.BinaryType):
        return _read_bytes(buf)
    if isinstance(dt, T.TimestampType):
        micros = _read_long(buf)
        return datetime.fromtimestamp(micros / 1_000_000, tz=timezone.utc).replace(
            tzinfo=None
        )
    if isinstance(dt, T.DateType):
        return date.fromordinal(_EPOCH_DATE.toordinal() + _read_long(buf))
    if isinstance(dt, T.DecimalType):
        raw = _read_bytes(buf)
        unscaled = int.from_bytes(raw, "big", signed=True)
        with localcontext() as ctx:
            ctx.prec = dt.precision + dt.scale + 2
            return Decimal(unscaled).scaleb(-dt.scale)
    if isinstance(dt, T.ArrayType):
        out = []
        while True:
            count = _read_long(buf)
            if count == 0:
                break
            if count < 0:  # block with byte-size prefix
                _read_long(buf)
                count = -count
            for _ in range(count):
                out.append(_decode_nullable(buf, dt.elementType))
        return out
    raise TypeError(f"unsupported type {dt}")  # pragma: no cover


def _decode_nullable(buf: io.BytesIO, dt: T.DataType):
    return None if _read_long(buf) == 0 else _decode_value(buf, dt)


# ---------------------------------------------------------- container files


def _write_container(
    fpath: str, schema_json: str, schema: T.StructType, rows, codec: str
) -> int:
    """Serialize ``rows`` (iterable of Row/tuple) into one Avro container
    file. Returns the row count."""
    sync = bytes((i * 37 + 11) % 256 for i in range(16))  # fixed → deterministic
    header = io.BytesIO()
    header.write(_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _write_long(header, len(meta))
    for k, v in meta.items():
        _write_bytes(header, k.encode())
        _write_bytes(header, v)
    _write_long(header, 0)
    header.write(sync)

    body = io.BytesIO()
    n = 0
    for row in rows:
        for v, f in zip(row, schema.fields):
            _encode_nullable(body, v, f.dataType)
        n += 1

    payload = body.getvalue()
    if codec == "deflate":
        c = zlib.compressobj(wbits=-15)
        payload = c.compress(body.getvalue()) + c.flush()

    with open(fpath, "wb") as f:
        f.write(header.getvalue())
        if n:
            block = io.BytesIO()
            _write_long(block, n)
            _write_long(block, len(payload))
            block.write(payload)
            block.write(sync)
            f.write(block.getvalue())
    return n


def _read_container(fpath: str):
    """Yield tuples from one Avro container file (null/deflate codecs)."""
    with open(fpath, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{fpath}: not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:
            _read_long(buf)  # byte size, unused
            count = -count
        for _ in range(count):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema_json = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    schema = spark_schema_from_avro(schema_json)
    sync = buf.read(16)
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(n):
            yield tuple(
                _decode_nullable(block, f.dataType) for f in schema.fields
            )
        if buf.read(16) != sync:
            raise ValueError(f"{fpath}: sync marker mismatch")


# ------------------------------------------------------------------ public


def write_avro(
    df: DataFrame, path: str, *, codec: str = "null", mode: str = "overwrite"
) -> None:
    """Distributed Avro write: one container file per partition."""
    if codec not in ("null", "deflate"):
        raise ValueError("codec must be 'null' or 'deflate'")
    if mode == "overwrite" and os.path.isdir(path):
        import shutil

        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)

    schema = df.schema
    schema_json = avro_schema_json(schema)

    def write_partition(index: int, rows):
        it = iter(rows)
        try:
            first = next(it)
        except StopIteration:
            return iter(())
        import itertools

        fpath = os.path.join(path, f"part-{index:05d}.avro")
        n = _write_container(
            fpath, schema_json, schema, itertools.chain([first], it), codec
        )
        return iter([(index, n)])

    counts = df.rdd.mapPartitionsWithIndex(write_partition).collect()
    if not counts:  # fully empty input still needs a schema-bearing file
        _write_container(
            os.path.join(path, "part-00000.avro"), schema_json, schema, [], codec
        )


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed Avro read: one task per container file."""
    import glob

    files = sorted(glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    # schema from the first file's header (driver-side, header only)
    with open(files[0], "rb") as f:
        buf = io.BytesIO(f.read())
    buf.read(4)
    meta = {}
    while True:
        c = _read_long(buf)
        if c == 0:
            break
        if c < 0:
            _read_long(buf)
            c = -c
        for _ in range(c):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    schema = spark_schema_from_avro(meta["avro.schema"].decode())

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(_read_container)
    return spark.createDataFrame(rdd, schema)
