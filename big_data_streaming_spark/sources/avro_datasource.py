"""``avro_py`` — the Avro fallback as a registered Spark 4 Python
DataSource, so the container-file codec in ``avro_fallback.py`` is usable
through the normal reader/writer API instead of helper functions:

    spark.dataSource.register(AvroPyDataSource)
    spark.read.format("avro_py").load(path)
    df.write.format("avro_py").mode("overwrite").save(path)

This is the idiomatic Spark 4 extension point (pyspark.sql.datasource):
reads fan out one ``InputPartition`` per container file (executor-side
decode, no driver funnel), writes serialize each partition to one file
and report per-task commit messages. Schema comes from the first file's
header on read, or from the DataFrame on write.

The JVM spark-avro datasource, when present, remains preferable (codegen,
splittable blocks); ``avro_py`` is the no-jar path with the same bytes on
disk (Java reference-implementation interop proven in tests/test_avro.py).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from big_data_streaming_spark.sources.avro_fallback import (
    _read_container,
    _write_container,
    avro_schema_json,
    spark_schema_from_avro,
)


def _list_avro_files(path: str) -> list[str]:
    import glob

    if os.path.isfile(path):
        return [path]
    files = sorted(glob.glob(os.path.join(path, "*.avro")))
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    return files


def _schema_from_header(fpath: str) -> StructType:
    import io

    from big_data_streaming_spark.sources.avro_fallback import (
        _MAGIC,
        _read_bytes,
        _read_long,
    )

    with open(fpath, "rb") as f:
        buf = io.BytesIO(f.read(1 << 20))  # header fits well inside 1 MB
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{fpath}: not an Avro container file")
    meta: dict[str, bytes] = {}
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
    return spark_schema_from_avro(meta["avro.schema"].decode())


@dataclass
class _FilePartition(InputPartition):
    path: str


class AvroPyReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._path = options["path"]

    def partitions(self):
        return [_FilePartition(p) for p in _list_avro_files(self._path)]

    def read(self, partition: _FilePartition):
        yield from _read_container(partition.path)


@dataclass
class _WroteFile(WriterCommitMessage):
    path: str
    rows: int


class AvroPyWriter(DataSourceWriter):
    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self._schema = schema
        self._schema_json = avro_schema_json(schema)
        self._path = options["path"]
        self._codec = options.get("codec", "null")
        if overwrite and os.path.isdir(self._path):
            import shutil

            shutil.rmtree(self._path)
        os.makedirs(self._path, exist_ok=True)

    def write(self, iterator):
        fpath = os.path.join(self._path, f"part-{uuid.uuid4().hex}.avro")
        n = _write_container(
            fpath, self._schema_json, self._schema, iterator, self._codec
        )
        if n == 0:
            os.remove(fpath)
            return _WroteFile(path="", rows=0)
        return _WroteFile(path=fpath, rows=n)

    def commit(self, messages):
        # ensure an empty write still leaves a schema-bearing file
        if all(m.rows == 0 for m in messages):
            _write_container(
                os.path.join(self._path, "part-empty.avro"),
                self._schema_json,
                self._schema,
                [],
                self._codec,
            )

    def abort(self, messages):
        for m in messages:
            if m.path and os.path.exists(m.path):
                os.remove(m.path)


class AvroPyStreamWriter(DataSourceStreamWriter):
    """Streaming sink: one ``batch_<id>/`` directory of container files
    per micro-batch (the reference's A17 layout, spark/streaming-
    shorttime.py:73-78). Exactly-once comes from the engine's WAL: a
    replayed batch id overwrites its own directory (commit is
    directory-rename-free because per-task files land in the final
    batch dir and abort removes them)."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._schema = schema
        self._schema_json = avro_schema_json(schema)
        self._path = options["path"]
        self._codec = options.get("codec", "null")

    def write(self, iterator):
        # tasks stage anonymously; the batch id only exists at commit
        # time, where the driver moves staged files into batch_<id>/
        staging = os.path.join(self._path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fpath = os.path.join(staging, f"part-{uuid.uuid4().hex}.avro")
        n = _write_container(
            fpath, self._schema_json, self._schema, iterator, self._codec
        )
        if n == 0:
            os.remove(fpath)
            return _WroteFile(path="", rows=0)
        return _WroteFile(path=fpath, rows=n)

    def commit(self, messages, batchId=None):
        import shutil

        bdir = os.path.join(self._path, f"batch_{batchId}")
        if os.path.isdir(bdir):  # replayed batch: replace, don't duplicate
            shutil.rmtree(bdir)
        os.makedirs(bdir, exist_ok=True)
        for m in messages:
            if m.path and os.path.exists(m.path):
                shutil.move(m.path, os.path.join(bdir, os.path.basename(m.path)))

    def abort(self, messages, batchId=None):
        for m in messages:
            if m.path and os.path.exists(m.path):
                os.remove(m.path)


class AvroPyDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "avro_py"

    def schema(self) -> StructType:
        return _schema_from_header(_list_avro_files(self.options["path"])[0])

    def reader(self, schema: StructType) -> AvroPyReader:
        return AvroPyReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> AvroPyWriter:
        return AvroPyWriter(schema, self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool) -> AvroPyStreamWriter:
        return AvroPyStreamWriter(schema, self.options)


def register(spark) -> None:
    """Idempotent registration of the avro_py format on a session."""
    spark.dataSource.register(AvroPyDataSource)
