"""Batch sources: parquet-backed table catalog over a scale-factor directory.

Reads are plain ``spark.read.parquet`` so Catalyst's vectorized parquet
reader, predicate pushdown, and column pruning all apply; a ``queries()``
callable that selects 2 columns through this loader produces a scan whose
``ReadSchema`` contains exactly those 2 columns. At 100 TB the same call
reads a partitioned table (e.g. ``coin/interval/year/month`` layout, the
partition keys the reference derives but never uses — reference
spark/streaming-shorttime.py:60-61) and gets partition pruning for free.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from big_data_streaming_spark.schemas import TESTDATA_TABLES


def _ensure_session_confs(spark: SparkSession) -> None:
    """The caller may hand us a session built elsewhere (the correctness
    driver constructs its own); the two confs the engine's semantics depend
    on are runtime-settable, so pin them here idempotently:
    * nanosAsLong — Spark 4 otherwise refuses TIMESTAMP(NANOS) parquet;
    * UTC session timezone — epoch↔timestamp conversions must agree with
      the (timezone-naive) DuckDB oracle."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


@functools.lru_cache(maxsize=256)
def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS). Spark's TimestampType is
    µs, and 4.x refuses NANOS columns unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is on (set in session.py) —
    in which case they arrive as epoch-nanos longs. One footer read per
    path (driver-side, cached) tells us which columns to convert."""
    import pyarrow.parquet as pq

    target = path
    if os.path.isdir(path):
        inner = [f for f in sorted(os.listdir(path)) if f.endswith(".parquet")]
        if not inner:
            return ()
        target = os.path.join(path, inner[0])
    schema = pq.read_schema(target)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def normalize_raw_timestamps(df: DataFrame, path: str) -> DataFrame:
    """Bring raw parquet timestamp columns to Spark's TimestampType so the
    whole engine sees one timestamp flavor regardless of how the files
    were written:

    * TIMESTAMP(NANOS) columns (epoch-nanos longs under ``nanosAsLong``)
      are floor-divided to µs — the same truncation DuckDB applies
      reading TIMESTAMP_NS;
    * timezone-naive TIMESTAMP(MICROS/MILLIS) columns (surfaced as
      TIMESTAMP_NTZ by Spark 4's ``inferTimestampNTZ``) are cast to
      TIMESTAMP — the session timezone is pinned UTC, so the naive wall
      clock becomes the same UTC instant DuckDB's naive read produces,
      and functions that require TimestampType (``unix_millis``,
      ``to_utc_timestamp``, …) resolve.
    """
    for c in _nanos_columns(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet file or partitioned directory).

    Timestamp columns are normalized to TimestampType (see
    ``normalize_raw_timestamps``) so engine and oracle see identical
    values whether the files carry NANOS or naive-µs timestamps.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_session_confs(spark)
    return normalize_raw_timestamps(spark.read.parquet(path), path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for ``spark.sql`` use."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
