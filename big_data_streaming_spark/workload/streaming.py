"""Streaming + sink workload — real Structured Streaming queries whose
results are still DuckDB-oracle-checkable.

``q_stream_window_tumbling`` runs an actual ``readStream → withWatermark →
window agg → memory sink`` pipeline with ``Trigger.AvailableNow`` (drain
everything, then stop) — so the driver's correctness gate exercises the
streaming engine itself, not a batch stand-in, and the oracle is the same
SQL as the batch tumbling window (stream/batch equivalence is the
Structured Streaming contract; see also tests/test_streaming.py).

``q_route_by_key`` is the single-pass replacement for the reference's
O(keys)-sequential-jobs router (reference spark/streaming-longtime.py:
119-144 loops filter+write per (coin, interval), rescanning the batch up
to 21×; SURVEY.md §4.3.2): one ``partitionBy`` write, then a read-back —
checked against a plain GROUP BY oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_streaming_spark.workload.common import dec_sum, oracle_dec_sum, t

QUERIES = {}
ORACLES = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _stage_stream_dir(sf_dir: str, table: str) -> str:
    """Copy one testdata table into a fresh dir usable as a file-stream
    source (the file source wants a directory it can list)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    dst = tempfile.mkdtemp(prefix=f"stream_{table}_")
    if os.path.isdir(src):
        for i, f in enumerate(sorted(os.listdir(src))):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(src, f), os.path.join(dst, f"part-{i}.parquet"))
    else:
        shutil.copy(src, os.path.join(dst, "part-0.parquet"))
    return dst


@_q(
    "q_stream_window_tumbling",
    f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           {oracle_dec_sum('value', 'total_value')},
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_streaming_spark.sources.catalog import _nanos_columns

    src_dir = _stage_stream_dir(sf_dir, "events")
    name = f"stream_tumbling_{uuid.uuid4().hex[:8]}"

    # Stream with the RAW file schema (ns timestamps arrive as epoch-nanos
    # longs under nanosAsLong), then apply the same µs-truncating
    # conversion the batch catalog applies — identical values either path.
    # maxFilesPerTrigger=1 keeps this a real multi-batch incremental run
    # when the source has several files (at sf≥0.1) rather than one giant
    # batch — the shape a 100 TB backlog drain takes.
    raw_schema = spark.read.parquet(src_dir).schema
    sdf = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    for c in _nanos_columns(src_dir):
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(dec_sum("value", "total_value"), F.count(F.lit(1)).alias("n_events"))
    )
    # Stateful streaming creates one state-store instance per shuffle
    # partition, fixed at query start. For this bounded drain, 8 stores
    # beat 32 (less per-store setup than data); a production continuous
    # query sizes this to expected key cardinality instead. The conf is
    # restored right after start (it's captured at plan time).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "total_value",
        "n_events",
    )


@_q(
    "q_route_by_key",
    f"""
    SELECT event_type, COUNT(*) AS n_rows, {oracle_dec_sum('value', 'total_value')}
    FROM events
    GROUP BY event_type
    """,
)
def q_route_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_streaming_spark.streaming.router import route_partitioned

    events = t(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="routed_events_")
    route_partitioned(events, out_dir, keys=["event_type"])
    back = spark.read.parquet(out_dir)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"), dec_sum("value", "total_value")
    )
