"""Streaming-mode B3/B4: sliding and session windows through the real
streaming engine (AvailableNow drain) must equal their batch analogs —
the Structured Streaming prefix-consistency contract, checked per window
type because each uses a different stateful operator."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from big_data_streaming_spark.sources.catalog import load_table
from big_data_streaming_spark.workload.streaming import _stage_stream_dir


def _stream_events(spark, sf_dir):
    from big_data_streaming_spark.sources.catalog import _nanos_columns

    src = _stage_stream_dir(sf_dir, "events")
    raw_schema = spark.read.parquet(src).schema
    sdf = spark.readStream.schema(raw_schema).parquet(src)
    for c in _nanos_columns(src):
        sdf = sdf.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return sdf


def _drain(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_sliding_window_equals_batch(spark, sf_small):
    name = f"slide_{uuid.uuid4().hex[:8]}"
    agg_stream = (
        _stream_events(spark, sf_small)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _drain(agg_stream, name, "complete")
    got = sorted(
        map(
            str,
            spark.table(name)
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect(),
        )
    )
    batch = sorted(
        map(
            str,
            load_table(spark, sf_small, "events")
            .groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n")
            .collect(),
        )
    )
    assert got == batch


def test_stream_session_window_equals_batch(spark, sf_small):
    name = f"sess_{uuid.uuid4().hex[:8]}"
    agg_stream = (
        _stream_events(spark, sf_small)
        .withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    _drain(agg_stream, name, "complete")
    got = sorted(
        map(
            str,
            spark.table(name)
            .select(
                F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "user_id", "n"
            )
            .collect(),
        )
    )
    batch = sorted(
        map(
            str,
            load_table(spark, sf_small, "events")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "user_id", "n"
            )
            .collect(),
        )
    )
    assert got == batch
