"""transformWithStateInPandas: running per-coin VWAP across micro-batches
(state persists between batches), plus a rate-source continuous-trigger
smoke (no external broker needed)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from big_data_streaming_spark.streaming.parse import parse_klines
from big_data_streaming_spark.streaming.running_state import HAS_TWS, running_vwap
from big_data_streaming_spark.streaming.source import raw_text_file_stream
from tests.test_streaming import COINS, make_kline, write_jsonl


@pytest.mark.skipif(not HAS_TWS, reason="needs Spark >= 4.0 with protobuf")
def test_running_vwap_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # two files + maxFilesPerTrigger=1 → two micro-batches
    write_jsonl(src, "b1.jsonl", [make_kline("BTCUSDC", m, volume=2.0) for m in range(3)])
    write_jsonl(src, "b2.jsonl", [make_kline("BTCUSDC", m, volume=2.0) for m in range(3, 5)])

    parsed = parse_klines(
        raw_text_file_stream(spark, src, max_files_per_trigger=1)
    ).select("coin", "close", "volume")
    out = running_vwap(parsed)
    q = (
        out.writeStream.format("memory")
        .queryName("vwap_run")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r["n_klines"], r["running_volume"]) for r in spark.table("vwap_run").collect()
    )
    # one changelog row per batch: after b1 (3 rows, vol 6), after b2 (5 rows, vol 10)
    assert rows == [(3, 6.0), (5, 10.0)]
    # vwap = sum(vol*close)/sum(vol), cumulative
    final = {r["n_klines"]: r["vwap"] for r in spark.table("vwap_run").collect()}[5]
    closes = [100.5 + m for m in range(5)]
    expected = sum(2.0 * c for c in closes) / 10.0
    assert abs(final - expected) < 1e-9


def test_rate_source_continuous_trigger(spark):
    """Broker-less continuous ingestion smoke: rate source, 250ms
    processing-time trigger, graceful stop — the non-drain trigger path."""
    sdf = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "500")
        .load()
        .withColumn("bucket", F.col("value") % 10)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            if spark.table("rate_smoke").count() > 0:
                break
            time.sleep(0.25)
        assert spark.table("rate_smoke").count() > 0
    finally:
        q.stop()
