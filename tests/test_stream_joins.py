"""Stream-static and stream-stream joins — the enrichment shapes a market
pipeline needs (join klines against a coin-metadata dim; correlate two
topics). Stream-static is a broadcast against each micro-batch (no state);
stream-stream holds watermarked state on both sides."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_spark.streaming.parse import parse_klines
from big_data_streaming_spark.streaming.source import raw_text_file_stream
from tests.test_streaming import COINS, make_kline, write_jsonl


def test_stream_static_enrichment_join(spark, tmp_path):
    src = str(tmp_path / "src")
    write_jsonl(src, "a.jsonl", [make_kline(c, m) for c in COINS for m in range(10)])

    dim = spark.createDataFrame(
        [(c, f"Coin {i}", i % 2 == 0) for i, c in enumerate(COINS)],
        ["coin", "display_name", "is_major"],
    )

    parsed = parse_klines(raw_text_file_stream(spark, src))
    enriched = parsed.join(F.broadcast(dim), "coin", "left")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("enriched")
    assert got.count() == 40
    assert got.filter(F.col("display_name").isNull()).count() == 0
    assert got.filter(F.col("is_major")).select("coin").distinct().count() == 2


def test_stream_stream_join_within_watermark(spark, tmp_path):
    """Correlate the 1s topic with the 1m topic per (coin, minute) — the
    reference runs these as two disconnected jobs; a stream-stream join
    with event-time bounds is the engine-native correlation."""
    shorts = str(tmp_path / "shorts")
    longs = str(tmp_path / "longs")
    write_jsonl(
        shorts, "a.jsonl",
        [make_kline(c, m, interval="1s", volume=1.0) for c in COINS for m in range(5)],
    )
    write_jsonl(
        longs, "a.jsonl",
        [make_kline(c, m, interval="1m", volume=10.0) for c in COINS for m in range(5)],
    )

    s = (
        parse_klines(raw_text_file_stream(spark, shorts))
        .select("coin", "timestamp", F.col("volume").alias("s_vol"))
        .withWatermark("timestamp", "1 minute")
    )
    l = (
        parse_klines(raw_text_file_stream(spark, longs))
        .select(
            F.col("coin").alias("l_coin"),
            F.col("timestamp").alias("l_ts"),
            F.col("volume").alias("l_vol"),
        )
        .withWatermark("l_ts", "1 minute")
    )
    joined = s.join(
        l,
        (F.col("coin") == F.col("l_coin")) & (F.col("timestamp") == F.col("l_ts")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("ss_join")
    assert got.count() == 20  # every (coin, minute) pairs exactly once
    assert got.filter(F.col("s_vol") == 1.0).count() == 20
    assert got.filter(F.col("l_vol") == 10.0).count() == 20
