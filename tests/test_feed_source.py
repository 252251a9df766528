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
