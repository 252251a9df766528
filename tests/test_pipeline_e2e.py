"""End-to-end reference-pipeline integration: the three reference jobs
chained as ONE engine flow on fixture klines (SURVEY.md §3 collapsed into
the idiomatic shape: source → parse → transform → routed sinks → curated
incremental layer → product query), plus the salted-aggregation skew
primitive equality check."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_streaming_spark.operators.skew import salted_count, salted_sum
from big_data_streaming_spark.sources.catalog import load_table
from big_data_streaming_spark.streaming.incremental import start_incremental_copy
from big_data_streaming_spark.streaming.parse import parse_klines
from big_data_streaming_spark.streaming.router import route_partitioned
from big_data_streaming_spark.streaming.source import raw_text_file_stream
from tests.test_streaming import COINS, make_kline, write_jsonl


def test_full_pipeline_klines_to_product_query(spark, tmp_path):
    """shorttime + longtime + longtime-raw, one flow:
    1. JSON kline stream → parse chain → partitioned parquet raw layer
       (A1–A6, A17-as-parquet, A19/A20 via partitionBy);
    2. raw layer → incremental checkpointed copy → curated layer (A22);
    3. curated layer → the product query: last-hour volume per coin,
       descending (README.md:2 / public/demo.jpg).
    """
    # -- 1. ingest two "cycles" of klines through the streaming engine
    src = str(tmp_path / "wire")
    write_jsonl(src, "cycle1.jsonl", [
        make_kline(c, m, volume=float((m * 7 + i) % 10 + 1))
        for i, c in enumerate(COINS) for m in range(60)
    ])
    write_jsonl(src, "cycle2.jsonl", [
        make_kline(c, m, volume=2.0) for c in COINS for m in range(60, 120)
    ])

    raw_dir = str(tmp_path / "raw")
    parsed = parse_klines(raw_text_file_stream(spark, src))
    q = (
        parsed.writeStream.format("parquet")
        .option("path", raw_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt_raw"))
        .partitionBy("coin", "interval")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # -- 2. curated layer: incremental copy with its own checkpoint
    curated_dir = str(tmp_path / "curated")
    q2 = start_incremental_copy(
        spark,
        raw_dir,
        curated_dir,
        str(tmp_path / "ckpt_cur"),
        schema=spark.read.parquet(raw_dir).schema,
        available_now=True,
    )
    q2.awaitTermination()

    curated = spark.read.parquet(curated_dir)
    assert curated.count() == 4 * 120

    # -- 3. product query on the curated layer
    last_hour_start = curated.agg(
        F.date_trunc("hour", F.max("timestamp")).alias("h")
    ).first()["h"]
    top = (
        curated.filter(F.col("timestamp") >= F.lit(last_hour_start))
        .groupBy("coin")
        .agg(F.sum("volume").alias("vol"))
        .orderBy(F.desc("vol"), "coin")
        .collect()
    )
    assert len(top) == 4
    assert all(r["vol"] == 60 * 2.0 for r in top)  # cycle2 volumes


def test_salted_agg_equals_direct(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    direct = {
        (r["event_type"],): r["tv"]
        for r in ev.groupBy("event_type")
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("tv"))
        .collect()
    }
    salted = {
        (r["event_type"],): r["tv"]
        for r in salted_sum(ev, ["event_type"], "value", "tv", buckets=8).collect()
    }
    assert direct == salted  # bit-identical (decimal associativity)

    n_direct = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    n_salted = {
        r["event_type"]: r["n"]
        for r in salted_count(ev, ["event_type"], buckets=8).collect()
    }
    assert n_direct == n_salted
