"""Operational surfaces: df.observe() metrics (batch + streaming) and
curated-layer schema evolution (mergeSchema)."""

from __future__ import annotations

import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from big_data_streaming_spark.sources.catalog import load_table


def test_observe_batch_metrics(spark, sf_small):
    """df.observe() rides the existing plan — row counts and sums come
    back WITHOUT a second scan (the metrics are collected as a side
    effect of the action). The operational form of 'count the batch you
    just wrote' that the reference does with a separate count() pass
    (reference spark/streaming-shorttime.py counts then writes)."""
    obs = Observation("ingest")
    ev = load_table(spark, sf_small, "events").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        F.max("ts").alias("max_ts"),
    )
    ev.write.format("noop").mode("overwrite").save()
    got = obs.get
    exact = load_table(spark, sf_small, "events").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s"),
    ).first()
    assert got["n_rows"] == exact["n"]
    assert got["total_value"] == exact["s"]
    assert got["max_ts"] is not None


def test_observe_streaming_metrics(spark, sf_small, tmp_path):
    """Streaming observe(): per-batch metrics surface through the
    progress events — the engine-native replacement for hand-rolled
    counters around foreachBatch."""
    import shutil, os, glob

    src = tmp_path / "src"
    src.mkdir()
    for f in glob.glob(os.path.join(sf_small, "events.parquet")):
        shutil.copy(f, src / "part-0.parquet")

    from big_data_streaming_spark.sources.catalog import _ensure_session_confs

    _ensure_session_confs(spark)
    raw_schema = spark.read.parquet(str(src)).schema
    sdf = spark.readStream.schema(raw_schema).parquet(str(src))
    observed = sdf.observe(
        "batch_metrics", F.count(F.lit(1)).alias("rows_in_batch")
    )
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    # progress history carries the observed metrics per micro-batch
    total = 0
    for p in q.recentProgress:
        om = p.get("observedMetrics", {}) or {}
        if "batch_metrics" in om:
            total += om["batch_metrics"]["rows_in_batch"]
    assert total == spark.read.parquet(str(src)).count()


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Curated layers evolve: new files gain columns. mergeSchema reads
    old + new together, old rows NULL in the new column; explicit
    ReadSchema keeps pruning intact."""
    path = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS v").write.parquet(path)
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS v", "'new' AS tag"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "v", "tag"}
    rows = {r.id: r.tag for r in merged.collect()}
    assert all(rows[i] is None for i in range(5))
    assert all(rows[i] == "new" for i in range(5, 10))
    assert merged.count() == 10
