"""Determinism guarantees the oracle-exactness design rests on
(workload/common.py): decimal-routed sums must be bit-identical across
partitionings — the property plain double sums lack — and streaming
dedup-within-watermark must drop duplicate records exactly once."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from big_data_streaming_spark.sources.catalog import load_table
from big_data_streaming_spark.workload.common import dec_sum


def test_dec_sum_invariant_across_partitionings(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    results = set()
    for parts in (1, 7, 32):
        r = (
            ev.repartition(parts)
            .groupBy("event_type")
            .agg(dec_sum("value", "tv"))
            .collect()
        )
        results.add(tuple(sorted((x["event_type"], x["tv"]) for x in r)))
    assert len(results) == 1, "decimal sum changed under repartitioning"


def test_plain_double_sum_would_not_be_exact(spark, sf_small):
    """Documents WHY the decimal routing exists: double sums across
    different partitionings are allowed to differ in low-order bits. If
    this ever starts failing (i.e. double sums become stable), the
    decimal policy is still correct, just no longer load-bearing."""
    ev = load_table(spark, sf_small, "events")
    sums = set()
    for parts in (1, 7, 32):
        r = ev.repartition(parts).agg(F.sum("value").alias("s")).first()["s"]
        sums.add(r)
    # not asserting inequality (it's permitted to collide) — just pin that
    # the decimal path agrees with every double variant to float tolerance
    dec = ev.agg(dec_sum("value", "s")).first()["s"]
    for s in sums:
        assert abs(s - dec) < 1e-6 * max(1.0, abs(dec))


def test_drop_duplicates_within_watermark_stream(spark, tmp_path):
    """Streaming exact dedup (C1 in stream form): duplicate events inside
    the watermark horizon are emitted once."""
    rows = [{"event_id": i, "ts": 1_700_000_000_000 + i * 1000, "v": float(i)} for i in range(10)]
    rows += rows[:3]  # duplicates
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    sdf = (
        spark.readStream.schema("event_id long, ts long, v double")
        .json(src)
        .withColumn("ts", F.timestamp_millis("ts"))
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream").collect()
    assert len(got) == 10
    assert len({r["event_id"] for r in got}) == 10


def test_stratified_sample_deterministic(spark, sf_small):
    """Seeded sampleBy must return the identical subset across runs."""
    from big_data_streaming_spark.sources.catalog import load_table
    from big_data_streaming_spark.workload.text import sample_stratified

    d = load_table(spark, sf_small, "documents")
    a = sorted(r["doc_id"] for r in sample_stratified(d).collect())
    b = sorted(r["doc_id"] for r in sample_stratified(d).collect())
    assert a == b and len(a) > 0


def test_stratified_sample_audit_within_bounds(spark, sf_small):
    """The q_sample_stratified audit booleans must all be TRUE (the 4σ
    Bernoulli bound) — the property the driver's oracle asserts."""
    from big_data_streaming_spark.workload import QUERIES

    rows = QUERIES["q_sample_stratified"](spark, sf_small).collect()
    assert len(rows) == 5
    assert all(r["within_tol"] for r in rows)


def test_kmeans_invariant_across_partitionings(spark, sf_small):
    """Lloyd's k-means (functions/similarity.py:kmeans_assign) must give
    identical assignments AND distances at any partitioning — this is
    what the decimal centroid means + fixed-order distance folds buy.
    Sampled-init or double-mean k-means would fail this."""
    from big_data_streaming_spark.functions.similarity import kmeans_assign

    emb = load_table(spark, sf_small, "embeddings")
    results = set()
    for parts in (1, 5, 16):
        r = kmeans_assign(emb.repartition(parts), k=4, iters=2).collect()
        results.add(tuple(sorted((x["vec_id"], x["cid"], x["d2"]) for x in r)))
    assert len(results) == 1, "k-means changed under repartitioning"


def test_table_checksum_detects_single_cell_change(spark, sf_small):
    """The migration-validator property: flip ONE cell in one row and
    both digests (modular sum AND xor) must change; re-ordering rows
    must change neither. Runs the same digest expressions as
    q_table_checksum over an in-memory copy."""
    from pyspark.sql import functions as F

    from big_data_streaming_spark.workload.advanced import (
        _CK_MOD,
        _CK_TABLES,
        _ck_row_expr,
    )

    cols = _CK_TABLES["nation"]
    hv = (
        f"CAST(conv(substr(md5({_ck_row_expr(cols)}), 1, 12), 16, 10)"
        f" AS BIGINT)"
    )

    def digest(df):
        r = df.agg(
            F.sum(F.expr(f"{hv} % {_CK_MOD}")).alias("s"),
            F.expr(f"bit_xor({hv})").alias("x"),
        ).collect()[0]
        return (r.s, r.x)

    base = spark.read.parquet(f"{sf_small}/nation.parquet")
    d0 = digest(base)
    # Row order / partitioning must not matter.
    assert digest(base.orderBy(F.desc("n_name")).repartition(7)) == d0
    # One changed cell must flip both digests.
    mutated = base.withColumn(
        "n_name",
        F.when(F.col("n_nationkey") == 3, F.concat(F.col("n_name"), F.lit("_X")))
        .otherwise(F.col("n_name")),
    )
    d1 = digest(mutated)
    assert d1[0] != d0[0] and d1[1] != d0[1]
    # One dropped row must flip the sum digest.
    d2 = digest(base.where(F.col("n_nationkey") != 3))
    assert d2[0] != d0[0]
