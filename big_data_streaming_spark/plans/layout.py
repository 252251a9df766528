"""Physical data layout helpers — partitioning and bucketing policy.

At 100 TB layout *is* the optimizer: a fact table bucketed on its join key
turns every fact-fact join into a zero-shuffle zip of co-located buckets,
and a curated layer partitioned by (coin, interval, year, month) — the
keys the reference derives but never uses (reference
spark/streaming-shorttime.py:60-61, streaming-longtime.py:124-125) — gives
partition pruning on exactly the predicates the reference's queries filter
by (A9, A10).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

KLINE_PARTITION_KEYS = ("coin", "interval", "year", "month")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_keys: Sequence[str] = KLINE_PARTITION_KEYS,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Curated-layer layout: directory-partitioned by the routing keys.
    Pruning applies to any equality/range predicate on the keys."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_keys).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 64,
    sort_col: str | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed catalog table: joins/aggregations on ``bucket_col`` between
    tables bucketed the same way need NO shuffle (Catalyst sees the
    hash-distribution requirement already satisfied). ``num_buckets``
    should divide evenly into cluster cores; 64 suits local[32] tests,
    clusters want O(cores)."""
    writer = df.write.format(fmt).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").saveAsTable(table)


def repartition_for_join(
    left: DataFrame, right: DataFrame, key: str, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Pre-shuffle both sides identically so a chain of operations on the
    same key (join → groupBy → window) reuses ONE exchange instead of
    re-shuffling per stage."""
    spark = SparkSession.getActiveSession()
    n = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    return left.repartition(n, key), right.repartition(n, key)
