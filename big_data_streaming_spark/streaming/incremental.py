"""Incremental curated-layer loader — the A22 replacement.

The reference's third job is a hand-rolled CDC loop: ``while True`` over
(db, table), JDBC-read rows newer than a watermark persisted in a local
``timestamps.json``, parquet-append, sleep 60 s (reference
spark/streaming-longtime-raw.py:52-98,180-194). Failure modes: SIGKILL
loses the watermark (re-ingest), late rows are silently dropped, state
races if parallelized (SURVEY.md §4.3.3).

Here the same dataflow is a checkpointed Structured Streaming query:

* offsets/watermark live in the **checkpoint**, not a JSON file — crash
  and restart resumes exactly where it stopped;
* ``Trigger.ProcessingTime("60 seconds")`` replaces the sleep loop,
  ``Trigger.AvailableNow`` replaces the bootstrap full-load;
* late data is governed by ``withWatermark`` with a declared tolerance
  instead of being silently dropped.

The source here is a file stream (the curated tables are files in this
engine's layout); for a true RDBMS source the same shape runs over a CDC
feed (Debezium→Kafka — the transport the reference configured but never
wired, config/debezium/conf.json) with this identical downstream plan.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType


def start_incremental_copy(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint: str,
    schema: StructType,
    *,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    poll_seconds: int | None = 60,
    available_now: bool = False,
) -> StreamingQuery:
    """Continuously (or once, with ``available_now``) copy newly-arrived
    source files into the curated layout. Exactly-once: file-source offsets
    + file-sink manifest both live in the checkpoint."""
    sdf = spark.readStream.schema(schema).format(fmt).load(source_dir)
    writer = (
        sdf.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif poll_seconds:
        writer = writer.trigger(processingTime=f"{poll_seconds} seconds")
    return writer.start()
