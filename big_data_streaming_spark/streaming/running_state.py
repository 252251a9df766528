"""Custom stateful operator on the Spark 4 ``transformWithStateInPandas``
API (the successor to ``applyInPandasWithState`` — typed state handles,
explicit time modes): a per-key running accumulator emitting the updated
running total/count/VWAP after every micro-batch.

This is the stream-native form of "statistics of coin's volume in real
time" (reference README.md:2) — instead of re-querying a table per
refresh, downstream reads a changelog of running aggregates. State is one
small tuple per key (O(active keys), watermark-independent)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # Spark >= 4.0, and the API's wire protocol needs protobuf
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older Spark or no protobuf
    StatefulProcessor = object
    HAS_TWS = False

RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("coin", StringType()),
        StructField("running_volume", DoubleType()),
        StructField("running_notional", DoubleType()),
        StructField("n_klines", LongType()),
        StructField("vwap", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("vol", DoubleType()),
        StructField("notional", DoubleType()),
        StructField("n", LongType()),
    ]
)


class RunningVwapProcessor(StatefulProcessor):
    """ValueState (vol, notional, n) per coin; emits the post-batch
    running aggregate each time the key sees data."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("running", _STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        vol, notional, n = (
            self._state.get() if self._state.exists() else (0.0, 0.0, 0)
        )
        for pdf in rows:
            vol += float(pdf["volume"].sum())
            notional += float((pdf["volume"] * pdf["close"]).sum())
            n += len(pdf)
        self._state.update((vol, notional, n))
        yield pd.DataFrame(
            {
                "coin": [key[0]],
                "running_volume": [vol],
                "running_notional": [notional],
                "n_klines": [n],
                "vwap": [notional / vol if vol else None],
            }
        )

    def close(self) -> None:
        pass


def running_vwap(klines: DataFrame) -> DataFrame:
    """klines(coin, close, volume, …) stream → running VWAP changelog."""
    if not HAS_TWS:  # pragma: no cover
        raise NotImplementedError("transformWithStateInPandas requires Spark >= 4.0")
    return (
        klines.groupBy(F.col("coin"))
        .transformWithStateInPandas(
            RunningVwapProcessor(),
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
