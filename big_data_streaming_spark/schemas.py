"""Declared schemas — the engine is declared-schema-first, never inferred.

The reference hardcodes its 14-column kline ``StructType`` in every job and
even overrides JDBC inference (reference: spark/streaming-shorttime.py:27-42,
spark/streaming-longtime-raw.py:112). We keep that discipline: one registry
module, schemas by name, inference off the hot path (at 100 TB a schema
inference pass is a full extra scan).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# Kline stream record — the reference's native input (14 wire columns).
# Mirrors the StructType at reference spark/streaming-shorttime.py:27-42
# (identical at streaming-longtime.py:29-44). Field order preserved.
# --------------------------------------------------------------------------
KLINE_WIRE_SCHEMA = StructType(
    [
        StructField("coin", StringType()),
        StructField("timestamp", LongType()),  # epoch ms (open time)
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("close_time", LongType()),  # epoch ms
        StructField("quote_asset_volume", DoubleType()),
        StructField("number_of_trades", IntegerType()),
        StructField("taker_buy_base_asset_volume", DoubleType()),
        StructField("taker_buy_quote_asset_volume", DoubleType()),
        StructField("ignore", StringType()),
        StructField("interval", StringType()),
    ]
)

# Curated 16-column layout: wire columns with event times cast to TIMESTAMP
# plus derived partition keys (reference spark/streaming-longtime-raw.py:32-49).
KLINE_CURATED_SCHEMA = StructType(
    [
        StructField("coin", StringType()),
        StructField("timestamp", TimestampType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("close_time", TimestampType()),
        StructField("quote_asset_volume", DoubleType()),
        StructField("number_of_trades", IntegerType()),
        StructField("taker_buy_base_asset_volume", DoubleType()),
        StructField("taker_buy_quote_asset_volume", DoubleType()),
        StructField("ignore", StringType()),
        StructField("interval", StringType()),
        StructField("year", IntegerType()),
        StructField("month", IntegerType()),
    ]
)

# Money-exact variant: Binance sends decimals as strings and the reference
# producer lossily coerces to float (reference kafka/producer-longtime.py:23-27).
# For exact-arithmetic queries the engine offers a DECIMAL(38,18) schema.
from pyspark.sql.types import DecimalType  # noqa: E402

KLINE_DECIMAL_SCHEMA = StructType(
    [
        StructField("coin", StringType()),
        StructField("timestamp", LongType()),
        StructField("open", DecimalType(38, 18)),
        StructField("high", DecimalType(38, 18)),
        StructField("low", DecimalType(38, 18)),
        StructField("close", DecimalType(38, 18)),
        StructField("volume", DecimalType(38, 18)),
        StructField("close_time", LongType()),
        StructField("quote_asset_volume", DecimalType(38, 18)),
        StructField("number_of_trades", IntegerType()),
        StructField("taker_buy_base_asset_volume", DecimalType(38, 18)),
        StructField("taker_buy_quote_asset_volume", DecimalType(38, 18)),
        StructField("ignore", StringType()),
        StructField("interval", StringType()),
    ]
)

# --------------------------------------------------------------------------
# events.props JSON payload (driver fixture; analog of the kline JSON value).
# --------------------------------------------------------------------------
EVENT_PROPS_SCHEMA = StructType([StructField("k", LongType())])

# --------------------------------------------------------------------------
# Multimodal column convention (SURVEY.md §2 Table C5): media as an opaque
# binary payload plus typed metadata. At 100 TB the bytes live in object
# storage and `bytes` is often null with `uri` set; both shapes share one
# struct so operators are storage-agnostic.
# --------------------------------------------------------------------------
MEDIA_STRUCT = StructType(
    [
        StructField("uri", StringType()),
        StructField("mime", StringType()),
        StructField("nbytes", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

EMBEDDING_TYPE = ArrayType(FloatType())

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
