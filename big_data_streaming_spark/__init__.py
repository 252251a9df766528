"""big_data_streaming_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (JulienDira/big-data-streaming,
read-only snapshot at /root/reference): Kafka/file streaming ingestion of
kline-style JSON events, declared-schema parsing, time-based transforms,
per-key routed sinks, an incremental CDC-style loader — plus the relational
core (joins / aggregations / windows / top-k) the reference's product query
implies, and LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Everything is the DataFrame / SQL API riding Catalyst; no custom planner.
See SURVEY.md at the repo root for the full blueprint.
"""

from big_data_streaming_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
