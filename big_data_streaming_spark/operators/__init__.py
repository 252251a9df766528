"""Relational operator helpers that need more than a one-line DataFrame
call: skew-aware aggregation, windowed top-k, streaming-safe dedup."""
