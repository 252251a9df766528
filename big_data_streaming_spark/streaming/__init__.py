"""Structured Streaming layer — the reference's three jobs re-expressed
with checkpoints, watermarks, and single-pass sinks (SURVEY.md §3, §4.3)."""
