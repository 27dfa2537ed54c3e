"""Structured Streaming surface: windowed aggregations with watermarks,
session windows, stream dedup, stateful processing."""
