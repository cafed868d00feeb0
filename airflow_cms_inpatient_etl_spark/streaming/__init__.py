"""Structured Streaming surface: windowed aggregation with watermarks,
stream dedup, custom stateful operators."""
