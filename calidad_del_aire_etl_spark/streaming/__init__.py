"""Structured Streaming: ingest, windowed aggregation, stateful sessions."""
