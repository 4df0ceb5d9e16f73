"""Structured Streaming ingest variant."""
