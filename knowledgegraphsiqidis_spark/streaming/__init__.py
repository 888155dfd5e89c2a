"""Structured Streaming ingest of new transcript partitions."""
