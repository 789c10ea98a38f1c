"""Structured Streaming ingest: the streaming-native form of the
reference's cron-driven micro-batch loop."""
