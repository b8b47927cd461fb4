"""Structured Streaming jobs: incremental keyed upsert + event-time windows."""
