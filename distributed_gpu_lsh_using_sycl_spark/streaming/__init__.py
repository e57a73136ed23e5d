"""Structured Streaming surface: incremental signature ingest."""
