"""Structured Streaming surface (incremental validation)."""
