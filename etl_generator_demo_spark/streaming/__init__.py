"""Streaming-shaped operators (batch-first)."""
