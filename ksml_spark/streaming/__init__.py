"""Streaming runtime (Structured Streaming integration)."""
