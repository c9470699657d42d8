"""Structured Streaming layer (SURVEY §2.11)."""
