"""Structured Streaming variants of the dedup operators."""
