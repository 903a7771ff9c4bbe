"""Structured Streaming surface (the reference is batch-only; SURVEY §2.9)."""
