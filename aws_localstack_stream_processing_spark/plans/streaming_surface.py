"""Streaming-surface queries (rows-only checks) — filled in incrementally."""
