"""Structured Streaming operators (SURVEY.md §2.8) + deterministic runner."""

from . import stream_queries  # noqa: F401
