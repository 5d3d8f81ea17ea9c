"""Structured Streaming operators (SURVEY.md §2.8) + deterministic runner."""

from . import socket_source, stream_queries  # noqa: F401
