"""Sinks (SURVEY.md §2.1): Redis command dataflows + writers, parquet."""

from . import queries, redis_sink  # noqa: F401
