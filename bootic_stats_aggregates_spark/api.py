"""Driver-facing contract: entry() / queries() / oracle_sql().

Re-exported by the repo-root ``__spark_entry__.py``. See registry.py for how
operators self-register.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .io import DEFAULT_SF_DIR
from .registry import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (smoke check): hourly event counters per type.

    This is the reference daemon's core semantic — time-bucketed counters per
    event type (the Redis ``HINCRBY`` hashes, SURVEY.md §2.3
    ``agg_count_by_bucket``) — expressed as a Catalyst-planned scan ->
    project -> partial/final hash aggregate.
    """
    return all_queries()["agg_count_by_bucket"](spark, DEFAULT_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
