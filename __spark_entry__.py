"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All logic lives in the ``bootic_stats_aggregates_spark`` package
(see SURVEY.md §2 for the operator inventory, one registered query
per operator ID); this module is just the stable entry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may exec this file from any cwd; the package lives next to it.
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:  # pragma: no cover - depends on driver cwd
    sys.path.insert(0, _HERE)

from bootic_stats_aggregates_spark import api as _api  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _api.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _api.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every oracle-checkable query."""
    return _api.oracle_sql()
