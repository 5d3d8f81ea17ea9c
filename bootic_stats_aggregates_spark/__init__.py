"""bootic_stats_aggregates_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
``bootic/bootic_stats_aggregates`` reference (a ZMQ->Redis streaming counter
daemon; see SURVEY.md §0-§1), re-expressed Spark-first:

- batch relational core (scans, filters, aggregations, joins, windows,
  sorts/set-ops, scalar function families) — ``operators/`` and ``functions/``
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) — ``llm/``
- Structured Streaming analogs of the reference's incremental aggregates
  (tumbling/sliding/session windows, stream dedup, stream joins) —
  ``streaming/``
- the reference's Redis sink as a deterministic command-generation dataflow +
  a thin pipelined writer — ``sinks/``

Every operator is declared via the DataFrame API so Catalyst owns the physical
plan (predicate pushdown, column pruning, broadcast selection, AQE); see
SURVEY.md §4. The driver-facing contract (``entry``/``queries``/``oracle_sql``)
is assembled in ``api.py`` and re-exported by the repo-root
``__spark_entry__.py``.
"""

from .api import entry, oracle_sql, queries
from .session import get_spark, tune

__all__ = ["entry", "queries", "oracle_sql", "get_spark", "tune"]
__version__ = "0.1.0"
