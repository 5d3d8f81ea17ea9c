"""Batch relational operators (SURVEY.md §2.1-§2.6).

Importing this package registers every operator in the registry.
"""

from . import (  # noqa: F401
    acid_ops,
    aggregates,
    filters,
    joins,
    sampling,
    sorts_sets,
    sources,
    subqueries,
    windows,
)
