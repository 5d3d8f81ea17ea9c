"""Batch relational operators (SURVEY.md §2.1-§2.6).

Importing this package registers every operator in the registry.
"""

from . import aggregates, filters, joins, sorts_sets, sources, windows  # noqa: F401
