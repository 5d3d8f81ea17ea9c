"""Scalar function families (SURVEY.md §2.7)."""

from . import families, udfs  # noqa: F401
