"""Scalar function families (SURVEY.md §2.7)."""

from . import families  # noqa: F401
