"""Batch query operators, one module per SURVEY.md §2 family."""

from . import aggregation  # noqa: F401
