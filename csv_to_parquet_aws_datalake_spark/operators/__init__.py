"""Batch query operators, one module per SURVEY.md §2 family."""

from . import (  # noqa: F401
    aggregation,
    joins,
    projection,
    scalars,
    sort_setops,
    windows,
)
