"""Structured Streaming operators (SURVEY.md §2.10)."""

from . import queries  # noqa: F401
