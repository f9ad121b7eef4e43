"""Structured Streaming operators (SURVEY.md §2.10)."""
