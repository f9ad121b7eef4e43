"""Source/sink surface: CSV/JSON ingestion and partitioned parquet writes."""

from . import synth  # noqa: E402,F401  (registers a15)
