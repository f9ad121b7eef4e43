"""Source/sink surface: CSV/JSON ingestion and partitioned parquet writes."""
