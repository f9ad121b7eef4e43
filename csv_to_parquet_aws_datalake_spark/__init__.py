"""PySpark-native analytics engine with the capabilities of
``paulohsilvapinto/csv_to_parquet_aws_datalake``.

The reference is a CSV -> partitioned-Parquet data-lake pipeline fronted by an
ANSI-SQL engine (see SURVEY.md §0 — the reference checkout is empty, so all
parity claims are grounded in the driver contract, not file:line citations).
This package re-expresses that surface Spark-first:

- ``sources``   — CSV/JSON/Parquet ingestion & partitioned-lake writes
- ``operators`` — the batch query surface (SURVEY.md §2 a..i rows)
- ``streaming`` — Structured Streaming equivalents (§2.10 j rows)
- ``functions`` — reusable column-expression builders (vectors, text)
- ``plans``     — physical-plan assertions used by tests (pushdown, broadcast)

Every query is registered in :mod:`.registry` as a ``(spark, sf_dir) ->
DataFrame`` callable plus a DuckDB oracle SQL string; ``__spark_entry__.py``
at the repo root simply re-exports the registry.
"""

from . import registry  # noqa: F401

__all__ = ["registry"]
