"""Table loading with schema normalization.

All ten driver tables (TESTDATA.md / FIXTURES.md §1) load through here so the
``events.ts`` nanosecond fix is applied exactly once:

- parquet stores ``timestamp[ns]``; with ``nanosAsLong`` the column arrives as
  long nanos and is converted via ``timestamp_micros(ts div 1000)`` — integer
  ``div``, never ``/`` (float division of ~1.7e18 exceeds double's 2^53 exact
  range; SURVEY.md §1.3).  Result is microsecond-equal to DuckDB's read.

At 100 TB the equivalent of this module is the catalog: the conversion is a
zero-shuffle map expression, fully fused into the scan by codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import configure

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    configure(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
