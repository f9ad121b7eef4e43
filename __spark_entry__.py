"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`csv_to_parquet_aws_datalake_spark.registry` — every
operator from SURVEY.md §2 registers itself there as a ``(spark, sf_dir) ->
DataFrame`` callable plus (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from csv_to_parquet_aws_datalake_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "d01_groupby_core"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry.load_all()
    return registry.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
