"""Session construction & configuration.

The driver hands us an already-built ``SparkSession``; :func:`configure`
applies the runtime-settable confs every query path needs (verified settable
post-creation on PySpark 4.1.2).  ``build_session`` is used by bench.py and
the test suite when no session exists yet.

Scale notes (100 TB design intent, SURVEY.md §7.4):
- AQE on: runtime partition coalescing, broadcast switch, skew-join splitting
  are exactly the knobs that keep a fixed logical plan healthy at 1000×.
- shuffle partitions ≈ cores locally; on a real cluster this would be
  2-3× total executor cores (or left to AQE's coalescing from a high initial).
- UTC session timezone pins timestamp semantics to the oracle engine's.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: confs that are runtime-settable and required for correctness.
RUNTIME_CONFS: dict[str, str] = {
    # events.parquet carries timestamp[ns]; Spark 4 rejects it outright
    # without this (SURVEY.md §1.3 — the single biggest trap in this repo).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # AQE coalesces over-partitioned shuffles, but NOT for stateful
    # streaming (AQE is disabled there) — the default 200 partitions makes
    # every micro-batch churn 200 state-store instances on a small box, so
    # pin it; on a real cluster this would be 2-3x total executor cores.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs (idempotent; safe on driver-provided sessions)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the host session — keep going
    return spark


def build_session(app_name: str = "csv_to_parquet_aws_datalake_spark",
                  cpus: int | None = None) -> SparkSession:
    """Local session for bench/tests; honors SPARK_GRAFT_CPUS."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
