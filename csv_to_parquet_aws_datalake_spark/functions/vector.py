"""Vector column expressions over array<float> embeddings.

Pure higher-order-function SQL — JVM-evaluated, codegen-friendly, no UDF,
and the array stays a native type (no UDT) so the Arrow path remains intact
(SURVEY.md §7.4).  Formulations mirror the survey-validated baseline
(BASELINE.md appendix, q_cosine_knn): floats are promoted via `* 1.0`
before multiplication so both engines accumulate in double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    # x * 1.0 * y: promote to double BEFORE multiplying — float32 products
    # would diverge from the oracle's DOUBLE[] computation
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * 1.0 * y), 0.0D, (acc, v) -> acc + v)")


def norm(a: str) -> Column:
    return F.sqrt(F.expr(
        f"aggregate(transform({a}, x -> x * 1.0 * x), 0.0D, (acc, v) -> acc + v)"))


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
