"""Query registry.

Each operator module registers its queries with the :func:`query` decorator.
``QUERIES[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable;
``ORACLES[name]`` is the equivalent DuckDB SQL (omitted for ops that are not
SQL-expressible — the driver then records a weaker rows-only check).

Conventions (SURVEY.md §2, empirically validated in the survey session):
- round every floating aggregate (2 money / 4 ratios / 6 similarities), with
  the identical ``round(..., n)`` in the oracle SQL;
- alias every computed column identically on both sides;
- every LIMIT is preceded by a total, tie-broken ORDER BY;
- ``events.ts`` is normalized once in the loader (nanos -> microseconds).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[["SparkSession", str], "DataFrame"]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: names whose fn() DRAINS a Structured Streaming query and returns the
#: sink as a batch frame.  Consumers that must not pre-execute a drain
#: (the exchange-budget sweep) key their skip on THIS set, not on the
#: "j" name prefix — a naming-convention proxy would silently exempt a
#: future non-streaming query that happens to start with "j" (ADVICE
#: r16), and would miss a streaming query homed in another family.
STREAMING: set[str] = set()


def query(name: str, oracle: str | None = None,
          streaming: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is DuckDB SQL or None.

    ``streaming=True`` marks fn as a stream-drain (see :data:`STREAMING`).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        if streaming:
            STREAMING.add(name)
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import operators, sources, streaming  # noqa: F401
