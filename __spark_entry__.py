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


# Driver coverage stops after ~50 entries per round (dict order), so ordering
# is part of the contract surface.  The proven set is read from the driver's
# own CORRECTNESS_r*.json artifacts at call time: names whose last recorded
# run FAILED rank first (a fix must be re-proven immediately), never-recorded
# names next (interleaved round-robin across §2 families so a budget cut at
# any depth still lands rows for every family), green names last.
def _driver_record() -> dict[str, bool]:
    """name -> last recorded run was green (hash match or rows-only)."""
    import glob
    import json

    record: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, res in rows.items():
            ok = bool(res.get("hash_match")) or res.get("err") == "no_oracle"
            record[name] = ok
    return record


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    names = sorted(registry.QUERIES)
    record = _driver_record()
    # depth counts only unproven names, so late-numbered additions
    # interleave fairly instead of queueing behind their family's history
    depth = {}
    for n in names:
        if n in record:
            continue
        fam = n.split("_")[0][0]
        depth[n] = depth.get(fam, -1) + 1
        depth[fam] = depth[n]

    def rank(name: str) -> tuple[int, int, str]:
        if name in record:
            return (0 if not record[name] else 2, 0, name)
        return (1, depth[name], name)

    ordered = sorted(names, key=rank)
    return {n: registry.QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
