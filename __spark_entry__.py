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
# SURVEY.md §2 rows next, then never-recorded extension queries (each block
# interleaved round-robin across families so a budget cut at any depth still
# lands rows for every family), green names last — STALEST first (lowest
# recording round), so spare slots re-prove the rows that have seen the most
# code churn since their last oracle check.

# Highest query number per family that belongs to SURVEY.md §2 (rows beyond
# these are this repo's extensions).
_S2_FAMILY_MAX = {
    "a": 6, "b": 5, "c": 11, "d": 13, "e": 10, "f": 2,
    "g": 5, "h": 12, "i": 12, "j": 6, "k": 5,
}


def _is_s2(name: str) -> bool:
    fam, num = name[0], name.split("_")[0][1:]
    return num.isdigit() and int(num) <= _S2_FAMILY_MAX.get(fam, 0)
def _driver_record() -> dict[str, tuple[bool, int]]:
    """name -> (last recorded run was green, round it was recorded in)."""
    import glob
    import json
    import re

    record: dict[str, tuple[bool, int]] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, res in rows.items():
            ok = bool(res.get("hash_match")) or res.get("err") == "no_oracle"
            record[name] = (ok, rnd)
    return record


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    names = sorted(registry.QUERIES)
    record = _driver_record()
    # depth counts only unproven names within each block (§2 vs extension),
    # so late-numbered additions interleave fairly instead of queueing
    # behind their family's history
    depth = {}
    for n in names:
        if n in record:
            continue
        key = (n.split("_")[0][0], _is_s2(n))
        depth[n] = depth.get(key, -1) + 1
        depth[key] = depth[n]

    def rank(name: str) -> tuple[int, int, int, str]:
        if name in record:
            ok, rnd = record[name]
            # greens: stalest recording round first, so spare slots re-prove
            # the rows with the most code churn since their last check
            return (0, 0, 0, name) if not ok else (3, rnd, 0, name)
        return (1 if _is_s2(name) else 2, depth[name], 0, name)

    ordered = sorted(names, key=rank)
    return {n: registry.QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    # mirror queries() ordering so the per-round artifacts diff cleanly
    registry.load_all()
    order = list(queries())
    oracles = registry.ORACLES
    return {n: oracles[n] for n in order if n in oracles}
