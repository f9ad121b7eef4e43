#!/usr/bin/env python
"""Re-prove named queries against their DuckDB oracles at all three SFs
(the r21 pre-commit discipline).  Rows-only queries are run twice and must
reproduce the identical normalized multiset.

Usage: python tools/oracle_check_r22.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.differential import _norm, compare, make_oracle_con


def _normalized_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def main() -> int:
    names = sys.argv[1:]
    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session

    registry.load_all()
    spark = build_session("oracle-check-r22")
    spark.sparkContext.setLogLevel("ERROR")
    bad = 0
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        con = make_oracle_con(sf_dir)
        for n in names:
            try:
                df = registry.QUERIES[n](spark, sf_dir)
                if n in registry.ORACLES and registry.ORACLES[n]:
                    compare(df, con, registry.ORACLES[n])
                    print(f"{sf} {n}: ok")
                else:
                    a = _normalized_rows(df)
                    b = _normalized_rows(registry.QUERIES[n](spark, sf_dir))
                    print(f"{sf} {n}: rows-only "
                          f"{'stable' if a == b else 'FLAKY'}")
                    bad += a != b
            except AssertionError as exc:
                print(f"{sf} {n}: FAIL {exc}")
                bad += 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
