#!/usr/bin/env python
"""Physical-plan smell sweep across every registered query.

For each registry entry, prints counts of the plan nodes that matter at
100 TB: shuffles (Exchange), cartesian products, row-at-a-time Python
(BatchEvalPython), scans, and whole-stage-codegen spans — then flags:

- CartesianProduct anywhere except the queries that are cross joins by
  contract (c06) or broadcast a tiny side (checked by tests/test_plans.py);
- BatchEvalPython outside BATCH_EVAL_OK (k01 pickled scalar UDF and k05
  Python UDTF, where row-at-a-time Python IS the operator);
- exchange counts above EXCHANGE_WARN (a high shuffle count usually means a
  missed reuse or an unintended re-aggregation).

This is an audit aid, not a gate — the enforced per-query assertions live in
tests/test_plans.py.  Usage: python tools/plan_audit.py [sf_dir] [prefix...]

Do NOT run concurrently with the test suite or t2_emulation at the same
sf_dir: building a write-query's plan executes its fixture setup (curated
writes, bucketed tables), and two sessions mutating the same `.scratch/`
layout corrupt each other's reads.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXCHANGE_WARN = 6
CARTESIAN_OK = {"c06_cross"}       # cross join IS the operator
BATCH_EVAL_OK = {"k01_python_udf",   # pickled scalar UDF IS the operator
                 "k05_python_udtf"}  # Python table function IS the operator


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    prefixes = tuple(sys.argv[2:]) or ("",)

    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session

    registry.load_all()
    spark = build_session("plan-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    flagged = []
    print(f"{'query':34s} {'exch':>4s} {'cart':>4s} {'pyUDF':>5s} "
          f"{'scan':>4s} {'wscg':>4s}  flags")
    for name, fn in sorted(registry.QUERIES.items()):
        if not name.startswith(prefixes):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # streaming plans can't be pre-executed here
            print(f"{name:34s} {'-':>4s} {'-':>4s} {'-':>5s} {'-':>4s} {'-':>4s}  "
                  f"skipped: {type(exc).__name__}")
            continue
        # count real shuffles only — BroadcastExchange is the cheap shape we
        # WANT, and ReusedExchange is a reuse, not a new shuffle
        n_ex = (plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning")
                + plan.count("Exchange SinglePartition"))
        n_cart = plan.count("CartesianProduct")
        n_py = plan.count("BatchEvalPython")
        n_scan = plan.count("FileScan") + plan.count("Scan parquet")
        n_wscg = plan.count("WholeStageCodegen")
        flags = []
        if n_cart and name not in CARTESIAN_OK:
            flags.append("CARTESIAN")
        if n_py and name not in BATCH_EVAL_OK:
            flags.append("ROW_PYTHON")
        if n_ex > EXCHANGE_WARN:
            flags.append(f"MANY_EXCHANGES({n_ex})")
        if flags:
            flagged.append((name, flags))
        print(f"{name:34s} {n_ex:4d} {n_cart:4d} {n_py:5d} "
              f"{n_scan:4d} {n_wscg:4d}  {','.join(flags)}")

    print(f"\nflagged: {len(flagged)}")
    for name, flags in flagged:
        print(f"  {name}: {','.join(flags)}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
