#!/usr/bin/env python
"""Registry-wide wall-clock sweep: run every registered query at one scale
factor and print a slowest-first table (cold + warm seconds), plus a JSON
file for round-over-round diffing.

This is the harness that caught k12's per-key cogroup pathology (29 s at
sf0.1 for a query whose plan looked clean — plan_audit counts shuffles,
not interpreter round-trips).  plan_audit answers "does the plan smell?";
this answers "where does the time actually go?".  Interpreting the table:

- j-family entries carry ~1-2 s of availableNow micro-batch setup each —
  inherent to exercising a real StreamingQuery, not a defect;
- h06/b05/h18-style full-projection queries are dominated by collect() of
  a lineitem-sized result, i.e. the measurement includes result transfer
  (the driver pays the same cost, so the number is still the honest one);
- anything else that sits far above its family's band deserves a look.

Usage: python tools/time_sweep.py [sf_dir] [prefix...]
Writes .scratch/time_sweep.json (name -> warm seconds).

Do NOT run concurrently with the test suite, plan_audit, or t2_emulation
at the same sf_dir (shared `.scratch/` fixture layouts).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    prefixes = tuple(args[1:])

    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session

    registry.load_all()
    spark = build_session("time-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for name in sorted(registry.QUERIES):
        if prefixes and not name.startswith(prefixes):
            continue
        q = registry.QUERIES[name]
        try:
            t0 = time.perf_counter()
            q(spark, sf_dir).collect()
            cold = time.perf_counter() - t0
            # warm = min of two runs: 190+ queries share one long-lived
            # context, and accumulated shuffle/GC state can tax a single
            # shot 3-5x (i06 measured 14 s mid-sweep vs 2.7 s isolated —
            # same lesson as scale_stress's per-K fresh-context fix, paid
            # here with one extra run instead of 193 session restarts)
            warm = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                q(spark, sf_dir).collect()
                warm = min(warm, time.perf_counter() - t0)
            rows.append((name, round(cold, 2), round(warm, 2)))
        except Exception as ex:  # keep sweeping; report at the end
            rows.append((name, None, None))
            print(f"{name}: ERROR {str(ex)[:140]}", file=sys.stderr)

    rows.sort(key=lambda r: -(r[2] if r[2] is not None else float("inf")))
    print(f"{'query':35s} {'cold_s':>7} {'warm_s':>7}")
    for name, cold, warm in rows:
        c = f"{cold:.2f}" if cold is not None else "ERR"
        w = f"{warm:.2f}" if warm is not None else "ERR"
        print(f"{name:35s} {c:>7} {w:>7}")

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".scratch", "time_sweep.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump({n: w for n, _, w in rows if w is not None}, fh,
                  indent=1, sort_keys=True)
    spark.stop()
    return 1 if any(c is None for _, c, _ in rows) else 0


if __name__ == "__main__":
    sys.exit(main())
