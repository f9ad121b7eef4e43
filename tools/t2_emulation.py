#!/usr/bin/env python
"""Full driver-style t2 emulation: one conf-free SparkSession (as the
grading driver builds it), every ``queries()`` entry executed at sf0.01 and
compared against its ``oracle_sql()`` via the same comparator the test
suite uses (tests/differential.compare: row count, sorted-name schema,
order-insensitive values).  Rows-only queries run twice and must reproduce
the identical normalized value multiset, not just the same row count.

Usage: python tools/t2_emulation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from tests.differential import _norm, compare, make_oracle_con


def _normalized_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("t2-emulation").config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    con = make_oracle_con(sf_dir)

    n_rows = len(entry_mod.entry(spark).collect())
    print(f"entry(): {n_rows} rows")
    failures = []
    timings = {}
    t0 = time.perf_counter()
    for name in sorted(qs):
        tq = time.perf_counter()
        try:
            df = qs[name](spark, sf_dir)
            if name not in osql:
                first = _normalized_rows(df)
                again = _normalized_rows(qs[name](spark, sf_dir))
                status = "rows-only-stable" if first == again \
                    else "ROWS-ONLY-FLAKY (values differ across runs)"
            else:
                compare(df, con, osql[name])
                status = "ok"
        except AssertionError as exc:
            status = f"DIFF {exc}"
        except Exception as exc:  # noqa: BLE001 — report and continue
            status = f"ERROR {repr(exc)[:120]}"
        timings[name] = time.perf_counter() - tq
        if status not in ("ok", "rows-only-stable"):
            failures.append((name, status))
        print(f"{name:30s} {timings[name]:6.1f}s {status[:150]}", flush=True)
    print(f"\n{len(qs)} queries in {time.perf_counter() - t0:.0f}s; "
          f"{len(failures)} failures")
    print("slowest:", ", ".join(f"{n}={t:.1f}s" for n, t in
          sorted(timings.items(), key=lambda kv: -kv[1])[:15]))
    for f in failures:
        print("FAIL:", *f)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
