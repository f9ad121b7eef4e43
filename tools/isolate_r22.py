#!/usr/bin/env python
"""Round-21 isolation harness (guide §1): per-query timing split into
query-BUILD time (Python/py4j DataFrame construction), noop-sink execution
(computation only, §1.4), and collect() (the bench methodology), plus an
`.explain("formatted")` capture per query.

Usage:
    python tools/isolate_r22.py before|after [query ...]

Writes plans/r22/<query>_<tag>.txt and prints a table.  Queries default to
the 18 bench.py entries (headline + LLM tranche).  Each query is labelled
via setJobDescription so UI/eventlog reads map back to names (§1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session

    registry.load_all()
    import bench
    queries = dict(registry.QUERIES)
    queries["j01_batch_form"] = bench._batch_tumbling

    names = sys.argv[2:] or (list(bench.HEADLINE.values())
                             + list(bench.LLM_TRANCHE))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    spark = build_session("isolate-r22")
    spark.sparkContext.setLogLevel("ERROR")

    plans_dir = os.path.join(REPO, "plans", "r22")
    os.makedirs(plans_dir, exist_ok=True)

    # warm-up: mirror bench.py (sf0.001 pass + page-cache touch)
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    for n in names:
        queries[n](spark, warm_dir).collect()
    from csv_to_parquet_aws_datalake_spark.loader import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    print(f"{'query':<28} {'build_ms':>9} {'noop_s':>8} {'collect_s':>10}")
    results = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"isolate:{n}")
        # build time: DataFrame construction only (driver-side)
        builds, noops, colls = [], [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = queries[n](spark, sf_dir)
            builds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noops.append(time.perf_counter() - t0)
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).collect()
            colls.append(time.perf_counter() - t0)
        b = statistics.median(builds) * 1e3
        x = statistics.median(noops)
        c = statistics.median(colls)
        results[n] = {"build_ms": round(b, 1), "noop_s": round(x, 3),
                      "collect_s": round(c, 3)}
        print(f"{n:<28} {b:>9.1f} {x:>8.3f} {c:>10.3f}")
        # plan capture (after timing so the explain job does not warm caches
        # mid-measurement)
        with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as fh:
            df = queries[n](spark, sf_dir)
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(None)

    import json
    out = os.path.join(REPO, ".scratch", f"isolate_r22_{tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fh:
        json.dump(results, fh, indent=1)
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
