#!/usr/bin/env python
"""Round-22 targeted stage profiler (guide §1): splits the VERDICT-r21
target operators into their component jobs so the optimization attacks the
measured cost, not the assumed one.

Usage:
    python tools/profile_r22.py [i59|i27|i22|i48|jfam] ...

Each section prints median-of-N isolated timings (noop sink where the shape
allows, §1.4), labelled via setJobDescription (§1.5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def med(f, n=RUNS):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts), ts


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sections = sys.argv[1:] or ["i59", "i27", "i22", "i48", "jfam"]
    from csv_to_parquet_aws_datalake_spark import registry
    from csv_to_parquet_aws_datalake_spark.session import build_session
    from csv_to_parquet_aws_datalake_spark.loader import load_table, widen_if_narrow

    registry.load_all()
    Q = registry.QUERIES
    spark = build_session("profile-r22")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm-up: one pass at sf0.001 to compile codegen paths
    warm = "/root/testdata/sf0.001"
    for n in ("i59_semdedup_census_ann", "i27_cc_bigstar",
              "i22_dedup_clusters", "i48_span_dedup"):
        Q[n](spark, warm).collect()
    for t in ("documents", "embeddings", "events"):
        load_table(spark, SF_DIR, t).count()

    if "i59" in sections:
        from csv_to_parquet_aws_datalake_spark.operators import llm_vectors as lv
        emb = widen_if_narrow(load_table(spark, SF_DIR, "embeddings"))
        sc.setJobDescription("r22:i59 assignment only (checkpoint job)")
        m, ts = med(lambda: lv.assign_nearest_centroid_ann(emb).localCheckpoint())
        print(f"i59 assignment+checkpoint  median {m:.3f}  {['%.2f' % t for t in ts]}")
        sc.setJobDescription("r22:i59 full collect")
        m, ts = med(lambda: Q["i59_semdedup_census_ann"](spark, SF_DIR).collect())
        print(f"i59 full collect           median {m:.3f}  {['%.2f' % t for t in ts]}")
        # job-count + pair-stage isolation: assignment pinned once, census after
        assigned = lv.assign_nearest_centroid_ann(emb).localCheckpoint()
        n_cl = assigned.select("clabel").distinct().count()
        n_rows = assigned.count()
        print(f"i59 assigned rows={n_rows} distinct clusters={n_cl}")
        sc.setJobDescription("r22:i59 census over pinned assignment")
        m, ts = med(lambda: lv.semdedup_census(
            emb, assign=lambda e: assigned).collect())
        print(f"i59 census (pinned assign) median {m:.3f}  {['%.2f' % t for t in ts]}")
        df = Q["i59_semdedup_census_ann"](spark, SF_DIR)
        print(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))

    if "i27" in sections:
        sc.setJobDescription("r22:i27 full collect")
        m, ts = med(lambda: Q["i27_cc_bigstar"](spark, SF_DIR).collect())
        print(f"i27 full collect           median {m:.3f}  {['%.2f' % t for t in ts]}")

    if "i22" in sections:
        sc.setJobDescription("r22:i22 full collect")
        m, ts = med(lambda: Q["i22_dedup_clusters"](spark, SF_DIR).collect())
        print(f"i22 full collect           median {m:.3f}  {['%.2f' % t for t in ts]}")

    if "i48" in sections:
        sc.setJobDescription("r22:i48 noop")
        m, ts = med(lambda: noop(Q["i48_span_dedup"](spark, SF_DIR)))
        print(f"i48 noop                   median {m:.3f}  {['%.2f' % t for t in ts]}")

    if "jfam" in sections:
        for n in ("j12_stream_neardup_ingest", "j13_stream_outer_join"):
            sc.setJobDescription(f"r22:{n} hdfs-store")
            m, ts = med(lambda: Q[n](spark, SF_DIR).collect(), 3)
            print(f"{n} HDFS store  median {m:.3f}  {['%.2f' % t for t in ts]}")
        rocks = ("org.apache.spark.sql.execution.streaming."
                 "state.RocksDBStateStoreProvider")
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
        try:
            for n in ("j12_stream_neardup_ingest", "j13_stream_outer_join"):
                sc.setJobDescription(f"r22:{n} rocksdb-store")
                m, ts = med(lambda: Q[n](spark, SF_DIR).collect(), 3)
                print(f"{n} RocksDB     median {m:.3f}  {['%.2f' % t for t in ts]}")
        finally:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
