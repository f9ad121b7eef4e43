#!/usr/bin/env python
"""Scale-stress harness: does the curation hot path scale near-linearly?

The correctness suite proves the kernels right at sf0.01-0.1; this tool
probes the claim the docstrings make about 100 TB — that the expensive
operators are corpus-LINEAR (banding equi-joins, broadcast gram joins,
map-side aggregates), not quadratic.  It amplifies the documents table
K-fold IN-FLIGHT (no writes): replica r prefixes every token with ``r<r>_``,
so each replica is an independent shard — no cross-replica shingle, token,
or fingerprint collisions — and the workload grows exactly K-fold.  A
kernel whose wall clock grows much faster than K has a hidden superlinear
stage that 1000x data would expose.

Measured kernels: minhash_band_pairs, tfidf_top_terms, token_tf_df, and
cc_components are the REGISTERED implementations (factored out of
i34/i08/i07/i27 for exactly this tool); the dedup row is the
representative fingerprint-groupBy shape of i01/i35, labeled "-shape" so
the report never claims code it didn't run.

Prints per-kernel seconds at each K plus the time ratio vs K-fold-linear
extrapolation from the smallest K (ratio ~<= 1 is healthy: fixed per-job
overhead amortizes; >> 1 means superlinear work).  Every kernel runs once
untimed at the smallest K first — an unwarmed baseline was measured 2-4x
its steady state, which would deflate all later ratios and blind the
SUPERLINEAR flag.  Single-shot timings on a shared box — read trends, not
third digits.

Usage: python tools/scale_stress.py [sf_dir] [K ...]   (default sf0.1, K=1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def amplify(docs: DataFrame, k: int) -> DataFrame:
    """K independent shards: replica r prefixes every token with r<r>_."""
    if k == 1:
        return docs
    spark = docs.sparkSession
    reps = F.broadcast(spark.range(k).withColumnRenamed("id", "rep"))
    return (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.regexp_replace(
                "text", "(^| )",
                F.concat(F.lit("$1r"), F.col("rep"), F.lit("_"))).alias("text"),
        )
    )


def kernels():
    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        minhash_band_pairs, tfidf_top_terms, token_tf_df,
    )

    def exact_dedup(d):
        return (d.groupBy(F.md5("text").alias("fp"))
                .agg(F.min("doc_id").alias("keep"),
                     F.count(F.lit(1)).alias("n")))

    # banding/tfidf/token-stats (and cc below) drive the REGISTERED
    # kernels (minhash_band_pairs / tfidf_top_terms / token_tf_df /
    # cc_components — factored out of i34/i08/i07/i27 for exactly this);
    # dedup-shape is the representative fingerprint-groupBy stage of
    # i01/i35, labeled so the report never claims code it didn't run
    return {"banding[i34-kernel]": minhash_band_pairs,
            "dedup-shape": exact_dedup,
            "tfidf[i08-kernel]": tfidf_top_terms,
            "token-stats[i07-kernel]": token_tf_df}


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    # ascending order is load-bearing: the first K is the per-unit baseline
    ks = sorted({int(a) for a in args[1:]}) or [1, 4, 16]

    from csv_to_parquet_aws_datalake_spark.loader import load_table
    from csv_to_parquet_aws_datalake_spark.session import build_session

    spark = build_session("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n0 = docs.count()

    # connected components gets its own edge-based amplification: replica r
    # offsets both endpoints by r * 2^40, giving K disjoint copies of the
    # base component structure — rounds stay O(log component size) while
    # per-round join/agg work grows K-fold.  The iterative kernel is the
    # one whose scale behavior a single-shot plan can least predict.
    from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
        cc_components, minhash_band_pairs,
    )

    base_edges = (minhash_band_pairs(docs)
                  .select(F.col("da").alias("a"), F.col("db").alias("b"))
                  .localCheckpoint())

    def cc_at(k: int):
        reps = F.broadcast(spark.range(k).withColumnRenamed("id", "rep"))
        off = F.col("rep") * F.lit(1 << 40)
        e = base_edges.crossJoin(reps).select(
            (F.col("a") + off).alias("a"), (F.col("b") + off).alias("b"))
        return cc_components(e)

    # warm-up: run every kernel once at the smallest K UNTIMED, so the
    # baseline excludes JVM/JIT/first-job startup.  An inflated baseline
    # deflates every later ratio and blinds the SUPERLINEAR detector
    # (measured: an unwarmed K=1 base ran ~2-4x its steady state).
    d0 = amplify(docs, ks[0]).localCheckpoint()
    for fn in kernels().values():
        fn(d0).write.format("noop").mode("overwrite").save()
    cc_at(ks[0]).write.format("noop").mode("overwrite").save()

    base: dict[str, float] = {}
    unhealthy = 0
    print(f"{'kernel':20s} {'K':>4s} {'rows':>9s} {'sec':>8s} {'vs-linear':>9s}")
    for k in ks:
        # pin the amplified input so every kernel at this K reads the same
        # materialized shard set (isolates kernel cost from amplification)
        d = d0 if k == ks[0] else amplify(docs, k).localCheckpoint()
        timed = dict(kernels())
        timed["cc[i27-kernel]"] = lambda _d, _k=k: cc_at(_k)
        for name, fn in timed.items():
            t0 = time.perf_counter()
            fn(d).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            if k == ks[0]:
                base[name] = sec / k
            ratio = sec / (base[name] * k)
            flag = ""
            if ratio > 2.0 and k > ks[0]:
                flag = "  SUPERLINEAR?"
                unhealthy += 1
            print(f"{name:20s} {k:4d} {n0 * k:9d} {sec:8.2f} {ratio:8.2f}x{flag}")
    spark.stop()
    return 1 if unhealthy else 0


if __name__ == "__main__":
    sys.exit(main())
