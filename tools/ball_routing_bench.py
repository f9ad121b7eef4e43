#!/usr/bin/env python
"""Measure ``srp_ball_routing`` at PRODUCTION sizing (bits=20) — the one
path VERDICT r10 item 3 marked unmeasured before i59 may register.

The registered i59 oracle runs bits=3 (the small-code-space cross-product
branch); a production registration claims "assignment is
O(n*nprobe*target) with an n-independent routing table", and the term that
claim had not measured is the table BUILD at 2^20 codes.  This tool builds
it on synthetic occupancy frames — routing sees only the distinct bucket
codes, so synthetic codes exercise exactly the measured path — across the
shapes that matter:

- uniform occupancy at |occupied| in {10k, 100k, 500k}: the healthy
  production shapes.  bits ~ log2(k / target) ties occupancy to the code
  space, so 2^20 codes implies k in the hundreds of thousands to
  millions and occupancy 1-50% of the space; expected convergence radius
  is ceil of where |occ| * V(20, r) / 2^20 >= nprobe (V = Hamming-ball
  volume): r=3 at 10k, r=2 at 100k, r=1 at 500k.
- uniform-1k at max_radius=4: a MIS-SIZED configuration (occupancy 0.1%
  of the code space — bits too large for k) that cannot converge by
  radius 3; the deeper cap shows what fixing the sizing the other way
  costs (V(20,4)=6196 rows per occupied bucket).
- clustered-ball8 (all 256 codes packed in the low 8 bits): defeats the
  early stop for every far code and forces the capped loop + RESIDUAL
  completion — the r10 third-review hazard, measured end-to-end
  (residual ~ |unconverged| x |occupied| ~ 2.7e8 Hamming evaluations).

Each row reports wall time, the routing-table row count (must be
nprobe * 2^bits exactly — every code routed), and a spot INVARIANT check
on ~200 sampled codes: the table's best bucket achieves the true
brute-force minimum Hamming distance.

Usage: python tools/ball_routing_bench.py [--bits 20] [--nprobe 3]
Prints one human-readable row per shape plus a trailing JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csv_to_parquet_aws_datalake_spark.session import build_session


def occupied_uniform(spark, bits: int, n: int, seed_tag: str):
    """n pseudo-random distinct codes in [0, 2^bits): md5-uniform (the
    repo's determinism convention — no RNG state), dense ids hashed.
    The subset of the ~4n distinct candidates is taken in md5-of-code
    order — itself uniform over the code space — so the SAME n codes
    come back on every rig (r11 review: a bare ``limit`` after the
    hash shuffle was partition-order-dependent, and ordering by the
    code VALUE would cluster the subset at the low end)."""
    return (
        spark.range(4 * n)
        .select(F.expr(
            f"int(pmod(cast(conv(substr(md5(concat('{seed_tag}', "
            f"string(id))), 1, 15), 16, 10) as bigint), {1 << bits}))"
        ).alias("cbucket"))
        .distinct()
        .orderBy(F.md5(F.concat(F.lit("pick:"),
                                F.col("cbucket").cast("string"))),
                 "cbucket")
        .limit(n)
    )


def occupied_clustered(spark, ball_bits: int):
    """Every code of the low ``ball_bits`` bits — occupancy concentrated
    so far-away codes cannot converge early (forces the residual path)."""
    return (
        spark.range(1 << ball_bits)
        .select(F.col("id").cast("int").alias("cbucket"))
    )


def run_shape(spark, label: str, occ, bits: int, nprobe: int,
              max_radius: int) -> dict:
    from csv_to_parquet_aws_datalake_spark.operators.llm_vectors import (
        srp_ball_routing,
    )

    occ = occ.localCheckpoint()  # pay generation outside the timer
    n_occ = occ.count()
    t0 = time.perf_counter()
    routing = srp_ball_routing(occ, bits, nprobe=nprobe,
                               max_radius=max_radius)
    n_rows = routing.count()
    wall = time.perf_counter() - t0
    expect = nprobe * (1 << bits)
    # invariant spot check: for ~200 sampled codes the table's best bucket
    # achieves the true brute-force min Hamming distance over ALL occupied
    sample = (
        spark.range(200)
        .select(F.expr(
            f"int(pmod(cast(conv(substr(md5(concat('probe:', string(id))),"
            f" 1, 15), 16, 10) as bigint), {1 << bits}))").alias("code"))
        .distinct().localCheckpoint())
    brute = (
        sample.crossJoin(F.broadcast(occ))
        .groupBy("code")
        .agg(F.min(F.expr("bit_count(code ^ cbucket)")).alias("bf_ham")))
    table_best = (
        routing.join(F.broadcast(sample), "code")
        .groupBy("code")
        .agg(F.min(F.expr("bit_count(code ^ cbucket)")).alias("tb_ham")))
    bad = (brute.join(table_best, "code")
           .filter(F.col("bf_ham") != F.col("tb_ham")).count())
    row = {"shape": label, "occupied": n_occ, "bits": bits,
           "nprobe": nprobe, "max_radius": max_radius, "rows": n_rows,
           "rows_ok": n_rows == expect, "argmin_mismatches": bad,
           "wall_s": round(wall, 2)}
    print(f"{label:20s} |occ|={n_occ:>7d} r<={max_radius} rows={n_rows} "
          f"ok={row['rows_ok']} argmin_bad={bad} wall={wall:8.2f}s",
          flush=True)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bits", type=int, default=20)
    ap.add_argument("--nprobe", type=int, default=3)
    args = ap.parse_args()
    spark = build_session("ball-routing-bench")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n, r in ((10_000, 3), (100_000, 3), (500_000, 2)):
        occ = occupied_uniform(spark, args.bits, n, f"occ{n}:")
        rows.append(run_shape(
            spark, f"uniform-{n}", occ, args.bits, args.nprobe, r))
    occ = occupied_uniform(spark, args.bits, 1_000, "occ1000:")
    rows.append(run_shape(
        spark, "sparse-1k-r4", occ, args.bits, args.nprobe, 4))
    occ = occupied_clustered(spark, ball_bits=8)
    rows.append(run_shape(
        spark, "clustered-ball8", occ, args.bits, args.nprobe, 3))
    print(json.dumps({"bench": "ball_routing", "rows": rows}), flush=True)
    spark.stop()
    # a registration-gate tool must not exit green over a broken builder
    # (r11 second review): fail on any coverage or argmin violation
    bad = [r["shape"] for r in rows
           if not r["rows_ok"] or r["argmin_mismatches"]]
    if bad:
        # stderr: stdout's last line must stay the JSON result even on
        # failure (the trailing-JSON contract consumers parse)
        print(f"INVARIANT FAILURES: {bad}", file=sys.stderr, flush=True)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
