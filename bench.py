#!/usr/bin/env python
"""Benchmark harness: runs the headline query suite at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Query names match BASELINE.md so per-query times compare 1:1 against the
measured reference numbers (the 2x criterion, BASELINE.json).  Timing is
wall clock around collect() on a warm session; a warm-up query runs first
so JVM/codegen startup is excluded (BASELINE.md methodology).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.session import build_session

# BASELINE.md name -> registry query id
HEADLINE = {
    "q_pricing_summary": "d01_groupby_core",
    "q_join_topk": "f01_topk",
    "q_window_rank": "e01_row_number_topk",
    "q_rollup": "d04_rollup",
    "q_events_tumbling": "j01_batch_form",   # batch twin of j01 (see below)
    "q_json_extract": "h09_json",
    "q_text_tokens": "h03_split_explode",
    "q_dedup": "i01_dedup_exact",
    "q_cosine_knn": "i05_cosine_knn",
    "q_setop": "g03_intersect",
}

# LLM-pipeline curation hot path (VERDICT r4 item 2): no BASELINE.md numbers
# exist, so these are a round-over-round signal only.  Reported in the SAME
# single JSON line (extra keys) so the driver's one-line contract holds.
LLM_TRANCHE = (
    "i25_repetition_filter",
    "i28_text_canonicalize",
    "i33_decontamination",
    "i34_minhash_banding",
    "i35_incremental_dedup",
    "i40_token_rarity_score",
    "i48_span_dedup",          # added r7 with its registration: the span-level
    "k14_image_resize",        # substring-dedup hot path, tracked from here on
)


def _batch_tumbling(spark, sf_dir):
    """Batch form of the tumbling-window aggregation (BASELINE.md measured
    this shape; the streaming twin is j01_stream_tumbling)."""
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.loader import load_table
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sv")
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    queries = dict(registry.QUERIES)
    queries["j01_batch_form"] = _batch_tumbling

    spark = build_session("bench")
    # warm-up mirrors BASELINE.md methodology ("warm session"): the baseline
    # session had executed the same query shapes for the sf0.01 value check
    # before timing, so codegen/broadcast machinery was compiled.  Replicate
    # by running each headline query once at the smallest sf, then touch
    # every target-scale table once (count()) so the OS page cache is warm
    # SYMMETRICALLY — no timed query gets flattered or penalized by being
    # the first to fault in a file.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    for qid in list(HEADLINE.values()) + list(LLM_TRANCHE):
        queries[qid](spark, warm_dir).collect()
    from csv_to_parquet_aws_datalake_spark.loader import TABLES, load_table
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # Median of 5 timed runs per query: the box is shared, and single-shot
    # wall clock moved ~1.7x between rounds on byte-identical code
    # (BENCH_r01 6.71s vs BENCH_r02 11.25s); with 3 runs a single co-tenant
    # spike still shifted medians ~1.4x round-over-round (i28 in r6).  Five
    # runs discard two spikes per query for ~15s extra suite wall clock.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    def _median_time(qid: str) -> float:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[qid](spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
        return round(sorted(samples)[len(samples) // 2], 3)

    times = {name: _median_time(qid) for name, qid in HEADLINE.items()}
    llm_times = {qid: _median_time(qid) for qid in LLM_TRANCHE}

    sf_tag = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf = float(sf_tag)
    except ValueError:
        sf = sf_tag  # non-numeric dir name: report the tag verbatim
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "llm_suite_seconds": round(sum(llm_times.values()), 3),
        "llm_queries": llm_times,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
