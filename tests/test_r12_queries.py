"""i56 Gopher-rule breakdown (registered round 12 — graduated from the
r9 staging module per the VERDICT r11 default registration): rule
partition invariants over the fixture corpus plus the map-side
single-rollup plan pin.  Oracle parity runs through the registry-wide
differential suite (tests/test_differential.py) like every registered
query."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def test_i56_rules_partition_the_corpus(spark, sf_dir):
    # fail counts are per-rule (a doc can fail several), but n_pass must
    # complement the union of failures, and every count is bounded by
    # n_docs; the corpus must actually exercise BOTH sides of the length
    # rule (10-99-token docs straddle the 50 bound)
    fn = registry.QUERIES["i56_gopher_rule_breakdown"]
    rows = fn(spark, sf_dir).collect()
    tot_docs = sum(r["n_docs"] for r in rows)
    tot_pass = sum(r["n_pass"] for r in rows)
    tot_fail_len = sum(r["fail_len"] for r in rows)
    assert 0 < tot_fail_len < tot_docs  # both sides of the bound exist
    assert 0 < tot_pass < tot_docs
    for r in rows:
        for c in ("fail_len", "fail_wordlen", "fail_stop", "n_pass"):
            assert 0 <= r[c] <= r["n_docs"], (r["source"], c)
        assert r["n_pass"] + max(
            r["fail_len"], r["fail_wordlen"], r["fail_stop"]) <= r["n_docs"]
        assert r["pass_share"] == pytest.approx(
            r["n_pass"] / r["n_docs"], abs=1e-6)


def test_ann_assignment_shard_count_invariance(spark):
    # probe sharding (assign_nearest_centroid_ann's centroid_shards,
    # r12 — the executable form of the k·dim broadcast-budget remedy)
    # must be a pure physical rewrite: the min-of-struct(-acos, clabel)
    # aggregate has to reproduce the m=1 window's (rounded-cosine desc,
    # clabel asc) argmax exactly, for any shard count, on BOTH dispatch
    # paths.  The frame makes ties load-bearing: v6/v7 are equidistant
    # from centroids cA and cZ (same rounded cosine), so the clabel
    # tie-break decides — a shard split that separates cA from cZ must
    # still pick the lexicographically-lower label.
    from csv_to_parquet_aws_datalake_spark.operators.llm_vectors import (
        assign_nearest_centroid_ann,
    )

    rows = [
        (1, "cA", [1.0, 0.0, 0.0, 0.0]),
        (2, "cA", [0.0, 1.0, 0.0, 0.0]),
        (3, "cZ", [0.0, 0.0, 1.0, 0.0]),
        (4, "cZ", [-1.0, -1.0, -1.0, 1.0]),
        (5, "cA", [1.0, 1.0, 0.0, 0.0]),
        # tie rows: symmetric between the two centroid means
        (6, "cZ", [1.0, 1.0, 1.0, 0.0]),
        (7, "cA", [-1.0, -1.0, -1.0, 2.0]),
        # zero-norm row: every cosine is NaN, which Spark sorts GREATEST
        # — raw, it would WIN the m=1 desc window but LOSE the sharded
        # min-of-struct.  _nan_safe_acos pins NaN to -2.0 on BOTH paths
        # (ADVICE r12), so this row must take the lowest routed clabel
        # under every shard count rather than breaking the invariance.
        (8, "cZ", [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>")
    base = sorted((r["vec_id"], r["clabel"])
                  for r in assign_nearest_centroid_ann(df).collect())
    assert len(base) == len(rows)  # routing covers every vector
    for m in (2, 3, 7):
        got = sorted(
            (r["vec_id"], r["clabel"])
            for r in assign_nearest_centroid_ann(
                df, centroid_shards=m).collect())
        assert got == base, f"centroid_shards={m} diverged"
    # the ball-routing dispatch path shares the sharded scoring tail
    ball = sorted(
        (r["vec_id"], r["clabel"])
        for r in assign_nearest_centroid_ann(
            df, ball_min_codes=0, centroid_shards=3).collect())
    assert ball == base


def test_ann_assignment_sharded_plan_shape(spark):
    # the scale contract of the sharded path: every centroid join stays
    # a broadcast (one branch per shard), the final argmax is a hash
    # AGGREGATE with a map-side partial (never a window's sort-shuffle),
    # and no sort-merge join sneaks in on the low-cardinality bucket key
    from csv_to_parquet_aws_datalake_spark.operators.llm_vectors import (
        assign_nearest_centroid_ann,
    )
    from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

    df = spark.createDataFrame(
        [(i, f"c{i % 3}", [float(i % 5) - 2.0, 1.0, float(i % 7)])
         for i in range(1, 40)],
        "vec_id long, label string, embedding array<float>")
    plan = physical_plan(assign_nearest_centroid_ann(df, centroid_shards=3))
    assert plan.count("BroadcastHashJoin") >= 6  # routing+centroids ×3
    assert "SortMergeJoin" not in plan
    # map-side per-shard argmax: a partial min BEFORE the vec_id
    # exchange (SortAggregate, not HashAggregate — the struct carries
    # the embedding array, which is not a mutable fixed-width buffer;
    # the partial still runs map-side, which is the scale property)
    assert "partial_min" in plan
    # the m=1 argmax window over (acos, clabel) must be GONE from the
    # scoring tail; the only remaining windows are the routing builder's
    # bounded code-key rankings (<= 2^bits rows), which never see acos
    for line in plan.splitlines():
        if "Window" in line:
            assert "acos" not in line, line


def test_i56_is_map_side_single_rollup(spark, sf_dir):
    # i25's idiom carried over: no explode-shuffle of tokens — the ONLY
    # exchange is the source rollup (plus AQE's coalesced read of it)
    fn = registry.QUERIES["i56_gopher_rule_breakdown"]
    plan = physical_plan(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Generate explode" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side agg


def test_streaming_state_queries_green_under_rocksdb(spark, oracle, sf_dir):
    # VERDICT r11 "what's missing" item 2: the RocksDB state store was
    # documented (SURVEY §7.4) but never exercised.  The five stateful
    # j-rows (tumbling/session aggs, dedup, applyInPandasWithState,
    # stream-stream join) re-run with the production state-store
    # provider and must still hash-match their oracles.  The provider
    # conf is read at QUERY start, so setting it on the shared session
    # and restoring in finally scopes it to this test; the bogus-class
    # probe below proves the conf path is honored (a typo'd provider
    # cannot silently fall back to the memory store).
    from tests.differential import compare

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = ("org.apache.spark.sql.execution.streaming.state."
             "RocksDBStateStoreProvider")
    prior = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        for n in ("j01_stream_tumbling", "j03_stream_session",
                  "j04_stream_dedup", "j07_stateful_custom",
                  "j08_stream_stream_join"):
            compare(registry.QUERIES[n](spark, sf_dir), oracle,
                    registry.ORACLES[n])
        spark.conf.set(key, "com.example.NoSuchProvider")
        # match on the class name: ONLY the provider-load failure may
        # satisfy the probe (an unrelated error passing a bare
        # raises(Exception) would hide a silently-ignored conf)
        with pytest.raises(Exception, match="NoSuchProvider"):
            registry.QUERIES["j01_stream_tumbling"](spark, sf_dir).collect()
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)
