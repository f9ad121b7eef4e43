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


def test_i56_is_map_side_single_rollup(spark, sf_dir):
    # i25's idiom carried over: no explode-shuffle of tokens — the ONLY
    # exchange is the source rollup (plus AQE's coalesced read of it)
    fn = registry.QUERIES["i56_gopher_rule_breakdown"]
    plan = physical_plan(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Generate explode" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side agg
