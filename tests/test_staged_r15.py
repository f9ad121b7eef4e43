"""Round-15 staged candidate (operators/staged_r15.py): oracle-
differential through the driver's comparator, a plan pin, and an
independent pure-Python reference — the staged_r10 test discipline for
the bank's next named move (i66 DSIR importance, slated r17)."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r15 import (
    _DSIR_B,
    _DSIR_SCALE,
    _DSIR_TARGET_LANG,
    STAGED,
)
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_r15_not_registered():
    assert not set(STAGED) & set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_r15_matches_oracle(name, spark, oracle, sf_dir):
    fn, sql = STAGED[name]
    df = fn(spark, sf_dir)
    assert_no_antipatterns(name, df)
    assert sql is not None
    compare(df, oracle, sql)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_r15_tri_sf_parity(name, spark):
    fn, sql = STAGED[name]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = make_oracle_con(sf_dir)
        try:
            compare(fn(spark, sf_dir), con, sql)
        finally:
            con.close()


def test_i66_matches_pure_python_dsir(spark, sf_dir):
    # independent reference: the whole scorer recomputed in Python from
    # raw text (the shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential without this)
    import hashlib

    got = {r["doc_id"]: (r["n_feats"], r["dsir_e4"])
           for r in STAGED["i66_dsir_importance"][0](
               spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "text").collect()

    def buckets(text):
        toks = text.split(" ")
        return [int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:2], 16)
                for a, b in zip(toks, toks[1:])]

    r = [0] * _DSIR_B
    tt = [0] * _DSIR_B
    feats = {}
    langs = {}
    for row in docs:
        if row["text"] is None:
            continue
        bs = buckets(row["text"])
        if not bs:
            continue
        feats[row["doc_id"]] = bs
        langs[row["doc_id"]] = row["lang"]
        for b in bs:
            r[b] += 1
            if row["lang"] == _DSIR_TARGET_LANG:
                tt[b] += 1
    rall, tall = sum(r), sum(tt)
    w = [((tt[b] + 1) * (rall + _DSIR_B) * _DSIR_SCALE)
         // ((r[b] + 1) * (tall + _DSIR_B)) for b in range(_DSIR_B)]
    want = {doc: (len(bs), sum(w[b] for b in bs) // len(bs))
            for doc, bs in feats.items()}
    assert got == want

    # behavioral pin: the importance score must actually rank the
    # target slice above a non-target slice on average (a weight table
    # that degenerated to the neutral 10000 everywhere would pass the
    # differential — DSIR's point is the separation)
    def mean_score(lang):
        vals = [got[d][1] for d in got if langs[d] == lang]
        return sum(vals) / len(vals)

    assert mean_score(_DSIR_TARGET_LANG) > mean_score("zh")
    assert mean_score(_DSIR_TARGET_LANG) > _DSIR_SCALE  # above neutral


def test_i66_plan_shape(spark, sf_dir):
    # one conditional aggregation feeds raw AND target counts; the
    # weight table and totals attach as broadcasts; the per-doc mean is
    # a hash aggregate — no window, no cartesian, no row-at-a-time
    # Python anywhere
    fn, _ = STAGED["i66_dsir_importance"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 1   # 256-row weight table
    # the 1-row totals attach is a broadcast nested loop, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan
