"""Round-15 additions: i64 BM25 decontamination census (registered this
round — graduated from the r10 staging module per the SURVEY §7.12
ledger's named fate; i61, the standalone top-k sibling over the same
kernel, retired in the same commit): the pure-Python independent
reference and the branch-top-k plan pin, migrated from
tests/test_staged_r10.py.  The kernel reference here is STRICTER than
the retired i61 test's top-5 check — it recomputes every
nonzero-scoring (query, doc) pair, so the registered i64 path plus this
test cover everything the deleted sibling proved.  Oracle parity runs
through the registry-wide differential suite (tests/test_differential.py)
like every registered query."""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
    _BM25_ALL_TERMS,
    _BM25_QUERY_SETS,
    _DECON_TAU,
    bm25_query_scores,
)
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def _round6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("1e-6"),
                                     rounding=ROUND_HALF_UP))


def _python_bm25(spark, sf_dir):
    """(query_id, doc_id) -> rounded BM25 for every nonzero-scoring
    pair, recomputed from raw text with no shared formula text — the
    shared-formula hazard guard (the oracle SQL mirrors the Spark
    expressions, so a both-engines-wrong transcription would pass the
    differential without this)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs
            if r["text"] is not None}
    nd = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / nd
    df_t = {t: sum(1 for tk in toks.values() if t in tk)
            for t in _BM25_ALL_TERMS}
    want = {}
    for qid, terms in _BM25_QUERY_SETS:
        for doc_id, t in toks.items():
            s = 0.0
            for q in terms:  # fixed order, mirroring the position pivot
                c = t.count(q)
                if c:
                    idf = math.log(
                        1.0 + (nd - df_t[q] + 0.5) / (df_t[q] + 0.5))
                    s += (idf * (c * 2.2)
                          / (c + 1.2 * (0.25 + 0.75 * len(t) / avgdl)))
            if s > 0:
                want[(qid, doc_id)] = _round6(s)
    return want


def test_bm25_kernel_matches_pure_python(spark, sf_dir):
    # every nonzero-scoring pair, not just a top-k slice — stricter
    # than the retired i61 reference this test descends from
    got = {(r["query_id"], r["doc_id"]): r["bm25"]
           for r in bm25_query_scores(spark, sf_dir).collect()}
    assert got == _python_bm25(spark, sf_dir)


def test_i64_matches_pure_python_census(spark, sf_dir):
    got = {r["query_id"]: (r["n_candidates"], r["top_doc"], r["top_bm25"])
           for r in registry.QUERIES["i64_bm25_decontamination"](
               spark, sf_dir).collect()}
    scores = _python_bm25(spark, sf_dir)
    want = {}
    for qid, _ in _BM25_QUERY_SETS:
        cand = sorted(((doc, s) for (q, doc), s in scores.items()
                       if q == qid and s >= _DECON_TAU),
                      key=lambda x: (-x[1], x[0]))
        assert cand, qid  # tau calibrated: never an empty probe
        want[qid] = (len(cand), cand[0][0], cand[0][1])
    assert got == want


def test_i64_plan_shape(spark, sf_dir):
    # per-probe top candidate must be TakeOrderedAndProject branches (a
    # query_id-partitioned window would put EVERY matching doc in one
    # of |probes| unsplittable partitions — the i48 hazard class);
    # no window, no cartesian
    df = registry.QUERIES["i64_bm25_decontamination"](spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("TakeOrderedAndProject") == 3
    assert "Window" not in plan
    assert "CartesianProduct" not in plan

    # the localCheckpoint pin hides the scoring lineage from the plan
    # above — lint the UNPINNED scored frame separately (the i58/i59
    # discipline): broadcast joins for the query-map/df/stats sides,
    # no cartesian, no window anywhere upstream either
    splan = physical_plan(bm25_query_scores(spark, sf_dir))
    assert splan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in splan
    assert "Window" not in splan
