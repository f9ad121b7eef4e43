"""Round-10-era staged candidates (operators/staged_r10.py):
oracle-differential through the driver's comparator, plan pins, and
independent references.  The i59 semdedup-ANN tests moved to
tests/test_r11_queries.py when i59 registered (round 11); the i63
line-dedup-rewrite tests moved to tests/test_r13_queries.py when it
registered (round 13), the i60/i62 tests retired with their candidates
in the same §7.9 review, and the i65 quality-classifier tests moved to
tests/test_r14_queries.py when it registered (round 14)."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import STAGED
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_not_registered():
    assert not set(STAGED) & set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_matches_oracle(name, spark, oracle, sf_dir):
    fn, sql = STAGED[name]
    df = fn(spark, sf_dir)
    assert_no_antipatterns(name, df)
    assert sql is not None
    compare(df, oracle, sql)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_tri_sf_parity(name, spark):
    fn, sql = STAGED[name]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = make_oracle_con(sf_dir)
        try:
            compare(fn(spark, sf_dir), con, sql)
        finally:
            con.close()


def test_i61_matches_pure_python_bm25(spark, sf_dir):
    # independent reference (the i57 guard generalized): the whole
    # multi-query BM25 recomputed in Python from raw text — the oracle
    # SQL mirrors the Spark expressions, so a both-engines-wrong
    # transcription would pass the differential without this
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        _BM25_ALL_TERMS,
        _BM25_QUERY_SETS,
    )

    def round6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    fn, _ = STAGED["i61_bm25_query_sets"]
    got = {(r["query_id"], r["doc_id"]): r["bm25"]
           for r in fn(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs
            if r["text"] is not None}
    nd = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / nd
    df_t = {q: sum(1 for t in toks.values() if q in t)
            for q in _BM25_ALL_TERMS}
    want = {}
    for qid, terms in _BM25_QUERY_SETS:
        scored = []
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
                scored.append((doc_id, round6(s)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for doc_id, s in scored[:5]:
            want[(qid, doc_id)] = s
    assert got == want


def test_i61_plan_shape(spark, sf_dir):
    # per-query top-5 must be TakeOrderedAndProject branches (a
    # query_id-partitioned window would put EVERY matching doc in one
    # of |queries| unsplittable partitions — the i48 hazard class);
    # no window, no cartesian
    fn, _ = STAGED["i61_bm25_query_sets"]
    df = fn(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("TakeOrderedAndProject") == 3
    assert "Window" not in plan
    assert "CartesianProduct" not in plan

    # the localCheckpoint pin hides the scoring lineage from the plan
    # above (r10 fourth review: the earlier inline form left it
    # entirely unlinted) — lint the UNPINNED scored frame separately,
    # the i58/i59 discipline: broadcast joins for the query-map/df/
    # stats sides, no cartesian, no window anywhere upstream either
    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        bm25_query_scores,
    )

    splan = physical_plan(bm25_query_scores(spark, sf_dir))
    assert splan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in splan
    assert "Window" not in splan


def test_k17_matches_bruteforce_python(spark, sf_dir):
    # independent reference: brute-force all-pairs Hamming over
    # pure-Python aHash codes (the banded join must find EXACTLY the
    # radius<=1 pairs — the pigeonhole guarantee, verified against an
    # algorithm with no banding at all)
    from tests.test_property import _phash_py

    fn, _ = STAGED["k17_phash_band_neardup"]
    got = {(r["da"], r["db"], r["hamming"])
           for r in fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    codes = {r["doc_id"]: _phash_py(r["text"].encode())
             for r in docs if r["text"] is not None and len(r["text"]) >= 8}
    ids = sorted(codes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(codes[a] ^ codes[b]).count("1")
            if ham <= 1:
                want.add((a, b, ham))
    assert got == want
    assert any(h == 0 for _, _, h in want)  # both distance classes
    assert any(h == 1 for _, _, h in want)


def test_k17_plan_shape(spark, sf_dir):
    # band-keyed equi-join over the pinned codes: no cartesian, no
    # window (the i34 shape)
    fn, _ = STAGED["k17_phash_band_neardup"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

    # the localCheckpoint pin hides the hashing lineage from the plan
    # above — lint the UNPINNED codes frame separately (this pin moved
    # here from the retired k16 census test): Arrow mapInPandas, never
    # row-at-a-time Python, and map-side only (no exchange below it)
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        phash_codes,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    binary = (d.filter(F.length("text") >= 8)
              .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    cplan = physical_plan(phash_codes(binary))
    assert "MapInPandas" in cplan and "BatchEvalPython" not in cplan
    assert "Exchange hashpartitioning" not in cplan


def test_k17_kernel_hand_computed(spark):
    # "aaaabbbb": L=8, W=1, tot=780; blocks 97*4 then 98*4 — bit b set
    # iff bsum*8 > 780, so exactly the four 98-blocks: phash 0b00001111
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        phash_codes,
    )

    df = (spark.createDataFrame([(1, "aaaabbbb"), (2, "bbbbaaaa")],
                                "doc_id long, text string")
          .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    got = {r["doc_id"]: r["phash"] for r in phash_codes(df).collect()}
    assert got == {1: 0b00001111, 2: 0b11110000}


def test_k17_matches_oracle_on_multibyte_text(spark, sf_dir):
    # r13: the oracle went byte-true (hex(encode) extraction via
    # _hx_byte, replacing the ord(substr) code-point shortcut whose
    # ASCII-only validity the retired test_k17_corpus_is_ascii pinned) —
    # prove kernel/oracle parity directly on the multibyte variant the
    # registered k-family sweeps use, BEFORE k17's named r16
    # registration makes the differential suite do it per-run
    from tests.test_differential import _unicode_docs_dir

    d = _unicode_docs_dir(sf_dir)
    fn, sql = STAGED["k17_phash_band_neardup"]
    con = make_oracle_con(d)
    try:
        compare(fn(spark, d), con, sql)
    finally:
        con.close()


def test_i64_consistent_with_i61_and_python(spark, sf_dir):
    # two independent references: (1) each probe's top candidate must
    # equal i61's rank-1 row whenever that row clears the threshold
    # (shared scoring, different tails); (2) the candidate counts and
    # top rows recomputed from the pure-Python BM25 of the i61 test
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        _BM25_ALL_TERMS,
        _BM25_QUERY_SETS,
        _DECON_TAU,
    )

    def round6(x: float) -> float:
        return float(Decimal(x).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    got = {r["query_id"]: (r["n_candidates"], r["top_doc"], r["top_bm25"])
           for r in STAGED["i64_bm25_decontamination"][0](
               spark, sf_dir).collect()}
    topk = {}
    for r in STAGED["i61_bm25_query_sets"][0](spark, sf_dir).collect():
        topk.setdefault(r["query_id"], []).append((r["doc_id"], r["bm25"]))
    for q, rows in topk.items():
        best_doc, best_score = rows[0]
        if best_score >= _DECON_TAU:
            assert got[q][1] == best_doc and got[q][2] == best_score

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
        cand = []
        for doc_id, t in toks.items():
            s = 0.0
            for q in terms:
                c = t.count(q)
                if c:
                    idf = math.log(
                        1.0 + (nd - df_t[q] + 0.5) / (df_t[q] + 0.5))
                    s += (idf * (c * 2.2)
                          / (c + 1.2 * (0.25 + 0.75 * len(t) / avgdl)))
            s = round6(s)
            if s >= _DECON_TAU:
                cand.append((doc_id, s))
        cand.sort(key=lambda x: (-x[1], x[0]))
        assert cand, qid  # tau calibrated: never an empty probe
        want[qid] = (len(cand), cand[0][0], cand[0][1])
    assert got == want


