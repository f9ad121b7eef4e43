"""Round-10-era staged candidates (operators/staged_r10.py):
oracle-differential through the driver's comparator, plan pins, and
independent references.  The i59 semdedup-ANN tests moved to
tests/test_r11_queries.py when i59 registered (round 11)."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r9 import (
    STAGED as STAGED_R9,
)
from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import STAGED
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_not_registered_nor_colliding():
    assert not set(STAGED) & set(registry.QUERIES)
    assert not set(STAGED) & set(STAGED_R9)


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


def test_i60_histogram_consistent_with_i55(spark, sf_dir):
    # independent reference: the histogram must be an exact refinement of
    # the i55 census (same span kernel, different rollup) — per source,
    # bucket counts sum to i55's n_spans and the bucket maxima recover
    # i55's max_span_toks
    from csv_to_parquet_aws_datalake_spark.operators.staged_r9 import (
        STAGED as R9,
    )

    fn, _ = STAGED["i60_span_length_histogram"]
    hist: dict[str, list] = {}
    for r in fn(spark, sf_dir).collect():
        hist.setdefault(r["source"], []).append(r)
    census = {r["source"]: r
              for r in R9["i55_longest_dup_span_census"][0](
                  spark, sf_dir).collect()}
    assert set(hist) == set(census)
    for src, rows in hist.items():
        assert sum(r["n_spans"] for r in rows) == census[src]["n_spans"]
        assert max(r["max_len"] for r in rows) == census[src]["max_span_toks"]
        for r in rows:
            assert r["n_docs"] <= census[src]["n_docs_with_dup"]
            lo = {"05-07": 5, "08-15": 8, "16-31": 16,
                  "32-63": 32, "64+": 64}[r["len_bucket"]]
            hi = {"05-07": 7, "08-15": 15, "16-31": 31,
                  "32-63": 63, "64+": 1 << 62}[r["len_bucket"]]
            assert lo <= r["max_len"] <= hi


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


def test_i62_census_on_constructed_docs(spark):
    # hand-checkable corpus: doc 1 and 2 share their FIRST 10-token
    # block verbatim (boilerplate); doc 3 repeats that block at a
    # NON-block-aligned offset (must NOT match — segmentation is
    # block-keyed, the documented C4 approximation); docs 4/5 share a
    # short tail line
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [
        (1, boiler + " x1 x2"),
        (2, boiler + " y1"),
        (3, "pad " + boiler),          # shifted by one token
        (4, "t0 t1"),
        (5, "t0 t1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        line_dedup_census,
    )

    got = {r["line"]: (r["n_docs"], r["n_occ"], r["keep_doc"])
           for r in line_dedup_census(df).collect()}
    assert got == {boiler: (2, 2, 1), "t0 t1": (2, 2, 4)}


def test_i62_single_line_keyed_aggregate(spark, sf_dir):
    # the whole operator is a map-side line explode plus line-keyed
    # aggregation — the distinct-doc count adds Spark's second partial
    # phase but no extra wide shuffle beyond the two agg exchanges, and
    # never a window or cartesian (the splittable-hot-KEY design claim)
    fn, _ = STAGED["i62_line_dedup_census"]
    df = fn(spark, sf_dir)
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2 and r["n_occ"] >= r["n_docs"]


def test_i63_rewrite_on_constructed_docs(spark):
    # the i62 constructed corpus, now through the rewrite: doc 1 keeps
    # its boilerplate (keep-first) and tail; doc 2 drops the boilerplate
    # and keeps "y1"; doc 3's shifted copy is untouched; doc 5 (the
    # non-keep copy of "t0 t1") is rewritten to the EMPTY string — the
    # all-dropped edge both engines must agree on
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [
        (1, boiler + " x1 x2"),
        (2, boiler + " y1"),
        (3, "pad " + boiler),
        (4, "t0 t1"),
        (5, "t0 t1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        line_dedup_rewrite,
    )

    got = {r["doc_id"]: (r["n_kept"], r["n_dropped"], r["clean_text"])
           for r in line_dedup_rewrite(df).collect()}
    assert got == {
        1: (2, 0, boiler + " x1 x2"),
        2: (1, 1, "y1"),
        3: (2, 0, "pad " + boiler),
        4: (1, 0, "t0 t1"),
        5: (0, 1, ""),
    }


def test_i63_untouched_docs_round_trip(spark, sf_dir):
    # conservation + identity invariants against the raw corpus: line
    # counts add up to the segmentation's total, and every document the
    # rewrite did NOT touch reconstructs byte-identically from its
    # pseudo-lines
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        STAGED as S10,
    )

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    out = S10["i63_line_dedup_rewrite"][0](spark, sf_dir)
    joined = out.join(d, "doc_id").collect()
    assert len(joined) == d.count()
    total = sum((len(r["text"].split(" ")) + 9) // 10 for r in d.collect())
    assert sum(r["n_kept"] + r["n_dropped"] for r in joined) == total
    touched = 0
    for r in joined:
        if r["n_dropped"] == 0:
            assert r["clean_text"] == r["text"], r["doc_id"]
        else:
            touched += 1
    assert touched > 0  # the corpus's exact-dup docs guarantee drops


def test_i63_plan_shape(spark, sf_dir):
    # line-keyed boiler agg + line-keyed probe join + one doc-keyed
    # reconstruction agg; no window, no cartesian (the hot-line case
    # stays a splittable hash key end to end)
    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        STAGED as S10,
    )

    plan = physical_plan(S10["i63_line_dedup_rewrite"][0](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


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
    # window (the i34 shape; hashing itself is hidden by the pin and
    # covered by k16's plan test)
    fn, _ = STAGED["k17_phash_band_neardup"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


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
