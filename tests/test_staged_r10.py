"""Round-10-era staged candidates (operators/staged_r10.py):
oracle-differential through the driver's comparator, plan pins, and
independent references.  The i59 semdedup-ANN tests moved to
tests/test_r11_queries.py when i59 registered (round 11)."""

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


def test_i60_histogram_consistent_with_span_kernel(spark, sf_dir):
    # independent reference: the histogram must be an exact rollup of the
    # REGISTERED i48 span output (same kernel, different reduction) —
    # recompute the per-source bucket counts, doc counts, and maxima in
    # pure Python from the raw spans (the i55 census, whose role as this
    # cross-check ended when it was retired in r12, did the same rollup)
    fn, _ = STAGED["i60_span_length_histogram"]
    got = {(r["source"], r["len_bucket"]):
           (r["n_spans"], r["n_docs"], r["max_len"])
           for r in fn(spark, sf_dir).collect()}

    spans = registry.QUERIES["i48_span_dedup"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source")
    joined = spans.join(docs, "doc_id").collect()

    def bucket(ln: int) -> str:
        if ln < 8:
            return "05-07"
        if ln < 16:
            return "08-15"
        if ln < 32:
            return "16-31"
        if ln < 64:
            return "32-63"
        return "64+"

    agg: dict[tuple, tuple] = {}
    for r in joined:
        ln = r["span_end"] - r["span_start"] + 1
        key = (r["source"], bucket(ln))
        n, ds, mx = agg.get(key, (0, set(), 0))
        ds.add(r["doc_id"])
        agg[key] = (n + 1, ds, max(mx, ln))
    want = {k: (n, len(ds), mx) for k, (n, ds, mx) in agg.items()}
    assert got == want


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


def test_k17_corpus_is_ascii(spark, sf_dir):
    # ADVICE r9d (carried from the retired k16 suite): the DuckDB oracle
    # indexes CHARACTERS/ord() code points while the Spark kernel hashes
    # utf-8 BYTES, and the caller's length(text) >= 8 filter counts
    # characters — equal only while the corpus is ASCII.  Pin the
    # precondition itself so a future non-ASCII corpus fails loudly
    # HERE, not as an inscrutable hash mismatch (a byte-table oracle is
    # the documented remedy in _PHASH_CTES_SQL).
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_wide = d.filter(F.octet_length("text") != F.length("text")).count()
    assert n_wide == 0, (
        f"{n_wide} non-ASCII documents: k17's character-indexed oracle "
        "no longer equals the byte-hashing kernel — switch to a "
        "byte-table oracle")


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


def test_i65_matches_pure_python_classifier(spark, sf_dir):
    # independent reference: the whole scorer recomputed in Python from
    # raw text (the shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential without this)
    import hashlib

    fn, _ = STAGED["i65_quality_classifier"]
    got = {r["doc_id"]: (r["n_toks"], r["score_e4"], r["keep"])
           for r in fn(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    want = {}
    for r in docs:
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        sw = sum(int(hashlib.md5(t.encode()).hexdigest()[:2], 16) - 128
                 for t in toks)
        n = len(toks)
        score = ((sw + 128 * n) * 10000) // (n * 256)  # operands >= 0
        want[r["doc_id"]] = (n, score, score >= 5000)
    assert got == want
    # the threshold must split the corpus (a one-sided keep gate would
    # mean the fixture never exercises the other branch)
    keeps = {v[2] for v in want.values()}
    assert keeps == {True, False}


def test_i65_plan_is_map_side_only(spark, sf_dir):
    # the i25/i56 idiom: no explode, no exchange at all — one
    # scan+project is the whole 100 TB cost
    fn, _ = STAGED["i65_quality_classifier"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate explode" not in plan
    assert "BatchEvalPython" not in plan  # pure JVM expressions
