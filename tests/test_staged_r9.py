"""Round-10 staged queries (operators/staged_r9.py): oracle-differential
through the exact comparator the driver uses BEFORE they ever take a
driver slot, plus invariant and plan pins per candidate.

The suite also pins the round-9 freeze: staged names must NOT be in the
registry (VERDICT r8: the steady-state re-proof rotation leaves a zero
registration budget; staging is the only non-displacing way to bank
work for a future round).
"""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r9 import STAGED
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_not_registered():
    overlap = set(STAGED) & set(registry.QUERIES)
    assert not overlap, f"staged queries leaked into the registry: {overlap}"


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_matches_oracle(name, spark, oracle, sf_dir):
    fn, sql = STAGED[name]
    df = fn(spark, sf_dir)
    assert_no_antipatterns(name, df)
    assert sql is not None  # all five remaining candidates are hash-provable
    compare(df, oracle, sql)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_tri_sf_parity(name, spark):
    # the r7 staging discipline: hash-parity at the two OTHER scale
    # factors too, so a driver registration is green at any sf it picks
    fn, sql = STAGED[name]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = make_oracle_con(sf_dir)
        try:
            compare(fn(spark, sf_dir), con, sql)
        finally:
            con.close()


def test_i55_census_consistent_with_span_kernel(spark, sf_dir):
    # the census must be an exact rollup of the registered i48 output
    from pyspark.sql import functions as F

    fn, _ = STAGED["i55_longest_dup_span_census"]
    census = {r["source"]: r for r in fn(spark, sf_dir).collect()}
    spans = registry.QUERIES["i48_span_dedup"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "source")
    joined = spans.join(docs, "doc_id").collect()
    by_src: dict[str, list] = {}
    for r in joined:
        by_src.setdefault(r["source"], []).append(r)
    assert set(census) == set(by_src)
    for src, rows in by_src.items():
        per_doc_max: dict[int, int] = {}
        for r in rows:
            ln = r["span_end"] - r["span_start"] + 1
            per_doc_max[r["doc_id"]] = max(
                per_doc_max.get(r["doc_id"], 0), ln)
        c = census[src]
        assert c["n_docs_with_dup"] == len(per_doc_max)
        assert c["max_span_toks"] == max(per_doc_max.values())
        assert c["n_spans"] == len(rows)
        assert c["avg_max_span_toks"] == pytest.approx(
            sum(per_doc_max.values()) / len(per_doc_max), abs=1e-6)


def test_i56_rules_partition_the_corpus(spark, sf_dir):
    # fail counts are per-rule (a doc can fail several), but n_pass must
    # complement the union of failures, and every count is bounded by
    # n_docs; the corpus must actually exercise BOTH sides of the length
    # rule (10-99-token docs straddle the 50 bound)
    fn, _ = STAGED["i56_gopher_rule_breakdown"]
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
    fn, _ = STAGED["i56_gopher_rule_breakdown"]
    plan = physical_plan(fn(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Generate explode" not in plan
    assert "partial_count" in plan or "partial_sum" in plan  # map-side agg


def test_i57_topk_and_broadcasts(spark, sf_dir):
    # scores positive, exactly 20 rows, ordered desc with doc_id
    # tie-break; plan takes TakeOrderedAndProject (never a global sort)
    # and broadcasts the tiny df/stats sides
    fn, _ = STAGED["i57_bm25_topk"]
    df = fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_i57_matches_pure_python_bm25(spark, sf_dir):
    # independent reference: the whole BM25 formula recomputed in Python
    # from raw text (shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential)
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from csv_to_parquet_aws_datalake_spark.operators.staged_r9 import (
        _BM25_TERMS,
    )

    def round6(x: float) -> float:
        # Spark's F.round is BigDecimal HALF_UP on the double's exact
        # binary expansion; Python's round() is banker's — mirror Spark
        # so an exact 6th-decimal tie cannot diverge the reference
        return float(Decimal(x).quantize(Decimal("1e-6"),
                                         rounding=ROUND_HALF_UP))

    fn, _ = STAGED["i57_bm25_topk"]
    got = [(r["doc_id"], r["bm25"]) for r in fn(spark, sf_dir).collect()]

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    toks = {r["doc_id"]: r["text"].split(" ") for r in docs
            if r["text"] is not None}
    nd = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / nd
    df_t = {q: sum(1 for t in toks.values() if q in t) for q in _BM25_TERMS}
    scored = []
    for doc_id, t in toks.items():
        s = 0.0
        for q in _BM25_TERMS:  # fixed order, mirroring the pivot columns
            c = t.count(q)
            if c:
                idf = math.log(1.0 + (nd - df_t[q] + 0.5) / (df_t[q] + 0.5))
                s += idf * (c * 2.2) / (c + 1.2 * (0.25 + 0.75 * len(t) / avgdl))
        if s > 0:
            scored.append((doc_id, round6(s)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    assert got == scored[:20]


def test_i58_keep_first_on_constructed_clusters(spark):
    # three identical vectors + one orthogonal under label c0, plus a
    # lone c1 vector identical to the orthogonal one: keep-first must
    # drop the two higher vec_ids of the triple, and the orthogonal
    # vector must MIGRATE to c1 (nearest centroid, not label) where it
    # becomes the kept representative of the identical pair there
    from csv_to_parquet_aws_datalake_spark.operators.llm_vectors import (
        semdedup_census,
    )

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, "c0", e1), (2, "c0", e1), (3, "c0", e1),  # identical triple
        (4, "c0", e2),                                 # orthogonal: kept
        (5, "c1", e2),                                 # lone cluster
    ]
    df = spark.createDataFrame(
        rows, f"vec_id long, label string, embedding array<float>")
    got = {r["cluster"]: r for r in semdedup_census(df, tau=0.9).collect()}
    # assignment is by NEAREST centroid, not by label: c1's centroid IS
    # e2 (cos 1.0), while c0's centroid [0.75, 0.25, 0, 0] gives vec 4
    # only cos ~0.316 — so vec 4 migrates to c1 and becomes the kept
    # representative of the (4, 5) identical pair there
    assert got["c0"]["n_vectors"] == 3
    assert got["c0"]["n_dup"] == 2          # vec 2 and 3, keep-first
    assert got["c0"]["dup_share"] == pytest.approx(2 / 3, abs=1e-6)
    assert got["c1"]["n_vectors"] == 2      # vec 4 (migrated) + vec 5
    assert got["c1"]["n_dup"] == 1          # vec 5, keep-first


def test_i58_census_totals_and_bounds(spark, sf_dir):
    fn, _ = STAGED["i58_semdedup_census"]
    rows = fn(spark, sf_dir).collect()
    n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(r["n_vectors"] for r in rows) == n_emb  # assignment total
    assert sum(r["n_dup"] for r in rows) > 0           # tau yields dups
    for r in rows:
        assert 0 <= r["n_dup"] < r["n_vectors"], r     # keep-first keeps >=1
        assert r["dup_share"] == pytest.approx(
            r["n_dup"] / r["n_vectors"], abs=1e-6)


def test_i58_pairs_are_cluster_bucketed(spark, sf_dir):
    # the SemDeDup scale claim, in two halves because the localCheckpoint
    # pin hides everything upstream of it from the census plan (r9
    # review: a post-pin-only assertion could never see the scoring
    # join).  1) the UNPINNED assignment plan: the centroid scoring is a
    # broadcast nested-loop, never an unbroadcast cartesian, and the
    # argmax window is vec_id-partitioned;  2) the census plan: the pair
    # stage is an equi-join on the assigned cluster, no cartesian.
    from csv_to_parquet_aws_datalake_spark.loader import load_table
    from csv_to_parquet_aws_datalake_spark.operators.llm_vectors import (
        assign_nearest_centroid,
    )
    from csv_to_parquet_aws_datalake_spark.plans.checks import (
        unpartitioned_window_nodes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    aplan = physical_plan(assign_nearest_centroid(emb))
    assert "BroadcastNestedLoopJoin" in aplan
    assert "CartesianProduct" not in aplan
    assert not unpartitioned_window_nodes(assign_nearest_centroid(emb))

    fn, _ = STAGED["i58_semdedup_census"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_k16_kernel_hand_computed(spark):
    # "aaaabbbb": L=8, W=1, tot=780; blocks 97*4 then 98*4 — bit b set
    # iff bsum*8 > 780, so exactly the four 98-blocks: phash 0b00001111
    from csv_to_parquet_aws_datalake_spark.operators.staged_r9 import (
        phash_codes,
    )
    from pyspark.sql import functions as F

    df = (spark.createDataFrame([(1, "aaaabbbb"), (2, "bbbbaaaa")],
                                "doc_id long, text string")
          .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    got = {r["doc_id"]: r["phash"] for r in phash_codes(df).collect()}
    assert got == {1: 0b00001111, 2: 0b11110000}


def test_k16_census_and_plan(spark, sf_dir):
    # collision groups exist at every SF (probed at design time), every
    # group has >=2 members and a min-doc representative; hashing is
    # map-side (no exchange below the census groupBy)
    fn, _ = STAGED["k16_phash_dedup"]
    df = fn(spark, sf_dir)
    # plan BEFORE collect: the post-execution AQE string repeats the tree
    # under '== Initial Plan ==', double-counting exchanges
    plan = physical_plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    rows = df.collect()
    assert rows  # non-empty census
    for r in rows:
        assert r["n_docs"] >= 2
        assert 0 <= r["phash"] < 256


def test_k16_corpus_is_ascii(spark, sf_dir):
    # ADVICE r9d: k16's DuckDB oracle indexes CHARACTERS/ord() code
    # points while the Spark kernel hashes utf-8 BYTES, and the caller's
    # length(text) >= 8 filter counts characters — equal only while the
    # corpus is ASCII.  Pin the precondition itself so a future
    # non-ASCII corpus fails loudly HERE, not as an inscrutable hash
    # mismatch (a byte-table oracle is the documented remedy).
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_wide = d.filter(F.octet_length("text") != F.length("text")).count()
    assert n_wide == 0, (
        f"{n_wide} non-ASCII documents: k16's character-indexed oracle "
        "no longer equals the byte-hashing kernel — switch to the "
        "byte-table oracle documented in k16_phash_dedup")
