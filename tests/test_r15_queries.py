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
like every registered query.

The round's continuation session pulled the ledger's named r16 and r17
moves forward: k17 pHash band near-dup registered (kernel
``phash_codes`` moved to its family home in multimodal.py), draining
the r10 bank to empty — its independent brute-force reference, kernel
hand-compute, and plan pins migrated here from tests/test_staged_r10.py,
and its multibyte parity check joined the permanent
_BYTE_ARITHMETIC_QUERIES sweep in tests/test_differential.py; and i66
DSIR importance registered (kernel ``dsir_importance_frame`` moved to
its family home in llm_pipeline.py), draining the r15 bank too — its
pure-Python reference, target-separation behavioral pin, and plan pin
migrated here from tests/test_staged_r15.py."""

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


def test_k17_matches_bruteforce_python(spark, sf_dir):
    # independent reference: brute-force all-pairs Hamming over
    # pure-Python aHash codes (the banded join must find EXACTLY the
    # radius<=1 pairs — the pigeonhole guarantee, verified against an
    # algorithm with no banding at all)
    from tests.test_property import _phash_py

    got = {(r["da"], r["db"], r["hamming"])
           for r in registry.QUERIES["k17_phash_band_neardup"](
               spark, sf_dir).collect()}
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
    plan = physical_plan(
        registry.QUERIES["k17_phash_band_neardup"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

    # the localCheckpoint pin hides the hashing lineage from the plan
    # above — lint the UNPINNED codes frame separately (this pin moved
    # here from the retired k16 census test): Arrow mapInPandas, never
    # row-at-a-time Python, and map-side only (no exchange below it)
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.multimodal import (
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

    from csv_to_parquet_aws_datalake_spark.operators.multimodal import (
        phash_codes,
    )

    df = (spark.createDataFrame([(1, "aaaabbbb"), (2, "bbbbaaaa")],
                                "doc_id long, text string")
          .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    got = {r["doc_id"]: r["phash"] for r in phash_codes(df).collect()}
    assert got == {1: 0b00001111, 2: 0b11110000}


def test_streaming_tuning_confs_restore(spark, sf_dir):
    # the r15 state tuning scopes shuffle-partition and no-data-batch
    # confs to one stream via the session clone captured at start();
    # the shared session must come back untouched (a leaked conf would
    # silently re-plan every later batch query in the suite)
    keys = ("spark.sql.shuffle.partitions",
            "spark.sql.streaming.noDataMicroBatches.enabled")
    before = tuple(spark.conf.get(k) for k in keys)
    from csv_to_parquet_aws_datalake_spark import registry

    assert registry.QUERIES["j08_stream_stream_join"](
        spark, sf_dir).count() > 0
    assert tuple(spark.conf.get(k) for k in keys) == before


def test_no_data_batch_is_load_bearing_for_append_windows(spark, tmp_path):
    # mechanism pin for the r15 no_data_batch contract: an append-mode
    # windowed aggregation EMITS only when the watermark passes a
    # window's end, and after the last data batch that advancement
    # happens in the trailing no-data batch — disabling it starves the
    # final finalizable windows.  This is exactly why j05 keeps the
    # default while j04/j07/j08 (whose rows all emit inside data
    # batches) may skip it.
    import datetime

    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.streaming.queries import (
        _run_to_memory,
    )

    t0 = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(i, t0 + datetime.timedelta(minutes=i)) for i in range(120)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "event_id long, ts timestamp") \
        .coalesce(1).write.parquet(src)

    def agg():
        return (spark.readStream.schema("event_id long, ts timestamp")
                .parquet(src)
                .withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "30 minutes").alias("w"))
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.col("w.start").alias("ws"), "n"))

    with_ndb = _run_to_memory(agg(), "ndb_on", "append").count()
    without = _run_to_memory(agg(), "ndb_off", "append",
                             no_data_batch=False).count()
    # one data batch: watermark is epoch DURING it, so nothing emits
    # in-batch; the no-data batch advances it to 11:49 and finalizes
    # windows ending <= 11:49 — starts 10:00/10:30/11:00 (ends
    # 10:30/11:00/11:30) emit, start 11:30 (end 12:00) is withheld
    # -> 3 windows
    assert with_ndb == 3
    assert without == 0


def test_i66_matches_pure_python_dsir(spark, sf_dir):
    # independent reference: the whole scorer recomputed in Python from
    # raw text (the shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential without this)
    import hashlib

    from csv_to_parquet_aws_datalake_spark.operators.llm_pipeline import (
        _DSIR_B,
        _DSIR_SCALE,
        _DSIR_TARGET_LANG,
    )

    got = {r["doc_id"]: (r["n_feats"], r["dsir_e4"])
           for r in registry.QUERIES["i66_dsir_importance"](
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
    plan = physical_plan(
        registry.QUERIES["i66_dsir_importance"](spark, sf_dir))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("BroadcastHashJoin") >= 1   # 256-row weight table
    # the 1-row totals attach is a broadcast nested loop, not a shuffle
    assert "BroadcastNestedLoopJoin" in plan
