"""Round-10 candidates, STAGED — implemented and oracle-tested but NOT
registered.

The registry is frozen at 200 (VERDICT r8: the driver re-proves 50
records per round stalest-first, so the steady-state rotation needs every
slot and any new registration permanently displaces a freshness slot).
These land here exactly like the r6->r7 staging that made the i48-i54
registrations mechanical: full implementations with DuckDB oracles,
exercised by ``tests/test_staged_r9.py`` through the SAME differential
comparator the driver uses, plus the anti-pattern linter.  Registering
one later is a mechanical move: wrap with ``@query`` in the right
operators module and delete it here.

The five (all public techniques, all composing proven kernels; a sixth,
the e19 ordered-funnel census, staged here through round 9 and was
REGISTERED in round 10 as ``operators/windows.py:e19_funnel_census`` —
the one candidate judged worth a permanent freshness slot, VERDICT r9
item 3):

- i55 longest-dup-span census — the per-source "how long are the
  repeated substrings" dashboard behind span dedup (Lee et al. 2022):
  per-doc maximal duplicated spans from i48's ``span_dedup_spans``
  kernel, reduced to per-source max/mean span length and span counts.
  The suffix-array-free census: gram islands, never pairwise doc
  comparison.
- i56 Gopher-rule quality breakdown — per-source failure counts for
  the document-quality rules of Rae et al. 2021 ("Scaling Language
  Models: Methods, Analysis & Insights from Training Gopher", §A1.1):
  word-count bounds, mean-word-length bounds, and the stop-word
  requirement, adapted to this corpus's vocabulary.  Composes i25's
  map-side-only per-doc-stats idiom: array expressions, zero exchanges
  before the one source rollup.
- i57 BM25 scoring (Robertson-Sparck Jones; the Lucene
  ``ln(1 + (N-df+0.5)/(df+0.5))`` idf variant) — top-20 docs for a
  fixed query term set, composing i08's tf/df kernels plus a doc-length
  normalization.  Per-term contributions are pivoted into COLUMNS and
  summed in one fixed expression order on both engines, so the score is
  bit-identical (a ``sum()`` over the term rows would add doubles in
  engine-chosen order); ordering is on the ROUNDED score with a doc_id
  tie-break (the i49 lesson, applied at design time).
- i58 SemDeDup census (Abbas et al. 2023, "SemDeDup: Data-efficient
  learning at web-scale through semantic deduplication") — the
  embedding-space sibling of text dedup: cluster vectors, compare pairs
  only WITHIN a cluster, mark keep-first duplicates above a cosine
  threshold.  Composes i23's exact-decimal centroid kernel and i06's
  rounded-threshold pair idiom, bucketed by cluster so the pairwise
  stage never crosses cluster boundaries.
- k16 perceptual-hash (aHash) dedup buckets — the image-dedup step of
  a multimodal pipeline over the repo's deterministic decode stub:
  map-side 8-bit block-mean codes (exact integer cross-multiply, no
  floats) via Arrow-batched mapInPandas, then one census groupBy.
  Hamming-radius matching would band the code like i34's MinHash bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table, widen_if_narrow
from ..registry import QueryFn
from .llm_text import _DUP_SPAN_HITS_CTE, _GRAMS_CTE, span_dedup_spans
from .llm_vectors import (
    _ASSIGNED_CTE_SQL,
    _CENTROID_CTES_SQL,
    _SEMDEDUP_CENSUS_TAIL_SQL,
    semdedup_census,
)

# name -> (fn, oracle SQL or None), mirroring registry.QUERIES/ORACLES.
STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def _stage(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


@_stage(
    "i55_longest_dup_span_census",
    oracle=f"""
        WITH {_GRAMS_CTE},
        {_DUP_SPAN_HITS_CTE},
        spans AS (
            SELECT doc_id, min(pos) AS s, max(pos) + 4 AS e
            FROM hits GROUP BY doc_id, grp
        ),
        docmax AS (
            SELECT doc_id, CAST(max(e - s + 1) AS BIGINT) AS doc_max,
                   CAST(count(*) AS BIGINT) AS doc_spans
            FROM spans GROUP BY doc_id
        )
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs_with_dup,
               CAST(max(doc_max) AS BIGINT) AS max_span_toks,
               round(avg(doc_max), 6) AS avg_max_span_toks,
               CAST(sum(doc_spans) AS BIGINT) AS n_spans
        FROM docmax JOIN documents d USING (doc_id)
        GROUP BY d.source
    """,
)
def i55_longest_dup_span_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of i48's maximal duplicated spans: how many docs
    carry one, the longest span in tokens, the mean per-doc maximum, and
    the total span count — the numbers a substring-dedup cut threshold
    is picked from (Lee et al. 2022 report exactly this distribution).

    Plan: the shared ``span_dedup_spans`` kernel (gram agg + semi-join +
    doc-keyed island merge, see its docstring for the skew story), then a
    per-doc max that REUSES the island merge's doc_id partitioning, an
    equi-join back to (doc_id, source) — both sides doc-keyed, corpus-
    linear — and one source rollup.  avg() of BIGINTs divides an exact
    integer sum once, so the double is cross-engine identical."""
    d = load_table(spark, sf_dir, "documents")
    spans = span_dedup_spans(widen_if_narrow(d.select("doc_id", "text")))
    docmax = spans.groupBy("doc_id").agg(
        F.max(F.col("span_end") - F.col("span_start") + 1).alias("doc_max"),
        F.count(F.lit(1)).alias("doc_spans"))
    return (
        docmax.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs_with_dup"),
             F.max("doc_max").alias("max_span_toks"),
             F.round(F.avg("doc_max"), 6).alias("avg_max_span_toks"),
             F.sum("doc_spans").alias("n_spans"))
    )


@_stage(
    "i56_gopher_rule_breakdown",
    oracle="""
        WITH t AS (
            SELECT doc_id, source, string_split(text, ' ') AS toks
            FROM documents WHERE text IS NOT NULL
        ), m AS (
            SELECT source, len(toks) AS n,
                   CAST(list_sum(list_transform(toks, x -> len(x)))
                        AS DOUBLE) / len(toks) AS mwl,
                   len(list_intersect(list_distinct(toks), ['the', 'a']))
                       AS n_stop
            FROM t
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n < 50 OR n > 100000
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
               CAST(sum(CASE WHEN mwl < 3 OR mwl > 10
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_wordlen,
               CAST(sum(CASE WHEN n_stop < 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
               CAST(sum(CASE WHEN n >= 50 AND n <= 100000
                              AND mwl >= 3 AND mwl <= 10 AND n_stop >= 2
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               round(CAST(sum(CASE WHEN n >= 50 AND n <= 100000
                                    AND mwl >= 3 AND mwl <= 10
                                    AND n_stop >= 2
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS pass_share
        FROM m GROUP BY source
    """,
)
def i56_gopher_rule_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source breakdown of Gopher's document-quality gates (Rae et
    al. 2021 §A1.1): word-count bounds [50, 100000], mean word length in
    [3, 10], and >=2 distinct stop words — the corpus's articles
    {'the', 'a'} stand in for Gopher's English stop list.  Reported as
    per-rule failure counts plus the all-rules pass share, the table a
    curation run reads to see WHICH rule is cutting a source.

    Scale shape (i25's idiom): every per-doc stat is an array expression
    — no explode, no (doc, token) shuffle — so the only exchange is the
    final source rollup with map-side partial aggregation.  Mean word
    length is an exact integer sum divided once, identical cross-engine;
    the rule thresholds compare that one double the same way on both."""
    d = load_table(spark, sf_dir, "documents")
    m = (d.filter(F.col("text").isNotNull())
         .select("source", F.split("text", " ").alias("toks"))
         .selectExpr(
             "source",
             "size(toks) AS n",
             "cast(aggregate(toks, 0L, (acc, x) -> acc + length(x))"
             " AS double) / size(toks) AS mwl",
             "size(array_intersect(array_distinct(toks),"
             " array('the', 'a'))) AS n_stop"))
    ok = ("n >= 50 AND n <= 100000 AND mwl >= 3 AND mwl <= 10"
          " AND n_stop >= 2")
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END"))
         .alias("fail_len"),
        F.sum(F.expr("CASE WHEN mwl < 3 OR mwl > 10 THEN 1 ELSE 0 END"))
         .alias("fail_wordlen"),
        F.sum(F.expr("CASE WHEN n_stop < 2 THEN 1 ELSE 0 END"))
         .alias("fail_stop"),
        F.sum(F.expr(f"CASE WHEN {ok} THEN 1 ELSE 0 END")).alias("n_pass"),
        F.round(
            F.sum(F.expr(f"CASE WHEN {ok} THEN 1 ELSE 0 END"))
            .cast("double") / F.count(F.lit(1)), 6).alias("pass_share"),
    )


_BM25_TERMS = ("join", "customer", "window")  # fixed query, df spread


@_stage(
    "i57_bm25_topk",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE text IS NOT NULL
        ), dl AS (SELECT doc_id, len(toks) AS n FROM d),
        st AS (SELECT CAST(count(*) AS BIGINT) AS nd, avg(n) AS avgdl
               FROM dl),
        tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
            WHERE tok IN ('join', 'customer', 'window')
            GROUP BY 1, 2
        ),
        dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
                GROUP BY 1),
        contrib AS (
            SELECT tf.doc_id, tf.tok,
                   ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                   * (c * 2.2)
                   / (c + 1.2 * (0.25 + 0.75 * dl.n / avgdl)) AS w
            FROM tf
            JOIN dfq USING (tok)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN st
        ),
        piv AS (
            SELECT doc_id,
                   max(CASE WHEN tok = 'join' THEN w END) AS w1,
                   max(CASE WHEN tok = 'customer' THEN w END) AS w2,
                   max(CASE WHEN tok = 'window' THEN w END) AS w3
            FROM contrib GROUP BY doc_id
        )
        SELECT doc_id,
               round(coalesce(w1, 0) + coalesce(w2, 0) + coalesce(w3, 0), 6)
                   AS bm25
        FROM piv
        ORDER BY round(coalesce(w1, 0) + coalesce(w2, 0) + coalesce(w3, 0),
                       6) DESC, doc_id
        LIMIT 20
    """,
)
def i57_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene's ``ln(1+(N-df+0.5)/(df+0.5))`` idf)
    of every document against the fixed query {join, customer, window},
    top-20 — the relevance-scoring primitive behind retrieval-based
    curation, composing i08's tf/df kernels plus doc-length
    normalization.

    Determinism by construction: the per-term contributions are pivoted
    into columns and summed in ONE fixed expression order on both
    engines (a ``sum()`` over term rows would add doubles in
    engine-chosen order), and the top-k orders on the ROUNDED score with
    a doc_id tie-break so a sub-round libm wiggle in ``ln`` cannot flip
    the boundary (the i49 lesson).

    Scale shape: the term filter lands BEFORE the tf aggregation, so the
    (doc, term) frame is |terms|-bounded per doc; df and the corpus
    stats are broadcast 3-row/1-row aggregates; the tf-to-length join
    keys on doc_id and the pivot groupBy reuses that partitioning; the
    top-k is TakeOrderedAndProject, never a global sort.  Doc lengths
    are pinned once (i08's rationale: the tf and stats branches would
    otherwise re-scan the corpus; keys-only two-column frame)."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    dl = (d.select("doc_id", F.size(F.split("text", " ")).alias("n"))
          .localCheckpoint())  # pin: stats + join branches, one scan
    st = F.broadcast(dl.agg(F.count(F.lit(1)).alias("nd"),
                            F.avg("n").alias("avgdl")))
    tf = (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
          .filter(F.col("tok").isin(*_BM25_TERMS))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c")))
    dfq = F.broadcast(tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    contrib = (
        tf.join(dfq, "tok").join(dl, "doc_id").crossJoin(st)
        .selectExpr(
            "doc_id", "tok",
            "ln(1.0 + (nd - df + 0.5) / (df + 0.5))"
            " * (c * 2.2)"
            " / (c + 1.2 * (0.25 + 0.75 * n / avgdl)) AS w"))
    piv = contrib.groupBy("doc_id").agg(
        F.max(F.expr("CASE WHEN tok = 'join' THEN w END")).alias("w1"),
        F.max(F.expr("CASE WHEN tok = 'customer' THEN w END")).alias("w2"),
        F.max(F.expr("CASE WHEN tok = 'window' THEN w END")).alias("w3"))
    return (
        piv.select(
            "doc_id",
            F.round(F.expr("coalesce(w1, 0D) + coalesce(w2, 0D)"
                           " + coalesce(w3, 0D)"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id").limit(20)
    )




@_stage(
    "i58_semdedup_census",
    oracle=f"""
        WITH {_CENTROID_CTES_SQL}, {_ASSIGNED_CTE_SQL},
        {_SEMDEDUP_CENSUS_TAIL_SQL}
    """,
)
def i58_semdedup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: per-cluster duplicate census at
    cosine >= 0.35 (see semdedup_census for the algorithm, composition,
    and 100 TB story).  The embedding-space member of the dedup family:
    i01 exact text, i03/i34 near-dup text, i48 substring spans, i58
    semantic — the four granularities a curation pipeline layers."""
    emb = widen_if_narrow(load_table(spark, sf_dir, "embeddings"))
    return semdedup_census(emb)


def phash_codes(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, phash): 8-bit average-hash codes,
    the k16 kernel.  Whole-batch numpy over Arrow batches (k07's
    convention): one concatenated byte view, block sums via cumsum
    gathers (no reduceat — its segment-end semantics mis-bracket when a
    payload's tail bytes sit between block 7 and the next payload), and
    the block-vs-overall mean test as an exact integer cross-multiply
    ``bsum * L > tot * W`` so no float ever enters the hash.  Callers
    must pre-filter payloads shorter than 8 bytes (W would be 0)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = list(pdf["payload"])
            ln = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                             count=len(payloads))
            cat = np.frombuffer(b"".join(payloads), dtype=np.uint8) \
                .astype(np.int64)
            csum = np.concatenate([[0], np.cumsum(cat)])
            starts = np.cumsum(ln) - ln
            w = ln // 8
            bstart = starts[:, None] + np.arange(8)[None, :] * w[:, None]
            bsum = csum[bstart + w[:, None]] - csum[bstart]
            tot = csum[starts + ln] - csum[starts]
            bits = (bsum * ln[:, None]) > (tot[:, None] * w[:, None])
            phash = (bits << (7 - np.arange(8))[None, :]).sum(axis=1)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": phash})

    return binary_df.mapInPandas(hash_batches, "doc_id long, phash long")


# the aHash computation of the k16 oracle, shared with staged_r10's k17
# banding oracle (single-source discipline); binds hashed(doc_id, phash)
_PHASH_CTES_SQL = """
        base AS (
            SELECT doc_id, text, length(text) AS L, length(text) // 8 AS W,
                   list_sum(list_transform(range(1, length(text) + 1),
                            i -> ord(substr(text, i, 1)))) AS tot
            FROM documents WHERE length(text) >= 8
        ), blocks AS (
            SELECT doc_id, L, W, tot, b.b,
                   list_sum(list_transform(
                       range(b.b * W + 1, (b.b + 1) * W + 1),
                       i -> ord(substr(text, i, 1)))) AS bsum
            FROM base CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b
        ), hashed AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN bsum * L > tot * W
                                 THEN 1 << (7 - CAST(b AS INT))
                                 ELSE 0 END) AS BIGINT) AS phash
            FROM blocks GROUP BY doc_id
        )
"""


@_stage(
    "k16_phash_dedup",
    oracle=f"""
        WITH {_PHASH_CTES_SQL}
        SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(min(doc_id) AS BIGINT) AS keep_doc
        FROM hashed GROUP BY phash HAVING count(*) > 1
    """,
)
def k16_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) near-dup buckets over binary media
    payloads — the image-dedup step of a multimodal curation pipeline:
    8 block means vs the overall mean give an 8-bit code; payloads
    sharing a code are duplicate candidates, keep-first representative
    reported.  The decode is the repo's deterministic stub (utf-8 text
    bytes stand in for decoded grayscale rows, k06/k07's convention) —
    a real pipeline swaps the byte source for pixel rows and widens the
    hash to 64 bits, changing neither the Spark plan nor the census.

    Scale shape: hashing is MAP-SIDE ONLY (Arrow-batched mapInPandas,
    whole-batch numpy); the only exchange is the 8-bit-keyed census
    groupBy with map-side partial aggregation.  Hamming-radius (rather
    than exact-code) matching would band the code exactly like i34's
    MinHash bands — same bucketed shape, no all-pairs.  The integer
    cross-multiply mean test keeps the hash float-free, so Spark and
    the byte-arithmetic oracle agree bit-for-bit.  Oracle caveat
    (k06/k07's documented convention): DuckDB has no BLOB substring, so
    the oracle indexes CHARACTERS and ord() code points — equal to byte
    offsets/values only because the corpus is ASCII; a non-ASCII corpus
    would need a byte-table oracle instead."""
    d = load_table(spark, sf_dir, "documents")
    # i48/i55 precedent: parallelize the hashing on degenerate one-file
    # local scans (round-robin exchange, not hash — the census plan pin
    # counts hashpartitioning exchanges and stays at one)
    binary = widen_if_narrow(
        d.filter(F.length("text") >= 8)
        .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    return (
        phash_codes(binary)
        .groupBy("phash")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min("doc_id").alias("keep_doc"))
        .filter(F.col("n_docs") > 1)
    )
