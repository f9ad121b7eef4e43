"""Round-11 candidates, STAGED — implemented and oracle-tested but NOT
registered (the staged_r9 discipline: full implementations with DuckDB
oracles through the driver's own comparator, plan pins, and an
independent reference, banked so a future registration is mechanical).

The round's headline candidate — i59 SemDeDup census over SRP-bucketed
ANN centroid assignment, closing VERDICT r9 item 2 and correcting its
amplifier-artifact premise — GRADUATED in round 11: after the 20-bit
routing-table measurement VERDICT r10 item 3 demanded, the whole ANN
assignment stack (``assign_nearest_centroid_ann``, ``srp_ball_routing``,
the shared ``semdedup_census`` kernel) moved to its registered home in
``llm_vectors.py`` and i59 is a registry row.

Round 12 executed the SURVEY §7.9 retirement review and DRAINED the
round-9 bank entirely (module deleted): i56 REGISTERED
(``llm_text.py:i56_gopher_rule_breakdown``); i55 deleted (superseded by
i60 here — same span-census family over the i48 kernel, the histogram
is the strictly-richer rollup); i57 deleted (superseded by i61 here —
same determinism design, single fixed query is the weaker special case
of query sets); i58 deleted (its family's strictly-better scale form
i59 is REGISTERED, and i59's oracle is already a full SQL twin of the
whole path, so the dense baseline added no differential coverage);
k16 deleted (k17's radius<=1 banding includes every radius-0 —
exact-code — pair, so the exact-bucket census is the weaker
same-family form; its ``phash_codes`` kernel moved HERE, k17's only
dependency).

Round 13's retirement review (SURVEY §7.12 has the full ledger) took
three more candidates out: i63 REGISTERED
(``llm_text.py:i63_line_dedup_rewrite`` — the C4 line-dedup
transformation, the bank's verdict-ranked strongest); i62 deleted
(same-family: the census is a read-only diagnostic of the registered
rewrite's boiler stage — the k16/k17 precedent; its per-line counts
are recoverable from git or by reading the rewrite's intermediate);
i60 deleted (4 rounds banked, never verdict-ranked — the §7.9 default
— and a read-only rollup of the REGISTERED i48/i54 span kernel, so a
registry slot on it adds no new kernel coverage).

Round 14 executed the ledger's named r14 move: i65 REGISTERED
(``llm_text.py:i65_quality_classifier`` — the quality family's learned
member; kernel ``quality_classifier_scores`` moved with it).

The remaining bank — each with tri-SF oracle parity, plan pins, an
independent reference, and a NAMED fate in the §7.12 ledger (no
candidate rides the 4-round default):

- i64 BM25 decontamination census — REGISTERS r15: the soft
  (retrieval-based) complement of i33's exact-gram decontamination:
  documents scoring above a measured threshold against each benchmark
  probe, counted per probe with a deterministic top candidate;
  composes ``bm25_query_scores`` in one corpus pass.
- i61 BM25 over query SETS — DELETES r15 when i64 registers
  (same-kernel family: ``bm25_query_scores`` moves to the registered
  home as i64's dependency, which exercises the whole scoring path;
  the standalone top-k form is the weaker sibling — the i57→i61
  precedent carried one step further).  Kept until then as the
  fallback should i64's oracle prove weaker at registration time.
- k17 phash band near-dup — REGISTERS r16 (the multimodal family's
  only near-dup capability, no registered sibling): Hamming<=1
  neighbor pairs over 8-bit aHash codes via 2x4-bit banding (the
  pigeonhole guarantee makes the band equi-join EXACT for radius 1),
  the i34 shape applied to the multimodal family; radius-0 pairs are
  the exact-code duplicates.

The bank drains to EMPTY by r16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table, widen_if_narrow
from ..registry import QueryFn
from .multimodal import _hx_byte

# name -> (fn, oracle SQL or None), mirroring registry.QUERIES/ORACLES.
STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def phash_codes(binary_df: DataFrame) -> DataFrame:
    """(doc_id, payload) -> (doc_id, phash): 8-bit average-hash codes,
    k17's kernel (moved here from staged_r9 when k16, the exact-bucket
    census over the same codes, was retired in round 12 — k17's radius-0
    pairs ARE the exact matches, making k16 the weaker same-family form).
    Whole-batch numpy over Arrow batches (k07's convention): one
    concatenated byte view, block sums via cumsum gathers (no reduceat —
    its segment-end semantics mis-bracket when a payload's tail bytes sit
    between block 7 and the next payload), and the block-vs-overall mean
    test as an exact integer cross-multiply ``bsum * L > tot * W`` so no
    float ever enters the hash.  Callers must pre-filter payloads shorter
    than 8 bytes (W would be 0)."""
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


# the aHash computation for the k17 banding oracle (single-source
# discipline); binds hashed(doc_id, phash).  Byte-TRUE since r13: the
# original ord(substr) form indexed characters and code points — equal
# to byte offsets/values only on ASCII, the divergence class the r13
# unicode probe exposed in k07/k13/k14/k15 — so it now extracts real
# UTF-8 bytes from hex(encode(text)) via the shared _hx_byte
# expression, matching the kernel's byte view on ANY corpus.  The
# >= 8 filter stays CHARACTER length to mirror the Spark side's
# F.length(text) pre-filter (chars >= 8 implies bytes >= 8, so the
# kernel's W > 0 precondition still holds).
_PHASH_CTES_SQL = f"""
        base AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS L,
                   octet_length(encode(text)) // 8 AS W
            FROM documents WHERE length(text) >= 8
        ), wtot AS (
            SELECT doc_id, hx, L, W,
                   list_sum(list_transform(range(1, L + 1),
                            i -> {_hx_byte("i")})) AS tot
            FROM base
        ), blocks AS (
            SELECT doc_id, L, W, tot, b.b,
                   list_sum(list_transform(
                       range(b.b * W + 1, (b.b + 1) * W + 1),
                       i -> {_hx_byte("i")})) AS bsum
            FROM wtot CROSS JOIN (SELECT unnest(range(0, 8)) AS b) b
        ), hashed AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN bsum * L > tot * W
                                 THEN 1 << (7 - CAST(b AS INT))
                                 ELSE 0 END) AS BIGINT) AS phash
            FROM blocks GROUP BY doc_id
        )
"""


def _stage(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


#: fixed query sets for i61 — three queries x three corpus-vocabulary
#: terms, all distinct so the per-(query, position) pivot is total
_BM25_QUERY_SETS = (
    ("q_ops", ("join", "scan", "merge")),
    ("q_dims", ("customer", "part", "window")),
    ("q_core", ("hash", "batch", "table")),
)
_BM25_ALL_TERMS = tuple(t for _, ts in _BM25_QUERY_SETS for t in ts)


#: the i61/i64 shared oracle CTE chain, binding scored(query_id,
#: doc_id, bm25) — single-sourced so the two oracles cannot diverge
_BM25_SCORED_CTES_SQL = f"""
        d AS (
            SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE text IS NOT NULL
        ), dl AS (SELECT doc_id, len(toks) AS n FROM d),
        st AS (SELECT CAST(count(*) AS BIGINT) AS nd, avg(n) AS avgdl
               FROM dl),
        qmap AS (
            SELECT * FROM (VALUES
                {", ".join(f"('{q}', {p + 1}, '{t}')"
                           for q, ts in _BM25_QUERY_SETS
                           for p, t in enumerate(ts))}
            ) v(query_id, pos, tok)
        ),
        tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM d)
            WHERE tok IN ({", ".join(f"'{t}'" for t in _BM25_ALL_TERMS)})
            GROUP BY 1, 2
        ),
        dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
                GROUP BY 1),
        contrib AS (
            SELECT q.query_id, q.pos, tf.doc_id,
                   ln(1.0 + (nd - df + 0.5) / (df + 0.5))
                   * (c * 2.2)
                   / (c + 1.2 * (0.25 + 0.75 * dl.n / avgdl)) AS w
            FROM tf
            JOIN qmap q USING (tok)
            JOIN dfq USING (tok)
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN st
        ),
        piv AS (
            SELECT query_id, doc_id,
                   max(CASE WHEN pos = 1 THEN w END) AS w1,
                   max(CASE WHEN pos = 2 THEN w END) AS w2,
                   max(CASE WHEN pos = 3 THEN w END) AS w3
            FROM contrib GROUP BY 1, 2
        ),
        scored AS (
            SELECT query_id, doc_id,
                   round(coalesce(w1, 0) + coalesce(w2, 0)
                         + coalesce(w3, 0), 6) AS bm25
            FROM piv
        )
"""


@_stage(
    "i61_bm25_query_sets",
    oracle=f"""
        WITH {_BM25_SCORED_CTES_SQL}
        SELECT query_id, doc_id, bm25 FROM scored
        QUALIFY row_number() OVER (PARTITION BY query_id
                 ORDER BY bm25 DESC, doc_id) <= 5
    """,
)
def i61_bm25_query_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 per query over a SET of queries — the batch-retrieval
    form of i57 (one query): score every (query, document) pair for
    three fixed 3-term queries and keep each query's top five.  The
    retrieval side of decontamination-style curation, where a benchmark
    suite's queries sweep the corpus at once.

    Determinism (i57's design carried to query sets): per-term
    contributions pivot into POSITION columns w1..w3 — every query has
    exactly 3 distinct terms, so the pivot is total — and the score sums
    them in one fixed expression order on both engines; top-k per query
    is a row_number window on the ROUNDED score with a doc_id tie-break.

    Scale shape: tf is computed ONCE for the union of all query terms
    (9-token IN-filter before the aggregation, so the (doc, term) frame
    stays |terms|-bounded per doc); the query map, df table, and corpus
    stats are broadcast 9-row/1-row frames; the pivot groupBy keys on
    (query_id, doc_id).  The per-query top-5 is a UNION of per-query
    TakeOrderedAndProject branches over the pinned scored frame, NOT a
    query_id-partitioned row_number window: with |queries| partitions
    each holding every matching document, such a window is an
    unsplittable-partition hazard at corpus scale — the exact class the
    r9 span fix removed (a first draft of this query had it; caught by
    the same scale lens in-round).  Each branch is a distributed
    partial top-k; the pin stops the |queries| branches from
    re-deriving the scores.  Doc lengths pin once (i08/i57's
    rationale).  The scored frame is factored out UNPINNED
    (``bm25_query_scores``) so plan lints can see the join/broadcast
    lineage the pin hides from this query's own plan (the i58/i59
    lesson — r10 fourth review: the earlier inline form left the
    upstream entirely unlinted)."""
    scored = bm25_query_scores(spark, sf_dir).localCheckpoint()
    branches = [
        scored.filter(F.col("query_id") == q)
        .orderBy(F.desc("bm25"), "doc_id").limit(5)
        for q, _ in _BM25_QUERY_SETS
    ]
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


def bm25_query_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UNPINNED (query_id, doc_id, bm25) frame behind i61 — every
    nonzero-scoring document for each query set; see the staged query's
    docstring for the determinism and scale design."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    dl = (d.select("doc_id", F.size(F.split("text", " ")).alias("n"))
          .localCheckpoint())  # pin: stats + join branches, one scan
    st = F.broadcast(dl.agg(F.count(F.lit(1)).alias("nd"),
                            F.avg("n").alias("avgdl")))
    qmap = F.broadcast(spark.createDataFrame(
        [(q, p + 1, t) for q, ts in _BM25_QUERY_SETS
         for p, t in enumerate(ts)],
        "query_id string, pos int, tok string"))
    tf = (d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
          .filter(F.col("tok").isin(*_BM25_ALL_TERMS))
          .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c")))
    dfq = F.broadcast(tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    contrib = (
        tf.join(qmap, "tok").join(dfq, "tok").join(dl, "doc_id")
        .crossJoin(st)
        .selectExpr(
            "query_id", "pos", "doc_id",
            "ln(1.0 + (nd - df + 0.5) / (df + 0.5))"
            " * (c * 2.2)"
            " / (c + 1.2 * (0.25 + 0.75 * n / avgdl)) AS w"))
    piv = contrib.groupBy("query_id", "doc_id").agg(
        F.max(F.expr("CASE WHEN pos = 1 THEN w END")).alias("w1"),
        F.max(F.expr("CASE WHEN pos = 2 THEN w END")).alias("w2"),
        F.max(F.expr("CASE WHEN pos = 3 THEN w END")).alias("w3"))
    return piv.select(
        "query_id", "doc_id",
        F.round(F.expr("coalesce(w1, 0D) + coalesce(w2, 0D)"
                       " + coalesce(w3, 0D)"), 6).alias("bm25"))


@_stage(
    "k17_phash_band_neardup",
    oracle=f"""
        WITH {_PHASH_CTES_SQL}, bands AS (
            SELECT doc_id, phash, 0 AS band, phash // 16 AS bval FROM hashed
            UNION ALL
            SELECT doc_id, phash, 1 AS band, phash % 16 AS bval FROM hashed
        ), cand AS (
            SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
                   CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT)
                       AS hamming
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bval = b.bval
             AND a.doc_id < b.doc_id
        )
        SELECT da, db, hamming FROM cand WHERE hamming <= 1
    """,
)
def k17_phash_band_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate media pairs at Hamming distance <= 1 over 8-bit
    aHash codes (``phash_codes``) — the multimodal dedup operator: the
    radius-0 pairs are exact-code duplicates (what the retired k16
    census bucketed) and radius-1 pairs are the off-by-one-bit
    perceptual near-misses an 8-bit aHash maps small image edits to.

    EXACT by the i34 band guarantee: the 8-bit code splits into two
    4-bit bands, and a pair at Hamming <= 1 differs in at most one bit,
    so at least one band matches (pigeonhole) — the band equi-join
    enumerates every qualifying pair, never all-pairs; candidates
    sharing a band but differing by > 1 bit are dropped by the exact
    integer bit_count(xor) verify.  Identical-code pairs match on both
    bands, hence the DISTINCT.  Scale shape: map-side Arrow hashing
    (phash_codes, pinned — both join sides consume it), one band-keyed
    equi-join exactly like i34's MinHash bands, integer verify, no
    window.  Output size is inherently quadratic in duplicate-GROUP
    size (pair enumeration, the i34/i17 contract); production layers
    an exact-code keep-first census over the same codes first (one
    phash-keyed groupBy, the retired k16 form) and reserves this
    for the near-miss tail, and a 64-bit production hash would band
    into 4x16-bit chunks with the identical plan."""
    d = load_table(spark, sf_dir, "documents")
    binary = widen_if_narrow(
        d.filter(F.length("text") >= 8)
        .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    codes = phash_codes(binary).localCheckpoint()  # pin: both join sides
    bands = codes.selectExpr(
        "doc_id", "phash",
        "stack(2, 0, phash div 16, 1, pmod(phash, 16)) AS (band, bval)")
    a = bands.select(F.col("doc_id").alias("da"),
                     F.col("phash").alias("pa"), "band", "bval")
    b = bands.select(F.col("doc_id").alias("db"),
                     F.col("phash").alias("pb"), "band", "bval")
    return (
        a.join(b, ["band", "bval"])
        .filter(F.col("da") < F.col("db"))
        .select("da", "db",
                F.expr("CAST(bit_count(pa ^ pb) AS LONG)").alias("hamming"))
        .filter(F.col("hamming") <= 1)
        .distinct()
    )


_DECON_TAU = 1.10  # between the per-query score p95 and max at every SF
#                    (measured: p95 1.03-1.20, p99 1.10-1.27, max
#                    1.13-1.39) so each probe yields a small, non-empty
#                    candidate set


@_stage(
    "i64_bm25_decontamination",
    oracle=f"""
        WITH {_BM25_SCORED_CTES_SQL}, cand AS (
            SELECT query_id, doc_id, bm25 FROM scored
            WHERE bm25 >= {_DECON_TAU}
        ), top AS (
            SELECT query_id, doc_id AS top_doc, bm25 AS top_bm25
            FROM cand
            QUALIFY row_number() OVER (PARTITION BY query_id
                     ORDER BY bm25 DESC, doc_id) = 1
        )
        SELECT c.query_id,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(max(t.top_doc) AS BIGINT) AS top_doc,
               max(t.top_bm25) AS top_bm25
        FROM cand c JOIN top t ON c.query_id = t.query_id
        GROUP BY c.query_id
    """,
)
def i64_bm25_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft decontamination census: each query set stands in for a
    benchmark probe, and documents scoring BM25 >= tau against it are
    contamination CANDIDATES (the retrieval-based complement of i33's
    exact-gram decontamination — exact matching misses paraphrases;
    ranked retrieval catches near-verbatim leakage that still scores
    high).  Per probe: candidate count plus the deterministic top
    candidate (rounded-score desc, doc_id tie-break).

    Composes ``bm25_query_scores`` (one corpus pass for all probes,
    broadcast query/df/stats sides) pinned once; the threshold filter
    is map-side; the census is a |queries|-key aggregate; the top
    candidate per probe is a per-query TakeOrderedAndProject branch
    (i61's audit-safe shape — never a bounded-key window).  At 100 TB
    a real benchmark suite has thousands of probes: the same plan
    swaps the literal branch union for a (probe-keyed) aggregation of
    max_by pairs, and tau calibrates per probe from held-out score
    quantiles exactly as _DECON_TAU was."""
    scored = bm25_query_scores(spark, sf_dir).localCheckpoint()
    cand = scored.filter(F.col("bm25") >= _DECON_TAU)
    tops = [
        cand.filter(F.col("query_id") == q)
        .orderBy(F.desc("bm25"), "doc_id").limit(1)
        .select("query_id", F.col("doc_id").alias("top_doc"),
                F.col("bm25").alias("top_bm25"))
        for q, _ in _BM25_QUERY_SETS
    ]
    top = tops[0]
    for t in tops[1:]:
        top = top.unionByName(t)
    census = cand.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_candidates"))
    return (census.join(top, "query_id")
            .select("query_id", "n_candidates", "top_doc", "top_bm25"))


