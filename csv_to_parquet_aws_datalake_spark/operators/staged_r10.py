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

Round 15 executed the ledger's named r15 move: i64 REGISTERED
(``llm_text.py:i64_bm25_decontamination`` — the soft retrieval-based
complement of i33's exact-gram decontamination; kernel
``bm25_query_scores`` moved with it) and i61 DELETED in the same
commit (same-kernel family: the registered i64 exercises the whole
scoring path; the standalone top-k form was the weaker sibling — the
i57→i61 precedent carried one step further).

The remaining bank — tri-SF oracle parity, plan pins, an independent
reference, and a NAMED fate in the §7.12 ledger (no candidate rides
the 4-round default):

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
