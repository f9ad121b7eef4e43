"""Round-11 candidates, STAGED — implemented and oracle-tested but NOT
registered (the staged_r9 discipline: full implementations with DuckDB
oracles through the driver's own comparator, plan pins, and an
independent reference, banked so a future registration is mechanical).

The headline candidate closes VERDICT r9 item 2 — and corrects its
premise.  Re-measuring under a FIXED amplifier (see
``semdedup_census``'s scale paragraph: the r9 "2.3× vs linear" was
substantially a verbatim-copy artifact that collapsed all replicas into
one replica's clusters and inflated the PAIR stage) shows the dense
census sublinear at fixture scale; but the dense assignment's O(n·k)
term is real and emergent — assignment-only timing grows 4.3× per 4×
data on the K=4→16 step, vs 2.15× for the bucketed variant below, which
is already 1.4× faster in absolute terms at K=16 (3.44 s vs 4.76 s)
despite a higher fixed cost at K=1 (1.58 s vs 0.93 s — the classic
exact-vs-ANN constant/asymptote trade).  With k ∝ corpus, as SemDeDup
sizes it, the dense term is quadratic and must dominate; the remedy, as
in IVF practice, is APPROXIMATE assignment:

- ``assign_nearest_centroid_ann`` — sign-random-projection-bucket the
  CENTROIDS (i18's machinery, one family over): both vectors and
  centroids get a b-bit SRP code from a data-derived basis; each vector
  scores ONLY the centroids sharing its code (a broadcast equi-join on
  the bucket, never the full k), with a dense fallback for vectors whose
  bucket holds no centroid.  With bits ≈ log2(k / target-per-bucket) the
  per-vector work is O(target) and total assignment cost O(n) — the
  production knob i18's docstring derives.
- i59 SemDeDup census over ANN assignment — ``semdedup_census`` with the
  assignment swapped: the exact i06<->i18 relationship applied one stage
  earlier (dense i58 stays the exact-contract baseline; i59 is the form
  a 100 TB corpus runs).  Differential oracle mirrors the SAME bucketed
  algorithm in DuckDB (basis, codes, bucket equi-join, orphan fallback,
  then the SHARED census tail from staged_r9 — single-sourced so the two
  oracles cannot diverge by transcription).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot
from ..loader import load_table, widen_if_narrow
from ..registry import QueryFn
from .llm_vectors import _CENTROID_CTES_SQL, _centroid_table
from .staged_r9 import _SEMDEDUP_CENSUS_TAIL_SQL, semdedup_census

# name -> (fn, oracle SQL or None), mirroring registry.QUERIES/ORACLES.
STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def _stage(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


def assign_nearest_centroid_ann(emb: DataFrame, bits: int = 3) -> DataFrame:
    """(vec_id, clabel, embedding): approximate nearest-centroid
    assignment — each vector scores only the centroids in its SRP bucket.

    Basis = embeddings ``vec_id 1..bits`` (data-derived, deterministic —
    i18's convention, so the oracle can reproduce it; a missing basis id
    leaves that bit constantly 0 on BOTH engines, since NULL > 0 is
    false-y in the CASE on each, degrading resolution, never diverging).
    Both centroids (k rows, broadcast) and vectors get the b-bit sign
    code; the scoring join is an EQUI-join on the code, so per-vector
    work is |bucket| centroids, not k.  Vectors whose bucket holds no
    centroid fall back to dense scoring against all k — empty by
    construction once k >> 2^bits, and bounded by the orphan count
    otherwise.  Argmax semantics are identical to the dense
    ``assign_nearest_centroid``: rounded cosine desc, clabel tie-break,
    vec_id-partitioned row_number.

    Scale story (the fix for the dense assignment's O(n·k) term —
    measured at 4.3× per 4× data on the K=4→16 assignment-only step,
    vs 2.15× for this form): with k ∝ corpus and
    bits ≈ log2(k / target-per-bucket),
    each vector scores ~target centroids — O(n) total — while the dense
    form scores n·k.  Approximation error is the standard IVF trade: a
    vector whose true nearest centroid signs differently on some
    projection is assigned to its bucket's best instead (multi-probe,
    i29's pattern, is the recall knob).  The bucketed join broadcasts
    the k-row coded centroid table; at 100 TB k may reach millions of
    rows — still megabytes of (clabel, code) pairs, and the join key
    keeps AQE free to pick a shuffled hash join if a giant centroid set
    ever outgrows broadcast."""
    from pyspark.sql.window import Window as W

    cenarr = _centroid_table(emb)
    basis = F.broadcast(
        emb.filter(F.col("vec_id").isin(*range(1, bits + 1)))
        .agg(*[F.max(F.when(F.col("vec_id") == i, F.col("embedding")))
               .alias(f"b{i}") for i in range(1, bits + 1)]))

    def code(col: str) -> Column:
        b = F.lit(0)
        for i in range(1, bits + 1):
            b = b + F.when(dot(col, f"b{i}") > 0,
                           F.lit(1 << (bits - i))).otherwise(0)
        return b

    cbuck = (cenarr.crossJoin(basis)
             .select("clabel", "carr", code("carr").alias("bucket")))
    vbuck = (emb.crossJoin(basis)
             .select("vec_id", "embedding", code("embedding").alias("bucket")))
    w = W.partitionBy("vec_id").orderBy(F.desc("acos"), "clabel")

    def argmax(scored: DataFrame) -> DataFrame:
        return (scored.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("vec_id", "clabel", "embedding"))

    bucketed = argmax(
        vbuck.join(F.broadcast(cbuck), "bucket")
        .select("vec_id", "clabel", "embedding",
                F.round(cosine("embedding", "carr"), 6).alias("acos")))
    fallback = argmax(
        vbuck.join(F.broadcast(cbuck.select("bucket").distinct()),
                   "bucket", "left_anti")
        .select("vec_id", "embedding")
        .crossJoin(F.broadcast(cenarr))
        .select("vec_id", "clabel", "embedding",
                F.round(cosine("embedding", "carr"), 6).alias("acos")))
    return bucketed.unionByName(fallback)


# oracle twin of assign_nearest_centroid_ann at bits=3; expects cenarr in
# scope (_CENTROID_CTES_SQL) and binds assigned(vec_id, clabel, emb)
_ANN_ASSIGNED_CTES_SQL = """
        basis AS (
            SELECT max(CASE WHEN vec_id = 1
                            THEN CAST(embedding AS DOUBLE[]) END) AS b1,
                   max(CASE WHEN vec_id = 2
                            THEN CAST(embedding AS DOUBLE[]) END) AS b2,
                   max(CASE WHEN vec_id = 3
                            THEN CAST(embedding AS DOUBLE[]) END) AS b3
            FROM embeddings WHERE vec_id IN (1, 2, 3)
        ), cbuck AS (
            SELECT clabel, carr,
                   (CASE WHEN list_dot_product(carr, b1) > 0
                         THEN 4 ELSE 0 END
                  + CASE WHEN list_dot_product(carr, b2) > 0
                         THEN 2 ELSE 0 END
                  + CASE WHEN list_dot_product(carr, b3) > 0
                         THEN 1 ELSE 0 END) AS bucket
            FROM cenarr CROSS JOIN basis
        ), vbuck AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
                   (CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                               b1) > 0 THEN 4 ELSE 0 END
                  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                               b2) > 0 THEN 2 ELSE 0 END
                  + CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]),
                                               b3) > 0 THEN 1 ELSE 0 END)
                       AS bucket
            FROM embeddings CROSS JOIN basis
        ), bucketed AS (
            SELECT v.vec_id, c.clabel, v.emb
            FROM vbuck v JOIN cbuck c ON v.bucket = c.bucket
            QUALIFY row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY round(list_cosine_similarity(v.emb, c.carr),
                                    6) DESC, c.clabel) = 1
        ), orphans AS (
            SELECT v.vec_id, c.clabel, v.emb
            FROM vbuck v CROSS JOIN cenarr c
            WHERE v.bucket NOT IN (SELECT bucket FROM cbuck)
            QUALIFY row_number() OVER (PARTITION BY v.vec_id
                     ORDER BY round(list_cosine_similarity(v.emb, c.carr),
                                    6) DESC, c.clabel) = 1
        ), assigned AS (
            SELECT * FROM bucketed UNION ALL SELECT * FROM orphans
        )
"""


def semdedup_census_ann(emb: DataFrame, tau: float | None = None,
                        bits: int = 3) -> DataFrame:
    """The i59 kernel: staged_r9's ``semdedup_census`` with the dense
    assignment swapped for the SRP-bucketed one — the pair stage, the
    keep-first rule, the census rollup, and the localCheckpoint pin are
    all the SHARED code path, so the only semantic difference between
    i58 and i59 is which centroid a borderline vector lands on."""
    kwargs = {} if tau is None else {"tau": tau}
    return semdedup_census(
        emb, assign=lambda e: assign_nearest_centroid_ann(e, bits=bits),
        **kwargs)


@_stage(
    "i59_semdedup_census_ann",
    oracle=f"""
        WITH {_CENTROID_CTES_SQL}, {_ANN_ASSIGNED_CTES_SQL},
        {_SEMDEDUP_CENSUS_TAIL_SQL}
    """,
)
def i59_semdedup_census_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup census with SRP-bucketed (approximate) centroid
    assignment — the 100 TB form of i58 (VERDICT r9 item 2), removing
    the dense assignment's O(n·k) term (measured emergent, not yet
    dominant, at fixture scale — see the module docstring for the
    corrected r9-vs-r10 record).  Stress row
    ``semdedup-ann[i59-kernel]``: 0.12× vs linear at K=16 under the
    honest k ∝ corpus model.  Same cluster-bucketed pair stage and
    keep-first census; only the assignment is approximate (see
    assign_nearest_centroid_ann).  The dense i58 remains the
    exact-contract baseline, mirroring the registry's i06 (exact pairs)
    <-> i18 (SRP buckets) relationship."""
    emb = widen_if_narrow(load_table(spark, sf_dir, "embeddings"))
    return semdedup_census_ann(emb)
