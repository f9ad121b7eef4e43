"""Round-15 candidate, STAGED — implemented and oracle-tested but NOT
registered (the staged_r9/r10 discipline: a full implementation with a
DuckDB oracle through the driver's own comparator, a plan pin, and an
independent reference, banked so a future registration is mechanical).

Staged per VERDICT r14 item 7: the r10 bank drains to empty when k17
registers in r16, so this module gives r17 a named move.  One
candidate, from a family with no registered member (data SELECTION —
the registry scores quality i14/i65, filters rules i25/i56, dedups,
and decontaminates i33/i64, but nothing yet picks training data by
similarity to a TARGET distribution):

- i66 DSIR importance score — REGISTERS r17 unless the r16 verdict
  ranks something else higher: Data Selection via Importance
  Resampling (Xie et al. 2023) reduced to its inference shape —
  hashed-bigram features, per-bucket importance weight = the
  target-vs-raw frequency ratio, per-document score = the mean weight
  of its features.  The published method samples with probability
  proportional to exp(score); the census here emits the per-doc score
  and feature count, which is the input that sampler (registered
  i43/i49 machinery) consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table
from ..registry import QueryFn

# name -> (fn, oracle SQL or None), mirroring registry.QUERIES/ORACLES.
STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def _stage(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


#: DSIR hyper-surface, shared by both engines: B hash buckets, the
#: target language, and the e4 fixed-point scale
_DSIR_B = 256
_DSIR_TARGET_LANG = "en"
_DSIR_SCALE = 10000

#: first-two-md5-hex-digits bucket in [0, 255] — the i65 weight idiom
#: applied to bigram features; `h` binds an md5 hex string
_BUCKET_SPARK = ("(locate(substring(h, 1, 1), '0123456789abcdef') - 1) * 16"
                 " + (locate(substring(h, 2, 1), '0123456789abcdef') - 1)")
_BUCKET_SQL = ("(strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16"
               " + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)")


@_stage(
    "i66_dsir_importance",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, lang, string_split(text, ' ') AS t
            FROM documents
            WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
        ), bg AS (
            SELECT doc_id, lang, {_BUCKET_SQL} AS b
            FROM (
                SELECT doc_id, lang,
                       unnest(list_transform(range(1, len(t)),
                              i -> md5(t[i] || ' ' || t[i + 1]))) AS h
                FROM d
            )
        ), freq AS (
            SELECT b, CAST(count(*) AS BIGINT) AS r,
                   CAST(coalesce(sum(CASE WHEN lang = '{_DSIR_TARGET_LANG}'
                                          THEN 1 END), 0) AS BIGINT) AS tt
            FROM bg GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(r) AS BIGINT) AS rall,
                   CAST(sum(tt) AS BIGINT) AS tall
            FROM freq
        ), w AS (
            SELECT b, ((tt + 1) * (rall + {_DSIR_B}) * {_DSIR_SCALE})
                      // ((r + 1) * (tall + {_DSIR_B})) AS wb
            FROM freq CROSS JOIN tot
        )
        SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               CAST(sum(wb) // count(*) AS BIGINT) AS dsir_e4
        FROM bg JOIN w USING (b)
        GROUP BY 1
    """,
)
def i66_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring (Xie et al. 2023): how target-like is
    each document, measured on hashed n-gram features — the data-
    SELECTION member the curation families lack (quality says "is it
    good", DSIR says "is it the distribution I want to train on").

    Per bucket b of {_DSIR_B} md5-hashed bigram slots, the importance
    weight is the Laplace-smoothed frequency ratio

        wb = p_target(b) / p_raw(b)
           = ((tt_b + 1) / (T + B)) / ((r_b + 1) / (R + B))

    held in e4 fixed point; a document's score is the mean weight of
    its bigrams (10000 = neutral, higher = more target-like).  The
    target here is the corpus's own '{_DSIR_TARGET_LANG}' slice — a
    deterministic stand-in for the external target corpus (the i65
    weight-table convention: a real deployment swaps the target-count
    aggregation for the target corpus's own scan, changing neither
    plan shape nor census).

    Determinism by construction (the i65 lesson at design time): every
    count is an exact BIGINT, the weight and the per-doc mean are
    integer divisions of NON-NEGATIVE operands (Spark ``div`` truncates
    toward zero, DuckDB ``//`` floors — they agree only there), and the
    per-doc sum is an integer sum, fold-order-free.  The scaled-integer
    weight product (tt+1)*(R+B)*1e4 needs BIGINT headroom; it
    overflows past R ~ 9e14 total bigrams, where a production run
    swaps the weight expression for the paper's double log-ratio (one
    expression, plan unchanged) and accepts float summation.

    Scale shape: ONE conditional aggregation computes raw and target
    counts together (count + count-if-target over the same exploded
    pass — never two corpus scans for two distributions); the weight
    table is {_DSIR_B} rows, broadcast; totals are a broadcast 1-row
    crossJoin attach; the per-doc mean is a doc-keyed aggregation with
    map-side partial combine (explode keeps rows doc-clustered, so the
    partial agg collapses to one row per doc before the shuffle).  Two
    corpus passes total — the DSIR paper's own streaming shape.
    Docs with fewer than two tokens have no bigram and are excluded by
    contract on both engines (NULL text too, the r12 convention)."""
    d = (load_table(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "lang", "text"))
    return dsir_importance_frame(d)


def dsir_importance_frame(d: DataFrame) -> DataFrame:
    """The i66 kernel over any (doc_id, lang, text) frame — factored
    out (the i65/i64 convention) so tools/scale_stress.py drives the
    staged formulation; callers pre-filter NULL text."""
    d = (d.select("doc_id", "lang", F.split("text", " ").alias("t"))
         .filter(F.size("t") >= 2))
    bg = d.select(
        "doc_id", "lang",
        F.explode(F.expr(
            "transform(sequence(1, size(t) - 1),"
            " i -> md5(concat(element_at(t, i), ' ',"
            " element_at(t, i + 1))))")).alias("h"),
    ).selectExpr("doc_id", "lang", f"CAST({_BUCKET_SPARK} AS LONG) AS b")
    freq = bg.groupBy("b").agg(
        F.count(F.lit(1)).alias("r"),
        F.coalesce(F.sum(F.when(
            F.col("lang") == _DSIR_TARGET_LANG, 1)), F.lit(0)).alias("tt")) \
        .localCheckpoint()  # pin: <=256 rows feed tot AND w — without it
    #                         each derivation re-runs the corpus pass
    tot = F.broadcast(freq.agg(F.sum("r").alias("rall"),
                               F.sum("tt").alias("tall")))
    w = F.broadcast(freq.crossJoin(tot).selectExpr(
        "b",
        f"((tt + 1) * (rall + {_DSIR_B}) * {_DSIR_SCALE})"
        f" div ((r + 1) * (tall + {_DSIR_B})) AS wb"))
    return (bg.join(w, "b")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_feats"),
                 F.expr("sum(wb) div count(1)").alias("dsir_e4")))
