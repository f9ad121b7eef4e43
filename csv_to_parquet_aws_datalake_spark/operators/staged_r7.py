"""Round-7 candidates, STAGED — implemented and oracle-tested but NOT
registered.

SURVEY.md §7.5 budgets at most 7 new registry entries for round 7 (every
new entry steals one driver re-proof slot, and round 7's stalest-first
queue needs 43 slots for the r3-era backlog).  Round 6 froze the registry
at 193, so these land here: full implementations with DuckDB oracles,
exercised by ``tests/test_staged_r7.py`` through the SAME differential
comparator the driver uses.  Registering one in round 7 is a mechanical
move: wrap with ``@query`` in the right operators module and delete it
here (the test file follows the registry automatically).

The seven (all public techniques, all training-pipeline curation):

- i48 span-level exact substring dedup — the Lee et al. ("Deduplicating
  Training Data Makes Language Models Better", 2022) observation that
  duplication lives at substring granularity, not document granularity.
  Suffix arrays don't distribute; the Spark-first equivalent is fixed-
  width gram positions + corpus-wide gram counts + per-doc island merge.
- i49 weighted top-k sampling (Efraimidis–Spirakis A-ES key u^(1/w)) —
  order-statistics weighted sampling that is deterministic cross-engine
  because u comes from the md5-uniform kernel (i36/i43 idiom).
- i50 domain-mixing / temperature resampling (α = 0.5) — per-source
  token shares flattened by share^α, converted to downsample-only keep
  probabilities (the data-mixture step before corpus assembly).
- i51 cross-source contamination matrix — pairwise shared-5-gram counts
  and Jaccard between sources, the audit behind "is src_i leaking into
  src_j" (i33's gram machinery, widened from one eval set to all pairs).
- i52 quantile-sketch drift check — approx_percentile vs exact per
  language; rows-only by design (sketches are engine-specific), pinned
  locally by an exact-bracket invariant like d15/d10.
- i53 packing-efficiency census — per-language fill-rate stats over
  i39's 512-token bins (the "how much context window are we wasting"
  dashboard number).
- i54 span-coverage census — per source, the share of tokens covered by
  at least one corpus-duplicated 5-gram (exact token-interval union via
  a lag window; the number substring-dedup cut decisions are made on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..loader import load_table, widen_if_narrow
from ..registry import QueryFn

# name -> (fn, oracle SQL or None), mirroring registry.QUERIES/ORACLES.
STAGED: dict[str, tuple[QueryFn, str | None]] = {}


def _stage(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        STAGED[name] = (fn, oracle)
        return fn

    return deco


# Shared 5-gram CTE (i33's idiom: tokens -> positional grams).  DuckDB
# list slicing t[a:b] is 1-based inclusive; Spark slice(t, a, n) is
# 1-based with length — both produce the gram starting at 0-based pos i.
_GRAMS_CTE = """
    toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS pos,
               array_to_string(t[i+1:i+5], ' ') AS g
        FROM toks, unnest(range(0, len(t) - 5 + 1)) AS u(i)
        WHERE len(t) >= 5
    )
"""


def _spark_grams(d: DataFrame, *extra: str) -> DataFrame:
    """(doc_id, *extra, pos, g) positional 5-grams, map-side only."""
    toks = d.select("doc_id", *extra, F.split("text", " ").alias("t"))
    return (
        toks.filter(F.size("t") >= 5)
        .select(
            "doc_id", *extra,
            F.posexplode(F.expr(
                "transform(sequence(0, size(t) - 5),"
                " i -> concat_ws(' ', slice(t, i + 1, 5)))")).alias("pos", "g"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


def dup_gram_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos) of every 5-gram occurring more than once corpus-wide:
    one gram-keyed window shuffle after the map-side explode.  Shared by
    the span kernel (island merge) and the coverage census (token union —
    the two aggregate DIFFERENTLY, see i54)."""
    grams = _spark_grams(docs)
    return (
        grams.withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        .filter(F.col("n") > 1).select("doc_id", "pos")
    )


def dup_token_cover(hits: DataFrame) -> DataFrame:
    """(doc_id, dup_toks): exact count of tokens covered by at least one
    duplicated 5-gram, from dup_gram_positions output.  Each position
    contributes ``min(pos - prev_pos, 5)`` fresh tokens (5 for the first
    in its doc) — the exact interval union, NOT a sum of i48 span lengths
    (which double-counts islands 1-4 positions apart).  One shared
    implementation, called by both i54 and its independent test pin."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("prev", F.lag("pos").over(w))
        .select(
            "doc_id",
            F.when(F.col("prev").isNull(), F.lit(5))
             .otherwise(F.least(F.col("pos") - F.col("prev"), F.lit(5)))
             .alias("fresh"))
        .groupBy("doc_id").agg(F.sum("fresh").alias("dup_toks"))
    )


def span_dedup_spans(docs: DataFrame) -> DataFrame:
    """Kernel behind i48 (staged): (doc_id, text) -> maximal spans of
    corpus-duplicated 5-grams.  Factored out so tools/scale_stress.py can
    amplify it — one gram-keyed window shuffle + one doc-keyed island
    merge, both corpus-linear."""
    hits = dup_gram_positions(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = hits.withColumn(
        "grp", F.col("pos") - F.row_number().over(w).cast("long"))
    return isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(4)).cast("long").alias("span_end"),
        F.count(F.lit(1)).alias("span_grams"),
    ).drop("grp")


@_stage(
    "i48_span_dedup",
    oracle=f"""
        WITH {_GRAMS_CTE},
        dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
        hits AS (
            SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                       AS grp
            FROM grams WHERE g IN (SELECT g FROM dup)
        )
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 4 AS BIGINT) AS span_end,
               CAST(count(*) AS BIGINT) AS span_grams
        FROM hits GROUP BY doc_id, grp
    """,
)
def i48_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact substring duplication (Lee et al. 2022): find, per
    document, the maximal token spans made entirely of 5-grams that occur
    more than once in the corpus — the spans substring-dedup would cut,
    where document-level dedup (i01) sees nothing.

    Plan: positional 5-grams (map-side posexplode), then a window COUNT
    partitioned by the gram — one shuffle on the gram, after which every
    occurrence already knows its corpus-wide multiplicity, so "duplicated"
    is a filter, not an agg-plus-join (which would either re-explode the
    corpus or pin the full exploded frame).  The surviving sliver then
    takes the gaps-and-islands merge per document (pos − row_number is
    constant on consecutive positions).  At 100 TB both stages key on
    gram resp. doc_id — nothing is quadratic and no suffix array is
    materialized.  Width 5 matches i33's contamination gram.
    """
    d = load_table(spark, sf_dir, "documents")
    # i34 precedent: parallelize the CPU-heavy gram explode on degenerate
    # one-file local scans; a real multi-split corpus scan is untouched
    return span_dedup_spans(widen_if_narrow(d.select("doc_id", "text")))


@_stage(
    "i49_weighted_topk_sample",
    oracle="""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   pow((CAST(concat('0x', substr(md5(concat('aes-seed-1:',
                            CAST(doc_id AS VARCHAR))), 1, 8)) AS UBIGINT)
                        + 0.5) / 4294967296.0,
                       1.0 / n_chars) AS k
            FROM documents
        )
        SELECT doc_id, n_chars, round(k, 6) AS aes_key
        FROM keyed ORDER BY k DESC, doc_id LIMIT 50
    """,
)
def i49_weighted_topk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via order statistics
    (Efraimidis–Spirakis A-ES): each doc gets key u^(1/w) with u uniform
    in (0,1) and weight w = n_chars; the k largest keys ARE a weighted
    sample without replacement.  u is the md5-uniform kernel (first 8 hex
    digits of a seeded doc_id hash, +0.5, /2^32) — the same deterministic
    idiom as i36/i43, so membership is a pure function of (seed, doc_id,
    w) and both engines compute the identical sample.

    Unlike i43's Bernoulli gate (independent per-doc coin, random output
    SIZE), A-ES yields EXACTLY k rows — what a budgeted curation pass
    needs.  Map-side key + TakeOrderedAndProject top-k: no global sort,
    no shuffle beyond the k-row reduction, scale-indifferent.
    """
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("aes-seed-1:"), F.col("doc_id").cast("string")))
    u = (F.conv(F.substring(hx, 1, 8), 16, 10).cast("double") + 0.5) \
        / F.lit(4294967296.0)
    k = F.pow(u, 1.0 / F.col("n_chars"))
    return (
        d.select("doc_id", "n_chars", k.alias("k"))
        .orderBy(F.desc("k"), "doc_id").limit(50)
        .select("doc_id", "n_chars", F.round("k", 6).alias("aes_key"))
    )


@_stage(
    "i50_domain_mixture",
    oracle="""
        WITH src AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
            FROM documents GROUP BY source
        ),
        shared AS (
            SELECT source, n_docs, n_toks,
                   n_toks / (SELECT CAST(sum(n_toks) AS DOUBLE) FROM src)
                       AS share
            FROM src
        ),
        tempered AS (
            SELECT *, pow(share, 0.5)
                       / (SELECT sum(pow(share, 0.5)) FROM shared)
                       AS temp_share
            FROM shared
        )
        SELECT source, n_docs, n_toks, round(share, 6) AS share,
               round(temp_share, 6) AS temp_share,
               round((temp_share / share)
                     / (SELECT max(temp_share / share) FROM tempered), 6)
                   AS keep_p,
               round((temp_share / share)
                     / (SELECT max(temp_share / share) FROM tempered)
                     * n_toks, 4) AS kept_toks
        FROM tempered
    """,
)
def i50_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (α = 0.5): flatten per-source token
    shares to share^α (renormalized), then convert the reweighting to
    downsample-only keep probabilities by dividing out the largest
    upsampling ratio — the standard mixture step that keeps small domains
    from vanishing without replicating any data.

    Plan shape at 100 TB: ONE map-side-combined aggregate over the corpus
    produces the per-source census (#sources rows, i.e. tiny), pinned with
    ``localCheckpoint`` (llm_text.py policy) so the share / tempering /
    normalization arithmetic — three levels of totals, each a broadcast
    1-row aggregate — reuses the census instead of re-scanning the corpus
    once per total.  Every post-pin exchange moves #sources rows.  The
    keep_p column then drives a hash-uniform gate exactly like i43's.
    """
    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_toks"),
    ).localCheckpoint()  # reused 4x (totals + output): pin the corpus scan
    tot = src.agg(F.sum("n_toks").cast("double").alias("tot"))
    shared = src.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "n_toks",
        (F.col("n_toks") / F.col("tot")).alias("share"))
    tw = shared.agg(F.sum(F.pow("share", 0.5)).alias("tw_sum"))
    tempered = shared.crossJoin(F.broadcast(tw)).select(
        "*", (F.pow("share", 0.5) / F.col("tw_sum")).alias("temp_share"))
    mx = tempered.agg(
        F.max(F.col("temp_share") / F.col("share")).alias("max_ratio"))
    keep = (F.col("temp_share") / F.col("share")) / F.col("max_ratio")
    return tempered.crossJoin(F.broadcast(mx)).select(
        "source", "n_docs", "n_toks",
        F.round("share", 6).alias("share"),
        F.round("temp_share", 6).alias("temp_share"),
        F.round(keep, 6).alias("keep_p"),
        F.round(keep * F.col("n_toks"), 4).alias("kept_toks"),
    )


@_stage(
    "i51_contamination_matrix",
    oracle=f"""
        WITH {_GRAMS_CTE},
        sg AS (SELECT DISTINCT source, g FROM grams),
        cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams
                FROM sg GROUP BY source),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(count(*) AS BIGINT) AS shared_grams
            FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT source_a, source_b, shared_grams,
               round(shared_grams
                     / CAST(ca.n_grams + cb.n_grams - shared_grams AS DOUBLE),
                     6) AS jaccard
        FROM pairs
        JOIN cnt ca ON ca.source = source_a
        JOIN cnt cb ON cb.source = source_b
    """,
)
def i51_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination audit: for every source pair, the number
    of distinct 5-grams they share and the gram-set Jaccard — i33's
    eval-vs-corpus check widened to an all-pairs matrix (which crawl is
    leaking into which).

    Scale: the (source, gram) frame is deduped FIRST, so the gram self-
    join fans out at most C(#sources, 2) rows per gram — bounded by the
    square of the source count (tens), never by corpus size.  One shuffle
    for the dedup, one gram-keyed join, one tiny pair aggregate; the
    per-source gram counts are a #sources-row broadcast.  On web-scale
    corpora a stop-gram cut (drop grams present in nearly all sources,
    which contribute no discrimination) caps the hot-gram fanout — at
    vocab-31 test scale every gram is hot, which is exactly the stress.
    The deduped (source, gram) frame is localCheckpoint-pinned: it feeds
    three consumers (both self-join sides + the per-source counts), and
    without the pin each would re-explode the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    sg = _spark_grams(d, "source").select("source", "g").distinct() \
        .localCheckpoint()  # reused 3x: pin the corpus gram explode
    cnt = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = sg.alias("a"), sg.alias("b")
    pairs = (
        a.join(b, (F.col("a.g") == F.col("b.g"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("source_a"),
                 F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )
    ca = cnt.select(F.col("source").alias("source_a"),
                    F.col("n_grams").alias("na"))
    cb = cnt.select(F.col("source").alias("source_b"),
                    F.col("n_grams").alias("nb"))
    return (
        pairs.join(F.broadcast(ca), "source_a")
        .join(F.broadcast(cb), "source_b")
        .select(
            "source_a", "source_b", "shared_grams",
            F.round(
                F.col("shared_grams")
                / (F.col("na") + F.col("nb") - F.col("shared_grams"))
                .cast("double"), 6).alias("jaccard"),
        )
    )


@_stage("i52_quantile_drift", oracle=None)
def i52_quantile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-drift dashboard: per language, exact p50/p90 of n_chars next
    to approx_percentile's sketch answer (accuracy 100) and the relative
    drift.  The monitoring query a pipeline runs to decide whether its
    cheap sketches are still trustworthy as the corpus shifts.

    Rows-only by design (like d15): the KLL/GK sketch answer is an
    engine-specific value, so no cross-engine hash can match.  The local
    invariant pin (tests/test_staged_r7.py) brackets each sketch answer
    between the exact (q ± 1/accuracy) quantiles — the error bound
    approx_percentile documents.  At 100 TB only the sketch side is
    runnable (mergeable, bounded memory); the exact side exists to
    measure it, here at test scale.
    """
    d = load_table(spark, sf_dir, "documents")
    g = d.groupBy("lang").agg(
        F.percentile("n_chars", F.lit(0.5)).alias("exact_p50"),
        F.percentile("n_chars", F.lit(0.9)).alias("exact_p90"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(100))
         .cast("double").alias("approx_p50"),
        F.percentile_approx("n_chars", F.lit(0.9), F.lit(100))
         .cast("double").alias("approx_p90"),
    )
    drift = (lambda a, e:
             F.round(F.abs(F.col(a) - F.col(e)) / F.col(e), 6))
    return g.select(
        "lang",
        F.round("exact_p50", 4).alias("exact_p50"),
        "approx_p50",
        F.round("exact_p90", 4).alias("exact_p90"),
        "approx_p90",
        drift("approx_p50", "exact_p50").alias("drift_p50"),
        drift("approx_p90", "exact_p90").alias("drift_p90"),
    )


@_stage(
    "i53_packing_census",
    oracle="""
        WITH toks AS (
            SELECT lang, doc_id, len(string_split(text, ' ')) AS n_toks
            FROM documents
        ), placed AS (
            SELECT lang, n_toks,
                   CAST((sum(n_toks) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_toks) // 512 AS BIGINT) AS bin
            FROM toks
        ), bins AS (
            SELECT lang, bin, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS bin_toks
            FROM placed GROUP BY lang, bin
        )
        SELECT lang, CAST(count(*) AS BIGINT) AS n_bins,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(sum(bin_toks) AS BIGINT) AS total_toks,
               round(avg(bin_toks), 4) AS avg_bin_toks,
               CAST(max(bin_toks) AS BIGINT) AS max_bin_toks,
               round(sum(bin_toks) / (count(*) * 512.0), 6) AS fill_rate,
               CAST(sum(CASE WHEN bin_toks > 512 THEN 1 ELSE 0 END)
                    AS BIGINT) AS overflow_bins
        FROM bins GROUP BY lang
    """,
)
def i53_packing_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency census over i39's 512-token bins: per language,
    how many bins the greedy fixed-boundary packing produced, the average
    and worst bin load, the overall fill rate, and how many bins overflow
    (a doc straddling the boundary lands in its starting bin, so bins CAN
    exceed 512 — the overflow count is the truncation the tokenizer will
    actually perform).

    Plan: i39's per-shard running-sum window (one hash shuffle on lang),
    then two aggregations that both reuse the lang partitioning —
    HashPartitioning(lang) satisfies the clustering requirement of the
    (lang, bin) aggregate AND the final lang aggregate, so the census
    adds ZERO exchanges beyond i39's own window shuffle.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_toks"))
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("run_sum", F.sum("n_toks").over(w)).select(
        "lang", "n_toks", F.expr("(run_sum - n_toks) div 512").alias("bin"))
    bins = placed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("bin_toks"))
    return bins.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("bin_toks").alias("total_toks"),
        F.round(F.avg("bin_toks"), 4).alias("avg_bin_toks"),
        F.max("bin_toks").alias("max_bin_toks"),
        F.round(F.sum("bin_toks") / (F.count(F.lit(1)) * F.lit(512.0)), 6)
         .alias("fill_rate"),
        F.sum(F.when(F.col("bin_toks") > 512, 1).otherwise(0))
         .alias("overflow_bins"),
    )


@_stage(
    "i54_span_coverage",
    oracle=f"""
        WITH {_GRAMS_CTE},
        dup AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
        hits AS (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM grams WHERE g IN (SELECT g FROM dup)
        ),
        cover AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN prev IS NULL THEN 5
                                 ELSE least(pos - prev, 5) END) AS BIGINT)
                       AS dup_toks
            FROM hits GROUP BY doc_id
        )
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(d.text, ' '))) AS BIGINT)
                   AS total_toks,
               CAST(sum(coalesce(cover.dup_toks, 0)) AS BIGINT) AS dup_toks,
               round(sum(coalesce(cover.dup_toks, 0))
                     / CAST(sum(len(string_split(d.text, ' '))) AS DOUBLE), 6)
                   AS dup_share
        FROM documents d LEFT JOIN cover ON d.doc_id = cover.doc_id
        GROUP BY d.source
    """,
)
def i54_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The number substring-dedup decisions are made on: per source, the
    fraction of tokens covered by at least one corpus-duplicated 5-gram.

    Coverage is an exact TOKEN-interval union, not a sum of i48 span
    lengths: i48's islands are maximal in GRAM-position space, but two
    islands separated by a 1-4 position gap still overlap in token space
    (each gram covers 5 tokens), so summing span lengths double-counts
    and can push dup_share past 1.0 (three-doc counterexample pinned in
    tests/test_staged_r7.py).  Instead each duplicated gram position
    contributes ``min(pos - prev_pos, 5)`` fresh tokens (5 for the first
    in its doc) — the exact union length, one lag window in doc order.

    Plan: the shared dup_gram_positions kernel (one scan, one gram-window
    shuffle), a doc_id-partitioned lag + aggregate that REUSE one doc_id
    exchange, then a doc_id-keyed left join against per-doc token counts
    and a per-source rollup — everything keys on doc_id or source, and
    the hits side carries two integers per duplicated gram.
    """
    d = load_table(spark, sf_dir, "documents")
    hits = dup_gram_positions(widen_if_narrow(d.select("doc_id", "text")))
    cover = dup_token_cover(hits)
    toks = d.select("doc_id", "source",
                    F.size(F.split("text", " ")).alias("n_toks"))
    per_doc = toks.join(cover, "doc_id", "left").select(
        "source", "n_toks", F.coalesce("dup_toks", F.lit(0)).alias("dup_toks"))
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_toks"),
        F.sum("dup_toks").alias("dup_toks"),
        F.round(F.sum("dup_toks") / F.sum("n_toks").cast("double"), 6)
         .alias("dup_share"),
    )
