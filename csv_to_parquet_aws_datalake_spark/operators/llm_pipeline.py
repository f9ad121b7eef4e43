"""Training-data pipeline primitives: splits, sampling, chunking, packing.

The four operations every large-scale pretraining data pipeline runs after
curation (BASELINE.json north star; complements the dedup/ANN families in
llm_text.py / llm_vectors.py):

- i36 deterministic hash split — train/val/test assignment that is stable
  across reruns, cluster sizes, and row order (unlike ``randomSplit``,
  whose assignment depends on partitioning).  Pure map-side expression.
- i37 stratified sampling — exactly k docs per stratum, chosen by a
  content-hash order so the sample is deterministic yet unbiased w.r.t.
  ingestion order.  One shuffle on the stratum key.
- i38 document chunking — fixed-size overlapping character windows
  (the pre-tokenization chunking step).  Map-side explode, no shuffle.
- i39 sequence packing — greedy fixed-boundary packing of documents into
  context-window bins by running token offset.  Packing is per-shard
  (window partitioned by the shard key), never a global sort: at 100 TB a
  single global cumulative sum would serialize on one task, and training
  pipelines only need intra-shard sequential semantics anyway.

Every op is engine-deterministic (md5 / integer arithmetic only), so each
has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..loader import load_table
from ..registry import query

# md5-hex digit -> 0..15, the cross-engine idiom established by i16_simhash
# (llm_text.py): locate/strpos into the hex alphabet, 1-based, minus one.
_HEXPOS_SPARK = "(locate(substring({h}, {p}, 1), '0123456789abcdef') - 1)"
_HEXPOS_DUCK = "(strpos('0123456789abcdef', substr({h}, {p}, 1)) - 1)"


def _bucket256(h: str, spark_side: bool) -> str:
    """First two hex digits of md5 column ``h`` as an int in 0..255."""
    pos = _HEXPOS_SPARK if spark_side else _HEXPOS_DUCK
    return f"({pos.format(h=h, p=1)} * 16 + {pos.format(h=h, p=2)})"


@query(
    "i36_hash_split",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, md5(concat('split-seed-1:', CAST(doc_id AS VARCHAR))) AS hx
            FROM documents
        )
        SELECT doc_id, {_bucket256('hx', False)} AS bucket,
               CASE WHEN {_bucket256('hx', False)} < 205 THEN 'train'
                    WHEN {_bucket256('hx', False)} < 230 THEN 'val'
                    ELSE 'test' END AS split
        FROM h
    """,
)
def i36_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test split keyed on document id.

    bucket = first byte of md5('split-seed-1:' || doc_id) -> 0..255;
    train < 205 (80.1%), val < 230 (9.8%), test otherwise (10.2%).  The
    seed string versions the split: changing it reassigns every doc, so a
    pipeline can keep historical splits addressable.  At 100 TB this is a
    shuffle-free narrow projection fused into the scan; the same
    expression evaluated on any engine yields the same assignment, which
    is what makes the split auditable.
    """
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("split-seed-1:"), F.col("doc_id").cast("string")))
    bucket = F.expr(_bucket256("hx", True))
    return (
        d.select("doc_id", hx.alias("hx"))
        .select(
            "doc_id",
            bucket.alias("bucket"),
            F.when(bucket < 205, "train")
             .when(bucket < 230, "val")
             .otherwise("test").alias("split"),
        )
    )


@query(
    "i37_stratified_sample",
    oracle="""
        WITH ranked AS (
            SELECT lang, doc_id,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY md5(concat('samp-seed-1:', text)), doc_id) AS rk
            FROM documents
        )
        SELECT lang, doc_id, rk FROM ranked WHERE rk <= 20
    """,
)
def i37_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (k=20 per language).

    Rank within each stratum by md5 of the content (salted), tie-broken by
    doc_id, keep the top k: deterministic across reruns and independent of
    ingestion order, unlike ``sampleBy`` (probabilistic fractions) or
    ``limit`` (partitioning-dependent).  One hash-partition shuffle on the
    stratum key; per-stratum top-k is sort-truncated inside each
    partition.  Skewed strata are AQE's skew-join/partition problem, not a
    correctness one — the rank is total within the stratum regardless.
    """
    d = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.md5(F.concat(F.lit("samp-seed-1:"), F.col("text"))), "doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
    )


@query(
    "i38_doc_chunking",
    oracle="""
        WITH c AS (
            SELECT doc_id, text,
                   unnest(range(0, (greatest(n_chars - 100, 0) + 79) // 80 + 1))
                       AS i
            FROM documents
        )
        SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
               substr(text, CAST(i * 80 + 1 AS INTEGER), 100) AS chunk,
               CAST(length(substr(text, CAST(i * 80 + 1 AS INTEGER), 100))
                    AS BIGINT) AS chunk_len
        FROM c
    """,
)
def i38_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping character chunks (size 100, stride 80).

    chunk i covers [i*80, i*80 + 100); the last chunk starts at the last
    stride boundary below ``n_chars`` so every character lands in at least
    one chunk and consecutive chunks overlap by 20 chars (the standard
    context-continuity overlap before tokenization).  Chunk count is the
    exact integer ``(max(n_chars - 100, 0) + 79) div 80`` (+1 for chunk 0)
    — integer arithmetic on both engines, no float ceil.  At 100 TB this
    is a map-side explode: no shuffle, output partitioning inherits the
    scan, and downstream tokenization sees bounded-length strings.
    """
    d = load_table(spark, sf_dir, "documents")
    hi = F.expr("(greatest(n_chars - 100, 0) + 79) div 80")
    return (
        d.select("doc_id", "text",
                 F.explode(F.sequence(F.lit(0), hi)).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.expr("substring(text, chunk_id * 80 + 1, 100)").alias("chunk"),
            F.expr("length(substring(text, chunk_id * 80 + 1, 100))")
             .alias("chunk_len"),
        )
    )


@query(
    "i39_sequence_packing",
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
        )
        SELECT lang, bin, count(*) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS sum_toks
        FROM placed GROUP BY lang, bin
    """,
)
def i39_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 512-token context bins by running offset.

    Each doc's bin is ``floor(tokens_before_it / 512)`` within its shard
    (language), i.e. greedy fixed-boundary packing in doc_id order —
    deterministic, single-pass, and exactly what sequence-packing does
    before example concatenation.  Packing is per-shard ON PURPOSE: the
    window partitions by ``lang``, so at 100 TB the cumulative sum runs
    independently per shard after one hash shuffle.  A global (unkeyed)
    running sum would force a 1-task sort — the anti-pattern this
    formulation exists to avoid; training pipelines only need intra-shard
    sequential placement.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", "doc_id", F.size(F.split("text", " ")).alias("n_toks"))
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn("run_sum", F.sum("n_toks").over(w)).select(
        "lang", "n_toks",
        F.expr("(run_sum - n_toks) div 512").alias("bin"),
    )
    return placed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("sum_toks"))


@query(
    "i43_weighted_sample",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, n_chars,
                   md5(concat('wsamp-seed-1:', CAST(doc_id AS VARCHAR))) AS hx
            FROM documents
        )
        SELECT doc_id, n_chars,
               CAST({_bucket256('hx', False)} AS BIGINT) AS bucket,
               round(least(1.0, n_chars / 400.0) * 256, 4) AS threshold
        FROM h
        WHERE {_bucket256('hx', False)} < least(1.0, n_chars / 400.0) * 256
    """,
)
def i43_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep a document with
    probability proportional to a quality proxy (here length capped at 400
    chars), implemented as hash-uniform < weight.  Unlike ``sample()``,
    membership is a pure function of (seed, doc_id, weight) — rerunning at
    any scale or partitioning keeps the identical subset, which is what
    makes sampled corpora reproducible.  Shuffle-free: the hash, the
    weight, and the filter all fuse into the scan."""
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("wsamp-seed-1:"), F.col("doc_id").cast("string")))
    bucket = F.expr(_bucket256("hx", True))
    thresh = F.least(F.lit(1.0), F.col("n_chars") / 400.0) * 256
    return (
        d.select("doc_id", "n_chars", hx.alias("hx"))
        .filter(bucket < thresh)
        .select(
            "doc_id", "n_chars",
            bucket.cast("long").alias("bucket"),
            F.round(thresh, 4).alias("threshold"),
        )
    )


@query(
    "i45_snapshot_diff",
    oracle="""
        WITH old AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN md5(reverse(text))
                        ELSE md5(text) END AS fp
            FROM documents WHERE doc_id % 11 <> 3
        ), new AS (
            SELECT doc_id, md5(text) AS fp
            FROM documents WHERE doc_id % 13 <> 5
        )
        SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
               CASE WHEN old.doc_id IS NULL THEN 'added'
                    WHEN new.doc_id IS NULL THEN 'removed'
                    WHEN old.fp <> new.fp THEN 'changed'
                    ELSE 'same' END AS status
        FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    """,
)
def i45_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot reconciliation: classify every document as
    added/removed/changed/same between two crawl snapshots by comparing
    content fingerprints under a full outer join on doc_id.  The snapshots
    are derived deterministically from the one test corpus (mod-11 drops
    simulate additions, mod-13 drops simulate removals, mod-7 text
    reversal simulates edits).  At 100 TB both sides shuffle once on
    doc_id and the join carries only (id, 32-byte fingerprint) — the
    incremental-ingest primitive that i35 builds its dedup on."""
    d = load_table(spark, sf_dir, "documents")
    old = (
        d.filter(F.col("doc_id") % 11 != 3)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.md5(F.reverse("text")))
             .otherwise(F.md5("text")).alias("fp"))
    )
    new = (
        d.filter(F.col("doc_id") % 13 != 5)
        .select("doc_id", F.md5("text").alias("fp"))
    )
    o, n = old.alias("o"), new.alias("n")
    return (
        o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
        .select(
            F.coalesce("o.doc_id", "n.doc_id").alias("doc_id"),
            F.when(F.col("o.doc_id").isNull(), "added")
             .when(F.col("n.doc_id").isNull(), "removed")
             .when(F.col("o.fp") != F.col("n.fp"), "changed")
             .otherwise("same").alias("status"),
        )
    )


@query(
    "i46_length_quantile_filter",
    oracle="""
        WITH q AS (
            SELECT quantile_cont(n_chars, 0.05) AS lo,
                   quantile_cont(n_chars, 0.95) AS hi
            FROM documents
        )
        SELECT doc_id, n_chars FROM documents CROSS JOIN q
        WHERE n_chars >= lo AND n_chars <= hi
    """,
)
def i46_length_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trim the length-distribution tails: keep documents between the 5th
    and 95th percentile of n_chars — the outlier filter that removes both
    truncated fragments and concatenation blobs before training.  The
    percentiles are a 1-row aggregate broadcast back over the corpus, so
    the filter itself is map-side.  At 100 TB the exact percentile would
    be swapped for approx_percentile (same plan shape, sketch-mergeable);
    exact interpolation here keeps the oracle byte-identical."""
    d = load_table(spark, sf_dir, "documents")
    q = F.broadcast(d.agg(
        F.percentile("n_chars", F.lit(0.05)).alias("lo"),
        F.percentile("n_chars", F.lit(0.95)).alias("hi")))
    return (
        d.crossJoin(q)
        .filter((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "n_chars")
    )
