"""Projection / filter / predicate operators (SURVEY.md §2.2, rows b01-b05).

These are pure map-side expressions: no shuffle at any scale, and Catalyst
pushes the filters and the column projection into the parquet scan
(verified by plan assertions in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table
from ..registry import query


@query(
    "b01_project_rename",
    oracle="""
        SELECT c_custkey AS custkey,
               upper(c_name) AS name_upper,
               round(c_acctbal * 1.1, 4) AS bal_up
        FROM customer
    """,
)
def b01_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.upper("c_name").alias("name_upper"),
        # round to 4, not 2: acctbal has 2 decimals, ×1.1 yields exact
        # .5-at-the-3rd-decimal boundaries where engine rounding modes
        # disagree (SURVEY.md §7.3/3)
        F.round(F.col("c_acctbal") * 1.1, 4).alias("bal_up"),
    )


@query(
    "b02_filter_compound",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderstatus IN ('F', 'O')
          AND o_totalprice BETWEEN 50000 AND 200000
          AND o_orderpriority LIKE '%HIGH%'
          AND NOT (o_custkey % 7 = 0)
    """,
)
def b02_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderpriority").like("%HIGH%")
        & ~(F.col("o_custkey") % 7 == 0)
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")


@query(
    "b03_null_semantics",
    oracle="""
        SELECT count(*) AS n_total,
               count(st) AS n_nonnull,
               CAST(sum(CASE WHEN st IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(sum(CASE WHEN st IS NOT DISTINCT FROM 'F' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_f_nullsafe
        FROM (SELECT nullif(o_orderstatus, 'P') AS st FROM orders)
    """,
)
def b03_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata has no NULLs (FIXTURES.md §2) -> inject via nullif, then
    # exercise IS NULL, count-skips-nulls, and null-safe equality <=>.
    o = load_table(spark, sf_dir, "orders")
    return o.withColumn("st", F.expr("nullif(o_orderstatus, 'P')")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("st").alias("n_nonnull"),
        F.sum(F.when(F.col("st").isNull(), 1).otherwise(0)).alias("n_null"),
        F.sum(F.when(F.col("st").eqNullSafe(F.lit("F")), 1).otherwise(0))
         .alias("n_f_nullsafe"),
    )


@query(
    "b04_case_when",
    oracle="""
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    ELSE 'large' END AS bucket,
               count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY 1
    """,
)
def b04_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


@query(
    "b07_hash_sample",
    oracle="""
        SELECT event_type, count(*) AS n, min(event_id) AS first_id
        FROM events
        WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) < '1a'
        GROUP BY 1
    """,
)
def b07_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by content hash (md5 of the key): unlike
    seeded Bernoulli sampling (b06), the picked SET is a pure function of
    the data — reproducible across engines, reruns, partitionings, and
    cluster sizes, which is what a training-data pipeline needs for
    auditable subsets.  Fully oracle-checkable for the same reason."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < "1a")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.min("event_id").alias("first_id"))
    )


@query("b06_stratified_sample")  # partitioning-dependent picks -> rows-only
def b06_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum Bernoulli fractions with
    a fixed seed — the standard corpus-downsampling primitive (e.g. keep
    10% of 'view' events but all 'purchase').  Map-side only; row picks
    depend on the seed AND the input partitioning, hence rows-only."""
    ev = load_table(spark, sf_dir, "events")
    sampled = ev.sampleBy(
        "event_type",
        fractions={"view": 0.1, "click": 0.1, "error": 0.5,
                   "signup": 1.0, "purchase": 1.0},
        seed=42,
    )
    return sampled.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@query(
    "b05_cast",
    oracle="""
        SELECT CAST(l_orderkey AS VARCHAR) AS ok_str,
               TRY_CAST(l_quantity AS INT) AS qty_int,
               CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_str,
               CAST(l_linenumber AS DOUBLE) AS ln_dbl
        FROM lineitem
    """,
)
def b05_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # l_quantity is integral in the testdata, so Spark's truncating
    # double->int cast and DuckDB's rounding cast agree (checked empirically).
    # The INT landing is the LENIENT cast on both engines (r14 probes:
    # Spark's ANSI cast raises CAST_OVERFLOW on NaN and on a finite 1e300
    # where DuckDB errors too) — try_cast/TRY_CAST is the exact symmetric
    # un-representable-is-NULL semantics, with no threshold to pick.
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("ok_str"),
        F.col("l_quantity").try_cast("int").alias("qty_int"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_str"),
        F.col("l_linenumber").cast("double").alias("ln_dbl"),
    )


@query(
    "b08_median_impute",
    oracle="""
        WITH v AS (
            SELECT doc_id, lang,
                   CASE WHEN doc_id % 5 = 0 THEN NULL ELSE n_chars END AS raw
            FROM documents
        ), m AS (
            SELECT lang, quantile_cont(raw, 0.5) AS med FROM v GROUP BY 1
        )
        SELECT v.doc_id AS doc_id, v.lang AS lang,
               CAST(coalesce(v.raw, CAST(round(m.med, 0) AS BIGINT)) AS BIGINT)
                   AS filled,
               (v.raw IS NULL) AS was_imputed
        FROM v JOIN m ON v.lang = m.lang
    """,
)
def b08_median_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group median imputation: null out a deterministic 20% of
    ``n_chars`` (doc_id % 5), then fill each hole with its language's
    median.  The per-group medians are a tiny aggregate (one row per
    lang) joined back by broadcast, so the corpus-side plan is one
    shuffle for the median computation and a map-side fill — the standard
    impute shape for a 100 TB feature table.  Median interpolation halves
    are rounded to an integer so the filled column stays BIGINT on both
    engines."""
    d = load_table(spark, sf_dir, "documents")
    v = d.select(
        "doc_id", "lang",
        F.when(F.col("doc_id") % 5 == 0, None)
         .otherwise(F.col("n_chars")).alias("raw"))
    med = F.broadcast(
        v.groupBy("lang").agg(F.percentile("raw", F.lit(0.5)).alias("med")))
    return (
        v.join(med, "lang")
        .select(
            "doc_id", "lang",
            F.coalesce("raw", F.round("med", 0).cast("long")).alias("filled"),
            F.col("raw").isNull().alias("was_imputed"),
        )
    )
