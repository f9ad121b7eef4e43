"""Aggregation operators (SURVEY.md §2.4, rows d01-d13).

All are single-shuffle hash aggregations: Catalyst plans partial (map-side)
aggregation before the exchange, so at 100 TB the shuffle carries one row per
(partition, group), not per input row.  Nothing here needs a custom operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.scalar import MOMENT_BOUND, representable_or_null
from ..loader import load_table
from ..registry import query


@query(
    "d01_groupby_core",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                        AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4)                        AS avg_qty,
               count(*)                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
    """,
)
def d01_groupby_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the flagship query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "d02_count_distinct",
    oracle="""
        SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
        FROM events GROUP BY 1
    """,
)
def d02_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "d03_having",
    oracle="""
        SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        FROM orders GROUP BY 1 HAVING count(*) >= 12
    """,
)
def d03_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "d04_rollup",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS tp
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def d04_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("tp"),
    )


@query(
    "d05_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               round(sum(o_totalprice), 2) AS tp
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def d05_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("tp"),
    )


@query(
    "d06_grouping_sets",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus)   AS g_status,
               grouping(o_orderpriority) AS g_prio,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def d06_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus)   AS g_status,
               grouping(o_orderpriority) AS g_prio,
               count(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """)


@query(
    "d07_conditional_agg",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_extendedprice ELSE 0 END), 2) AS rev_f,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_extendedprice ELSE 0 END), 2) AS rev_o,
               CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
        FROM lineitem GROUP BY 1
    """,
)
def d07_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))
                       .otherwise(0.0)), 2).alias("rev_f"),
        F.round(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_extendedprice"))
                       .otherwise(0.0)), 2).alias("rev_o"),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("n_bulk"),
    )


@query(
    "d08_stats",
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(CASE WHEN isfinite(l_quantity)
                                       AND abs(l_quantity) < 1e150
                                      THEN l_quantity END), 4) AS sd_qty,
               round(var_samp(CASE WHEN isfinite(l_quantity)
                                    AND abs(l_quantity) < 1e150
                                   THEN l_quantity END), 4)    AS var_qty,
               round(avg(l_extendedprice), 2)    AS avg_price
        FROM lineitem GROUP BY 1
    """,
)
def d08_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # variance inputs exclude quantities whose SQUARE cannot stay finite
    # (r14 probes: DuckDB's STDDEV_SAMP hard-errors on Inf and on finite
    # inputs past ~1e154 — x*x overflows); avg stays raw — NaN-in-NaN-out
    # agrees across engines for plain means
    li = load_table(spark, sf_dir, "lineitem")
    qty = representable_or_null("l_quantity", MOMENT_BOUND)
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(qty), 4).alias("sd_qty"),
        F.round(F.var_samp(qty), 4).alias("var_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
    )


@query(
    "d09_percentile_exact",
    oracle="""
        WITH li AS (
            SELECT l_returnflag,
                   CASE WHEN isfinite(l_quantity) THEN l_quantity END AS qty
            FROM lineitem
        )
        SELECT l_returnflag,
               round(quantile_cont(qty, 0.5), 4) AS p50_qty,
               round(quantile_cont(qty, 0.9), 4) AS p90_qty
        FROM li GROUP BY 1
    """,
)
def d09_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Spark's `percentile` is the exact interpolating aggregate — semantically
    # DuckDB's quantile_cont.  SQL form is the cleaner entry point (§3 EP2).
    # Non-finite quantities are MISSING on both engines (r14 probe: Spark's
    # percentile sorts NaN greatest while DuckDB's quantile_cont returns
    # NaN for the whole group — no lenient form exists on either side).
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("pct_lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               round(percentile(CASE WHEN NOT isnan(l_quantity)
                                      AND abs(l_quantity) != double('Infinity')
                                     THEN l_quantity END, 0.5), 4) AS p50_qty,
               round(percentile(CASE WHEN NOT isnan(l_quantity)
                                      AND abs(l_quantity) != double('Infinity')
                                     THEN l_quantity END, 0.9), 4) AS p90_qty
        FROM pct_lineitem GROUP BY 1
    """)


@query("d10_approx_distinct")  # HLL sketches differ across engines -> rows-only
def d10_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


@query("d15_percentile_approx")  # KLL/GK sketches engine-specific -> rows-only
def d15_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles — the 100 TB path where d09's exact percentile
    (full sort per group) is unaffordable: a fixed-size sketch per
    partition, merged map-side, error bounded by the accuracy parameter."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
         .getItem(0).alias("p50"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
         .getItem(1).alias("p90"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000)
         .getItem(2).alias("p99"),
    )


@query(
    "d11_collect_sorted",
    oracle="""
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS prios
        FROM orders GROUP BY 1
    """,
)
def d11_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    # collect_set order is nondeterministic -> always sort_array before joining
    # (SURVEY.md §7.3 hazard 4).
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias("prios"),
    )


@query(
    "d12_min_max_by",
    oracle="""
        SELECT o_custkey, o_orderkey AS best_order, round(o_totalprice, 2) AS best_price
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
    """,
)
def d12_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    # argmax with a deterministic tiebreak: max_by over a struct orders
    # lexicographically (price, then orderkey), unlike bare max_by on ties.
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", F.struct("o_totalprice", "o_orderkey")).alias("best_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
    )


@query(
    "d14_salted_agg",
    oracle="""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sv
        FROM events GROUP BY 1
    """,
)
def d14_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation: 5 hot keys would hash to 5
    reducers at 100 TB, so phase 1 salts each key into 16 shards (fanning
    the hot key across reducers) and phase 2 merges the shard partials.
    Result is identical to the plain groupBy (the oracle); only the
    shuffle distribution changes.  AQE's skew handling covers joins — for
    aggregations, salting remains the manual pattern (SURVEY.md §7.4)."""
    ev = load_table(spark, sf_dir, "events")
    phase1 = (
        ev.withColumn("salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psv"))
    )
    return (
        phase1.groupBy("event_type")
        .agg(F.sum("pn").alias("n"), F.round(F.sum("psv"), 2).alias("sv"))
    )


@query(
    "d13_distinct_rows",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def d13_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # .distinct() is rewritten by Catalyst to a hash aggregate (§4).
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "d16_profile_stats",
    oracle="""
        WITH t AS (
            SELECT o_custkey, o_totalprice,
                   nullif(o_orderstatus, 'P') AS o_status
            FROM orders
        ), m AS (
            SELECT count(*) AS n,
                   count(o_custkey) AS c1, count(DISTINCT o_custkey) AS d1,
                   CAST(min(o_custkey) AS DOUBLE) AS lo1,
                   CAST(max(o_custkey) AS DOUBLE) AS hi1,
                   count(o_totalprice) AS c2, count(DISTINCT o_totalprice) AS d2,
                   min(o_totalprice) AS lo2, max(o_totalprice) AS hi2,
                   count(o_status) AS c3, count(DISTINCT o_status) AS d3,
                   min(o_status) AS lo3, max(o_status) AS hi3
            FROM t
        )
        SELECT 'o_custkey' AS col_name, n - c1 AS n_null, d1 AS n_distinct,
               lo1 AS min_num, hi1 AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
        FROM m
        UNION ALL
        SELECT 'o_totalprice', n - c2, d2, lo2, hi2, NULL, NULL FROM m
        UNION ALL
        SELECT 'o_status', n - c3, d3, NULL, NULL, lo3, hi3 FROM m
    """,
)
def d16_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the ANALYZE TABLE / catalog-crawler shape): null
    count, distinct count, and min/max per column, computed in ONE scan —
    all metrics land in a single aggregate row, then stack() pivots to the
    long (col_name, stats...) form.  Numeric and string extremes ride
    separate typed columns, never a stringified union (double rendering
    differs across engines).  A null-bearing column is injected via nullif
    since the fixtures are null-free.  At 100 TB this is how table stats
    are refreshed: one pass, no per-column rescans; count(DISTINCT) over
    several columns expands to an expand-node — swap for approx sketches
    (d10) when exactness is not required."""
    o = load_table(spark, sf_dir, "orders")
    t = o.select(
        "o_custkey", "o_totalprice",
        F.expr("nullif(o_orderstatus, 'P')").alias("o_status"))
    m = t.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("o_custkey").alias("c1"),
        F.countDistinct("o_custkey").alias("d1"),
        F.min("o_custkey").cast("double").alias("lo1"),
        F.max("o_custkey").cast("double").alias("hi1"),
        F.count("o_totalprice").alias("c2"),
        F.countDistinct("o_totalprice").alias("d2"),
        F.min("o_totalprice").alias("lo2"),
        F.max("o_totalprice").alias("hi2"),
        F.count("o_status").alias("c3"),
        F.countDistinct("o_status").alias("d3"),
        F.min("o_status").alias("lo3"),
        F.max("o_status").alias("hi3"),
    )
    return m.selectExpr("""stack(3,
        'o_custkey',    n - c1, d1, lo1, hi1,
                        CAST(NULL AS STRING), CAST(NULL AS STRING),
        'o_totalprice', n - c2, d2, lo2, hi2,
                        CAST(NULL AS STRING), CAST(NULL AS STRING),
        'o_status',     n - c3, d3, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
                        lo3, hi3
    ) AS (col_name, n_null, n_distinct, min_num, max_num, min_str, max_str)""")


@query(
    "d17_mode",
    oracle="""
        SELECT o_orderpriority, o_orderstatus AS mode_status, n
        FROM (
            SELECT o_orderpriority, o_orderstatus, count(*) AS n,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY count(*) DESC, o_orderstatus) AS rn
            FROM orders GROUP BY 1, 2
        ) t
        WHERE rn = 1
    """,
)
def d17_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode.  Native mode() is tie-arbitrary in
    BOTH engines, so the operator is spelled as count + row_number with an
    explicit (count DESC, value ASC) tie-break — the only formulation two
    engines can agree on.  Scale shape: the heavy reduction happens in the
    partial/final count aggregate (map-side combine on (group, value));
    the window then runs over |distinct groups x values| rows only."""
    o = load_table(spark, sf_dir, "orders")
    counts = (o.groupBy("o_orderpriority", "o_orderstatus")
              .agg(F.count(F.lit(1)).alias("n")))
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), F.asc("o_orderstatus"))
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("o_orderpriority",
                    F.col("o_orderstatus").alias("mode_status"), "n"))


@query(
    "d18_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * l_quantity), 2) AS wsum,
               round(sum(l_quantity), 2)                   AS wtot,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
                   AS wavg_price
        FROM lineitem
        GROUP BY 1
    """,
)
def d18_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean as two plain sums + one division — the decomposition
    that keeps the aggregate ALGEBRAIC (partial-aggregatable), unlike a
    naive avg-of-ratios.  At 100 TB both sums combine map-side; the final
    divide touches |groups| rows.  Both raw sums are emitted alongside the
    ratio so a flap in the quotient's last digit is diagnosable."""
    li = load_table(spark, sf_dir, "lineitem")
    wsum = F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
    wtot = F.sum("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(wsum, 2).alias("wsum"),
        F.round(wtot, 2).alias("wtot"),
        F.round(wsum / wtot, 2).alias("wavg_price"),
    )


@query(
    "d19_corr_regression",
    oracle="""
        WITH li AS (
            SELECT l_returnflag,
                   CASE WHEN isfinite(l_quantity)
                         AND abs(l_quantity) < 1e150
                        THEN l_quantity END AS qty,
                   CASE WHEN isfinite(l_extendedprice)
                         AND abs(l_extendedprice) < 1e150
                        THEN l_extendedprice END AS price
            FROM lineitem
        )
        SELECT l_returnflag,
               round(corr(qty, price), 4)       AS r,
               round(covar_samp(qty, price), 2) AS cv,
               round(regr_slope(price, qty), 2) AS slope
        FROM li
        GROUP BY 1
    """,
)
def d19_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics (corr / covariance / OLS slope) as single-pass
    streaming aggregates — Spark's CentralMomentAgg keeps per-partition
    co-moments that merge associatively, so the full regression runs in
    one map-side-combined shuffle, never a second pass.  d08's rounding
    discipline (4 dp ratios, 2 dp money-scaled moments) absorbs the
    engines' different co-moment update orders.  A pair member whose
    SQUARE cannot stay finite makes the pair MISSING on both engines
    (r14 probes: Inf AND finite 1e300 hard-errored DuckDB's STDDEV_POP
    inside regr_slope while Spark's co-moments went NaN) — SQL's
    bivariate aggregates already skip NULL pairs, so the guard rides
    the engines' shared NULL semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = representable_or_null("l_quantity", MOMENT_BOUND)
    price = representable_or_null("l_extendedprice", MOMENT_BOUND)
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(qty, price), 4).alias("r"),
        F.round(F.covar_samp(qty, price), 2).alias("cv"),
        F.round(F.regr_slope(price, qty), 2).alias("slope"),
    )


@query(
    "d20_bool_agg",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_quantity >= 1)    AS all_qty,
               bool_or(l_discount > 0.09)   AS any_deep_disc,
               count(*) FILTER (WHERE l_tax > 0.05) AS n_taxed
        FROM lineitem
        GROUP BY 1
    """,
)
def d20_bool_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean reductions (every/any) + filtered count.  bool_and/bool_or
    are algebraic single-bit aggregates (map-side combine to one boolean
    per partition); the filtered count is spelled count(CASE) on the Spark
    side and count(*) FILTER in the oracle — both BIGINT, avoiding the
    HUGEINT sum(CASE) trap that cost round 1 three hash failures."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_quantity") >= 1).alias("all_qty"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_deep_disc"),
        F.count(F.when(F.col("l_tax") > 0.05, 1)).alias("n_taxed"),
    )


@query(
    "d21_bitwise_agg",
    oracle="""
        SELECT o_orderpriority,
               bit_and(o_orderkey) AS ba,
               bit_or(o_orderkey)  AS bo,
               bit_xor(o_orderkey) AS bx
        FROM orders
        GROUP BY 1
    """,
)
def d21_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates — exact-integer, order-insensitive,
    and algebraic (each folds map-side), the properties that make them
    the cheapest possible group fingerprints: bit_xor over row hashes is
    the standard O(1)-state table checksum at any scale (h11 uses the
    same idea per row; this is the grouped reduction)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("ba"),
        F.bit_or("o_orderkey").alias("bo"),
        F.bit_xor("o_orderkey").alias("bx"),
    )


@query("d22_hll_sketch_rollup")  # HLL binary sketches are engine-specific -> rows-only
def d22_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count rollup: per (event_type, day) HLL
    sketches built with hll_sketch_agg, then MERGED across days per
    event_type with hll_union_agg — the two-level pattern that makes
    distinct counts composable at 100 TB (daily sketches persist a few KB
    each; any date-range distinct count is a union of sketches, never a
    rescan).  d10 is the one-shot estimate; this row pins the
    merge path.  Sketch bytes are Apache DataSketches-specific, so the
    check is rows-only (d10's precedent)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    )


@query(
    "d23_integrity_audit",
    oracle="""
        SELECT 'orders_orphan_custkey' AS chk,
               (SELECT count(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey)) AS n_bad
        UNION ALL
        SELECT 'lineitem_orphan_orderkey',
               (SELECT count(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'customer_negative_acctbal',
               (SELECT count(*) FROM customer WHERE c_acctbal < 0)
        UNION ALL
        SELECT 'lineitem_discount_range',
               (SELECT count(*) FROM lineitem
                WHERE l_discount < 0 OR l_discount > 1)
    """,
)
def d23_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-layer constraint audit: referential integrity via anti-joins
    plus declarative range checks, one (check, violation-count) row each —
    the validation gate a lake runs between raw ingestion and publishing.
    Scale shapes (r11 broadcast-bound audit): BOTH anti-joins are
    fact-to-fact at TPC-H proportions — customer is SF-proportional
    (150k rows per SF), not a bounded dimension — so neither side is
    hinted; the planner auto-broadcasts customer at fixture scale off
    its scan size and key-shuffles both anti-joins at corpus scale,
    the standard shape.  Range checks are map-side partial counts.
    All four checks run in parallel as independent branches of one
    union."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def chk(name, cnt_df):
        return cnt_df.select(F.lit(name).alias("chk"),
                             F.count(F.lit(1)).alias("n_bad"))

    orphan_orders = o.join(c, o.o_custkey == c.c_custkey, "left_anti")
    orphan_items = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    neg_bal = c.filter(F.col("c_acctbal") < 0)
    bad_disc = li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))
    return (
        chk("orders_orphan_custkey", orphan_orders)
        .unionAll(chk("lineitem_orphan_orderkey", orphan_items))
        .unionAll(chk("customer_negative_acctbal", neg_bal))
        .unionAll(chk("lineitem_discount_range", bad_disc))
    )


@query(
    "d24_heavy_hitters",
    oracle="""
        WITH c AS (
            SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1
        ), t AS (SELECT count(*) AS n FROM lineitem)
        SELECT l_partkey, cnt, round(cnt * 1000.0 / n, 4) AS permille
        FROM c CROSS JOIN t
        WHERE cnt * 2000 > n
        ORDER BY cnt DESC, l_partkey
    """,
)
def d24_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: join keys above 0.05% support, the skew
    diagnosis that decides when a join needs salting (c14) or AQE skew
    handling.  One map-side-combined count per key plus a broadcast 1-row
    total — at 100 TB the per-key count table is the only shuffle, and the
    support filter prunes it to the handful of keys that matter before any
    driver ever sees a row."""
    li = load_table(spark, sf_dir, "lineitem")
    total = F.broadcast(li.agg(F.count(F.lit(1)).alias("n")))
    return (
        li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(total)
        .filter(F.col("cnt") * 2000 > F.col("n"))
        .select("l_partkey", "cnt",
                F.round(F.col("cnt") * 1000.0 / F.col("n"), 4).alias("permille"))
        .orderBy(F.desc("cnt"), "l_partkey")
    )
