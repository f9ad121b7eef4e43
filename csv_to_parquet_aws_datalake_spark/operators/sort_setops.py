"""Sort / limit / top-k (§2.6, f-rows) and set operations (§2.7, g-rows).

Top-k compiles to TakeOrderedAndProject — per-partition heaps + a k-row
merge on the driver, never a full global sort.  Set ops are rewritten by
Catalyst into aggregates / anti-joins (§4), i.e. ordinary shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..loader import load_table
from ..registry import query


@query(
    "f01_topk",
    oracle="""
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY 1, 2
        ORDER BY rev DESC, o_orderkey
        LIMIT 10
    """,
)
def f01_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q3-shaped top-k; LIMIT is tie-broken by the unique o_orderkey
    # (SURVEY.md §2 convention 3).
    # The lineitem side carries a merge hint: the fact table must never be
    # broadcast, but its column-pruned scan estimate (3 of 16 columns)
    # slips under the local broadcast threshold and Catalyst would build a
    # 33 MiB single-threaded broadcast per run.  Sort-merge on l_orderkey
    # is the 100 TB shape; AQE still converts it to per-partition hash /
    # skew-split joins where profitable, and the aggregation reuses the
    # join's orderkey partitioning, so the hint costs nothing at scale.
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li.hint("merge"), o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
              .alias("rev"))
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )


@query(
    "f02_sort_nulls",
    oracle="""
        SELECT o_orderkey, st
        FROM (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st FROM orders)
        ORDER BY st ASC NULLS FIRST, o_orderkey
        LIMIT 50
    """,
)
def f02_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-sort defaults differ across engines (Spark ASC->nulls first,
    # DuckDB->nulls last; SURVEY.md §7.3/5) — under a LIMIT that changes the
    # row SET, so the direction is always spelled out.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("st", F.expr("nullif(o_orderstatus, 'P')"))
        .orderBy(F.col("st").asc_nulls_first(), "o_orderkey")
        .limit(50)
        .select("o_orderkey", "st")
    )


@query(
    "g01_union_all",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .unionAll(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@query(
    "g02_union_distinct",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        UNION
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g02_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .union(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
        .distinct()
    )


@query(
    "g03_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g03_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .intersect(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@query(
    "g04_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def g04_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
        .exceptAll(o.filter(F.col("o_orderstatus") == "O").select("o_custkey"))
    )


@query(
    "g05_union_by_name",
    oracle="""
        SELECT c_custkey AS k, c_acctbal AS bal, NULL AS side FROM customer
        UNION ALL
        SELECT s_suppkey, s_acctbal, 'supp' FROM supplier
    """,
)
def g05_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    # column-name-aligned union; the missing `side` column is null-filled
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    d1 = c.select(F.col("c_custkey").alias("k"), F.col("c_acctbal").alias("bal"))
    d2 = s.select(
        F.col("s_acctbal").alias("bal"),
        F.col("s_suppkey").alias("k"),
        F.lit("supp").alias("side"),
    )
    return d1.unionByName(d2, allowMissingColumns=True)


@query(
    "g06_intersect_all",
    oracle="""
        SELECT o_custkey, o_orderstatus FROM orders
        INTERSECT ALL
        SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
    """,
)
def g06_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multiset intersection: duplicate (custkey, status) rows keep the
    # MINIMUM multiplicity of the two sides — the semantics plain INTERSECT
    # erases; both engines plan it as a counted hash join, one shuffle
    o = load_table(spark, sf_dir, "orders")
    left = o.select("o_custkey", "o_orderstatus")
    right = (o.filter(F.col("o_totalprice") > 100000)
             .select("o_custkey", "o_orderstatus"))
    return left.intersectAll(right)


@query(
    "g07_except_all",
    oracle="""
        SELECT o_custkey, o_orderstatus FROM orders
        EXCEPT ALL
        SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
    """,
)
def g07_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    # multiset difference: multiplicities subtract instead of vanishing
    o = load_table(spark, sf_dir, "orders")
    left = o.select("o_custkey", "o_orderstatus")
    right = (o.filter(F.col("o_totalprice") > 100000)
             .select("o_custkey", "o_orderstatus"))
    return left.exceptAll(right)


@query(
    "f03_offset_pagination",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS tp
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 20 OFFSET 40
    """,
)
def f03_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset-free pagination: page 3 of a 20-row listing.  offset+limit
    still compiles to a single TakeOrderedAndProject (per-partition heaps
    of offset+limit rows, driver merge, then the offset rows are dropped)
    — no global sort.  The deep-page trap is documented rather than
    hidden: at offset k every partition ships k+limit rows, so 100 TB
    pagination should switch to keyset predicates (WHERE (price, key) <
    last_seen) once k grows; the ORDER BY is total (unique o_orderkey
    tie-break) so both engines cut the same 20 rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(40)
        .limit(20)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("tp"))
    )


@query(
    "g08_symmetric_difference",
    oracle="""
        SELECT o_custkey, 'F_only' AS side FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        )
        UNION ALL
        SELECT o_custkey, 'O_only' FROM (
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        )
    """,
)
def g08_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: customers appearing in exactly
    one of two cohorts, tagged by side.  Composed from two EXCEPTs + a
    disjoint UNION ALL; Catalyst rewrites each EXCEPT into an aggregate +
    anti-join, and both reuse the same orders scan.  The audit shape for
    migration cutovers (old vs new pipeline output diff) at any scale."""
    o = load_table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return (
        f_keys.subtract(o_keys)
        .withColumn("side", F.lit("F_only"))
        .unionAll(o_keys.subtract(f_keys)
                  .withColumn("side", F.lit("O_only")))
    )
