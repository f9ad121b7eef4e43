"""UDF / UDAF / UDTF surface (SURVEY.md §2.11, rows k01-k05).

These exist to prove the Python extension points, not for the hot path:
k01 is the row-at-a-time anti-pattern (pickled per row), k02+ are
Arrow-vectorized.  Where an operator is expressible in built-in functions,
the built-in always wins (§4) — every UDF here has a pure-SQL oracle
demonstrating exactly that.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..loader import load_table
from ..registry import query


@query(
    "k01_python_udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 + l_tax), 4) AS taxed
        FROM lineitem WHERE l_linenumber = 1
    """,
)
def k01_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # row-at-a-time scalar UDF (serde per row — the slow path, kept for
    # surface parity; restricted to one line per order so the demo does not
    # dominate suite runtime).  Rounding happens JVM-side: Python round()
    # is half-even and would diverge.
    # no Python type hints on purpose: udf() tries to infer the eval type
    # from them and warns when it can't; the explicit returnType is the
    # whole contract for a pickled scalar UDF
    @F.udf(T.DoubleType())
    def taxed_price(price, tax):
        return price * (1.0 + tax)

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(taxed_price("l_extendedprice", "l_tax"), 4).alias("taxed"),
    )


@query(
    "k02_pandas_udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(CASE WHEN isfinite(l_extendedprice * (1 - l_discount))
                          THEN l_extendedprice * (1 - l_discount) END,
                     4) AS disc_price
        FROM lineitem
    """,
)
def k02_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-vectorized scalar UDF: identical IEEE double math to the JVM,
    # ~10-100x the throughput of k01.  A non-finite product is MISSING on
    # both engines (r14 probe: the Arrow return boundary converts pandas
    # NaN to NULL while Inf survived — the mask makes the boundary's NaN
    # conflation explicit and extends it to Inf).
    @F.pandas_udf(T.DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        r = price * (1.0 - discount)
        return r.where(np.isfinite(r))

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(disc_price("l_extendedprice", "l_discount"), 4).alias("disc_price"),
    )


@query(
    "k03_grouped_map",
    oracle="""
        WITH ev AS (
            SELECT event_id, event_type,
                   CASE WHEN isfinite(value) AND abs(value) < 1e150
                        THEN value END AS v
            FROM events
        )
        SELECT event_id,
               round((v - avg(v) OVER (PARTITION BY event_type))
                     / nullif(stddev_samp(v) OVER (PARTITION BY event_type), 0),
                     6) AS z
        FROM ev
    """,
)
def k03_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-group pandas transform (z-score); pandas ddof=1 == stddev_samp.
    # Degenerate groups (single row / zero variance) emit NULL — pandas
    # would produce NaN/inf where SQL's NULL-propagating division yields
    # NULL, so the guard uses the nullable Float64 dtype (Arrow -> null).
    # Measures whose SQUARE cannot stay finite are MISSING on both
    # engines (r14 probes: pandas skipna already drops NaN but lets Inf
    # poison the group mean, and DuckDB's stddev_samp hard-errors on Inf
    # AND on finite input past ~1e154 — x*x overflows; the single
    # |v| < 1e150 predicate sweeps NaN too since its comparison is
    # false).  A no-op on any money-scale corpus.
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].where(np.abs(pdf["value"]) < 1e150)
        std = v.std(ddof=1)
        if len(pdf) < 2 or pd.isna(std) or std == 0.0:
            z = pd.array([pd.NA] * len(pdf), dtype="Float64")
        else:
            z = (v - v.mean()) / std
        return pd.DataFrame({"event_id": pdf["event_id"], "z": z})

    ev = load_table(spark, sf_dir, "events")
    out = ev.groupBy("event_type").applyInPandas(zscore, "event_id long, z double")
    return out.select("event_id", F.round("z", 6).alias("z"))


@query(
    "k04_pandas_udaf",
    oracle="""
        SELECT event_type,
               round(sum(CASE WHEN isfinite(value) THEN value END
                         * CAST(TRY_CAST(props AS JSON) ->> 'k' AS INT))
                     / sum(CAST(TRY_CAST(props AS JSON) ->> 'k' AS INT)), 6) AS wmean
        FROM events GROUP BY 1
    """,
)
def k04_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # custom grouped aggregate (weighted mean) as a GROUPED_AGG pandas UDF.
    # A non-finite measure contributes NOTHING to the numerator but its
    # weight stays in the denominator — exactly the NULL-value semantics
    # both engines already share (pandas skipna / SQL sum-skips-NULL);
    # the r14 probe found Inf flowing into the pandas numerator while
    # DuckDB's sum turned NaN into a whole-group NaN, so the missing-
    # measure treatment is now explicit and symmetric.
    @F.pandas_udf(T.DoubleType())
    def wmean(v: pd.Series, w: pd.Series) -> float:
        v = v.where(np.isfinite(v))
        if v.count() == 0:
            return None  # SQL: sum over all-NULL is NULL, not 0
        return float((v * w).sum() / w.sum())

    ev = load_table(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int"))
    return (
        ev.groupBy("event_type")
        .agg(F.round(wmean("value", "k"), 6).alias("wmean"))
    )


@query(
    "k08_broadcast_udf",
    oracle="""
        SELECT o_orderkey,
               CASE o_orderpriority
                    WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
                    WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
                    ELSE 5 END AS prio_rank
        FROM orders
    """,
)
def k08_broadcast_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the correct pattern for driver-side lookup state in a UDF: a broadcast
    # variable is shipped to each executor ONCE, instead of re-pickling a
    # captured dict into every task closure (guide pitfall).  For a mapping
    # this small a join/CASE is of course the better plan — the point is
    # the plumbing for lookups too big to inline but small enough to ship.
    ranks = {"1-URGENT": 1, "2-HIGH": 2, "3-MEDIUM": 3,
             "4-NOT SPECIFIED": 4, "5-LOW": 5}
    b_ranks = spark.sparkContext.broadcast(ranks)

    @F.pandas_udf(T.IntegerType())
    def prio_rank(prio: pd.Series) -> pd.Series:
        m = b_ranks.value
        return prio.map(lambda p: m.get(p, 5)).astype("int32")

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", prio_rank("o_orderpriority").alias("prio_rank"))


@query(
    "k05_python_udtf",
    oracle="""
        SELECT tok, count(*) AS n
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        GROUP BY 1 ORDER BY n DESC, tok LIMIT 25
    """,
)
def k05_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF (Spark 4): table function emitting one row per token,
    # applied per input row via LATERAL join
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok string")
    class Tokenize:
        def eval(self, text: str):
            # NULL text emits no rows — exactly the oracle's
            # unnest(string_split(NULL)) (r12 null-docs sweep: the
            # unguarded split crashed the Python worker)
            if text is None:
                return
            for t in text.split(" "):
                yield (t,)

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_documents")
    return spark.sql("""
        SELECT t.tok, count(*) AS n
        FROM udtf_documents, LATERAL tokenize_udtf(text) t
        GROUP BY 1 ORDER BY n DESC, tok LIMIT 25
    """)


@query(
    "k09_map_in_arrow",
    oracle="""
        SELECT l_returnflag, count(*) AS n,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY 1
    """,
)
def k09_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy Python extension point below pandas:
    the callback receives raw pyarrow RecordBatches (no pandas conversion
    cost), here computing per-batch PARTIAL aggregates — user-space
    map-side combine — finished by a tiny JVM groupBy.  The shuffle
    carries one row per (batch, group) instead of per input row, the same
    contract Catalyst's partial aggregation gives built-ins; l_quantity is
    integer-valued so re-folding partial double sums is exact."""
    import pyarrow as pa

    def partial_agg(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            g = t.group_by("l_returnflag").aggregate(
                [("l_quantity", "sum"), ("l_quantity", "count")])
            # select by NAME: pyarrow's key-column position moved across
            # versions, and mapInArrow binds the declared schema by position
            g = g.select(["l_returnflag", "l_quantity_sum", "l_quantity_count"])
            yield from g.to_batches()

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity")
    partial = li.mapInArrow(
        partial_agg,
        "l_returnflag string, l_quantity_sum double, l_quantity_count long")
    return partial.groupBy("l_returnflag").agg(
        F.sum("l_quantity_count").alias("n"),
        F.round(F.sum("l_quantity_sum"), 2).alias("sum_qty"))


@query(
    "k10_arrow_python_udf",
    oracle="""
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))
                    AS BIGINT) AS n_vowels
        FROM documents
    """,
)
def k10_arrow_python_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized row Python UDF (useArrow=True, Spark 3.5+): same
    per-row programming model as k01 but the executor<->Python transfer is
    Arrow batches instead of pickled rows — the migration path that speeds
    up legacy row UDFs ~2-5x without rewriting them as pandas UDFs.  Still
    Python-bound per row, so at 100 TB the built-in regexp (the oracle's
    formulation) remains the real answer; this row exists to pin the
    plumbing."""
    @F.udf(returnType=T.LongType(), useArrow=True)
    def n_vowels(s: str) -> int:
        # NULL in, NULL out — the oracle's length(NULL) arithmetic
        # (r12 null-docs sweep: the unguarded count crashed the worker)
        return None if s is None else sum(s.count(v) for v in "aeiou")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", n_vowels("text").alias("n_vowels"))


@query(
    "k11_iterator_pandas_udf",
    oracle="""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
                   AS n_runs
        FROM documents
    """,
)
def k11_iterator_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-of-Series pandas UDF: the init-once-per-task variant — the
    compiled regex is built ONE time per executor task, then reused across
    every Arrow batch (the pattern for loading a tokenizer/model once
    instead of per batch; k08 is the sibling for broadcast lookup state).
    Counts maximal vowel runs, an exact-integer output both engines' regex
    dialects (Java / RE2) agree on."""
    from typing import Iterator

    def n_runs_fn(it):
        import re
        pat = re.compile(r"[aeiou]+")  # once per task, amortized over batches
        for s in it:
            # NULL in, NULL out via the pandas nullable Int64 dtype — the
            # oracle's len(regexp_extract_all(NULL)) (r12 null-docs sweep:
            # the unguarded findall crashed the worker)
            yield pd.Series(
                [None if t is None else len(pat.findall(t)) for t in s],
                dtype="Int64")

    # module-level `from __future__ import annotations` stringifies inline
    # hints, which pyspark's signature inference cannot evaluate — attach
    # the real annotation OBJECTS instead
    n_runs_fn.__annotations__ = {
        "it": Iterator[pd.Series], "return": Iterator[pd.Series]}
    n_runs = F.pandas_udf(n_runs_fn, T.LongType())

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", n_runs("text").alias("n_runs"))


@query(
    "k12_cogrouped_map",
    oracle="""
        WITH oc AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1)
        SELECT COALESCE(c_custkey, o_custkey) AS custkey,
               COALESCE(n, 0) AS n_orders,
               round(CASE WHEN isfinite(c_acctbal) THEN c_acctbal END, 2)
                   AS bal
        FROM customer FULL JOIN oc ON c_custkey = o_custkey
    """,
)
def k12_cogrouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas map (groupBy.cogroup.applyInPandas): both tables
    are hash-partitioned on the key and each key's two pandas frames meet
    in one Python call — the extension point for custom merge logic no
    join expresses (interval alignment, per-key model scoring).  Here it
    re-derives an outer join + count so the DuckDB oracle can check the
    plumbing exactly: keys seen on either side must appear once, with
    empty-side frames handled (the classic cogroup edge case).

    Scale shape: cogroup on a BUCKET of the key (pmod 64), not the key
    itself, so each Python call receives a whole bucket and merges it with
    vectorized pandas.  Cogrouping on the raw key is the applyInPandas
    anti-pattern — one interpreter round-trip and one 1-row DataFrame per
    key (measured 29 s for 15k keys at sf0.1, i.e. ~2 ms/key of pure
    overhead; billions of keys at corpus scale).  Bucketing amortizes the
    Python cost over keys while keeping output and oracle identical; the
    bucket count is the parallelism knob."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    n_buckets = 64

    def merge(key, cpdf, opdf):
        oc = (opdf.groupby("o_custkey").size()
              .rename("n").reset_index())
        m = cpdf.merge(oc, left_on="c_custkey", right_on="o_custkey",
                       how="outer")
        bal = m["c_acctbal"].round(2)
        return pd.DataFrame({
            "custkey": m["c_custkey"]
                .where(m["c_custkey"].notna(), m["o_custkey"])
                .astype("int64"),
            "n_orders": m["n"].fillna(0).astype("int64"),
            # non-finite -> None so customer-less keys AND non-finite
            # balances arrive as SQL NULL: the pandas merge represents a
            # missing left side as NaN, indistinguishable from a stored
            # NaN, so the finite-is-missing contract is the only
            # expressible semantics at this boundary (r14 probe)
            "bal": bal.astype(object).where(
                np.isfinite(m["c_acctbal"].astype(float)), None),
        })

    cb = c.withColumn("bkt", F.pmod("c_custkey", F.lit(n_buckets)))
    ob = o.withColumn("bkt", F.pmod("o_custkey", F.lit(n_buckets)))
    return (
        cb.groupBy("bkt")
        .cogroup(ob.groupBy("bkt"))
        .applyInPandas(merge, "custkey long, n_orders long, bal double")
    )
