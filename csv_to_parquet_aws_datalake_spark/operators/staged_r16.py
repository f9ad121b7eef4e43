"""Round-16 candidates, STAGED — implemented and oracle-tested but NOT
registered (the staged_r9/r10/r15 discipline: full implementations with
DuckDB oracles through the driver's own comparator, plan pins, and
independent references, banked so a future registration is mechanical).

Staged in the round-15 continuation session: registering k17 and i66
drained both existing banks, so the forward rounds were given named
moves (original ledger: j11 -> r16, i67 -> r17, j12 -> r18,
a19 -> r19).  Round 16 executed j11 ON schedule (moved to its family
home in streaming/queries.py; lifecycle pins graduated to
tests/test_r16_queries.py) and PULLED i67 FORWARD (the r15 k17/i66
precedent; moved to its family home in llm_vectors.py, reference and
plan pins graduated to tests/test_r16_queries.py), then staged two new
candidates so every remaining round keeps one named move.  REVISED
ledger: j12 -> r17, a19 -> r18, j13 -> r19, k18 -> r20.  Round 17
executed j12 ON schedule (moved to its family home in
streaming/queries.py; signature-equality and reingest pins graduated
to tests/test_r17_queries.py) and PULLED c18 FORWARD from the spares
(moved to operators/joins.py; false-negative and plan-shape pins
graduated likewise).  Round 18 executed a19 ON schedule (moved to its
family home in operators/scans.py; byte-exact and hostile-content pins
graduated to tests/test_r18_queries.py) and PULLED i68 FORWARD from
the spares (moved to operators/llm_text.py beside the i34 kernel it
calibrates; invariant and exact-dup pins graduated likewise).  Round 19
executed j13 ON schedule (moved to its family home in
streaming/queries.py; sentinel/outer-semantics pins and the batch-twin
plan pin graduated to tests/test_r19_queries.py) and PULLED j14
FORWARD from the spares (moved likewise; state-metadata pins graduated
too).  Round 20 (the final round) executed k18 ON schedule (moved to
its family home in operators/multimodal.py beside the k15 framing
kernel it composes; pure-Python-reference, crafted-payload, and
plan-shape pins graduated to tests/test_r20_queries.py).

Remaining spares after the r20 k18 registration: h26 VARIANT
semi-structured extraction, h27 collated grouping.
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


# ---- h26: VARIANT semi-structured extraction (Spark 4 native type) ---------

#: the per-event heterogeneous JSON both engines construct identically
#: from integer columns (k = the props payload's integer, shapes keyed
#: on event_id % 3): a numeric k, a STRING k, and a shape with no meta
#: at all — heterogeneity is the VARIANT type's reason to exist.  All
#: embedded values are integral or non-numeric strings: Spark's variant
#: cast parses "5" -> 5 while DuckDB's TRY_CAST parses '5' -> 5, but
#: the two DISAGREE on decimal strings (Spark truncates, DuckDB
#: rejects), so no decimal is ever embedded (probed before design).
_H26_BRANCHES = (
    ('{"kind":"click","meta":{"k":', ',"path":[', "]}}"),
    ('{"kind":"buy","meta":{"k":"id', '"}}'),
    ('{"kind":"ping"}',),
)


@_stage(
    "h26_variant_semistructured",
    oracle="""
        WITH src AS (
            SELECT event_id, user_id,
                   TRY_CAST(props AS JSON) ->> 'k' AS k
            FROM events WHERE props IS NOT NULL
        ), js AS (
            SELECT CASE
                WHEN event_id % 3 = 0 THEN
                    '{"kind":"click","meta":{"k":' || k || ',"path":['
                    || user_id || ',' || (event_id % 7) || ']}}'
                WHEN event_id % 3 = 1 THEN
                    '{"kind":"buy","meta":{"k":"id' || k || '"}}'
                ELSE '{"kind":"ping"}' END AS j
            FROM src
        ), x AS (
            SELECT CAST(j AS JSON) AS v FROM js
        ), e AS (
            SELECT v ->> '$.kind' AS kind,
                   TRY_CAST(v ->> '$.meta.k' AS BIGINT) AS kb,
                   v ->> '$.meta.k' AS ks,
                   TRY_CAST(v ->> '$.meta.path[1]' AS BIGINT) AS p1
            FROM x
        )
        SELECT kind, CAST(count(*) AS BIGINT) AS n,
               CAST(coalesce(sum(kb), 0) AS BIGINT) AS sum_k,
               CAST(count(kb) AS BIGINT) AS n_k_typed,
               CAST(count(ks) AS BIGINT) AS n_k_any,
               CAST(coalesce(sum(p1), 0) AS BIGINT) AS sum_path1
        FROM e GROUP BY 1
    """,
)
def h26_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's native VARIANT type
    (binary semi-structured values — the schema-FLEXIBLE complement of
    h09/h16's static-schema JSON ops): heterogeneous per-row JSON
    (numeric field, string-typed field, missing subtree — shapes keyed
    on event_id % 3) is parsed ONCE into VARIANT with ``parse_json``
    and fields are extracted with ``try_variant_get``, whose
    try-semantics the census makes observable — the string-typed
    ``"id<k>"`` never types as BIGINT (n_k_typed counts only the
    numeric shape) while the untyped string extraction sees both
    (n_k_any).  VARIANT survives parquet roundtrips natively (probed;
    the shredded-storage path is the 100 TB story: parse once at
    ingest, store binary, extract columnar — never re-parse JSON text
    per query).  The oracle constructs the identical JSON from the same
    integer columns and mirrors the extraction with DuckDB's JSON
    operators; only integral or non-numeric values are embedded (see
    `_H26_BRANCHES` for why).

    Scale shape: parse + extraction are map-side expressions over the
    scan (one whole-stage-codegen span, zero exchanges before the
    4-group aggregate with map-side combine)."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("props").isNotNull())
          .select("event_id", "user_id",
                  F.get_json_object("props", "$.k").alias("k")))
    js = ev.select(F.when(F.col("event_id") % 3 == 0, F.concat(
        F.lit('{"kind":"click","meta":{"k":'), F.col("k"),
        F.lit(',"path":['), F.col("user_id").cast("string"), F.lit(","),
        (F.col("event_id") % 7).cast("string"), F.lit("]}}"),
    )).when(F.col("event_id") % 3 == 1, F.concat(
        F.lit('{"kind":"buy","meta":{"k":"id'), F.col("k"), F.lit('"}}'),
    )).otherwise(F.lit('{"kind":"ping"}')).alias("j"))
    e = js.select(F.parse_json("j").alias("v")).selectExpr(
        "try_variant_get(v, '$.kind', 'string') AS kind",
        "try_variant_get(v, '$.meta.k', 'bigint') AS kb",
        "try_variant_get(v, '$.meta.k', 'string') AS ks",
        "try_variant_get(v, '$.meta.path[1]', 'bigint') AS p1",
    )
    return e.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("kb"), F.lit(0)).alias("sum_k"),
        F.count("kb").alias("n_k_typed"),
        F.count("ks").alias("n_k_any"),
        F.coalesce(F.sum("p1"), F.lit(0)).alias("sum_path1"))


# ---- h27: collated grouping (Spark 4 native string collations) -------------

@_stage(
    "h27_collated_grouping",
    oracle="""
        WITH src AS (
            SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                        ELSE event_type END AS x
            FROM events WHERE event_type IS NOT NULL
        )
        SELECT min(x) AS k, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN x = upper(x) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ucase,
               CAST(count(DISTINCT x) AS BIGINT) AS n_variants
        FROM src GROUP BY lower(x)
    """,
)
def h27_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping through Spark 4's native string
    COLLATIONS (ICU UTF8_LCASE — the type-level form of the
    lower()-wrapping workaround every pre-collation pipeline carries):
    a mixed-case domain (upper-cased on even event ids) groups under a
    COLLATED key, and the census proves the merge — n_variants counts
    the distinct BINARY spellings each collated group absorbed, n_ucase
    how many rows arrived upper-cased.  The group representative is the
    binary min of the RAW column (deterministic; the collated key
    itself has no canonical spelling, which is exactly why it is
    dropped from the output).

    Domain contract: the constructed keys are ASCII-only (event types),
    where ICU lowercase folding and the oracle's lower() agree
    byte-for-byte; non-ASCII is deliberately out of scope — ICU FULL
    case folding diverges from simple lower() (the classic eszett ->
    'ss'), so a corpus-text collation would need an ICU-faithful
    oracle, not a lower() mirror.

    Scale shape: the collated groupBy is one hash aggregate with
    map-side combine, identical exchange shape to a binary groupBy —
    collation changes the comparator, not the plan."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isNotNull()))
    src = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type")).alias("x"))
    return (src.groupBy(F.expr("collate(x, 'UTF8_LCASE')").alias("xc"))
            .agg(F.min("x").alias("k"),
                 F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("x") == F.upper("x"), 1)
                       .otherwise(0)).alias("n_ucase"),
                 F.countDistinct("x").alias("n_variants"))
            .select("k", "n", "n_ucase", "n_variants"))


