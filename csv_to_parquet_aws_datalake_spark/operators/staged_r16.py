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
plan-shape pins graduated to tests/test_r20_queries.py) and PULLED h26
FORWARD from the spares (moved to its family home in
operators/scalars.py; try-semantics and plan pins graduated likewise).

Remaining spare after the r20 h26 pull-forward: h27 collated grouping —
fully implemented and oracle-tested below, banked because the
2-registrations-per-round cap bound in the final round (the build's
standing CORRECTNESS-budget rule: a third registration would starve the
r15-era stalest re-proof block at the 50-slot cut).
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


