"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`csv_to_parquet_aws_datalake_spark.registry` — every
operator from SURVEY.md §2 registers itself there as a ``(spark, sf_dir) ->
DataFrame`` callable plus (where SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from csv_to_parquet_aws_datalake_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "d01_groupby_core"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    registry.load_all()
    return registry.QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


# Round-1 driver coverage stopped after 50 entries (registration order), so
# ordering is part of the contract surface: queries the driver has NOT yet
# recorded come first, previously recorded ones last.  Within the unproven
# block, the three round-1 hash failures (now fixed) lead so the fix is
# proven immediately even under a tight driver budget.
_R1_RECORDED = {
    "d10_approx_distinct", "d15_percentile_approx", "i04_minhash_lsh",
    "c01_inner_equi", "c02_left_outer", "c03_full_outer", "c04_semi",
    "c05_anti", "c06_cross", "c07_broadcast", "c08_range_theta", "c09_asof",
    "c10_interval", "c11_multiway", "c12_upsert_merge", "c13_scalar_subquery",
    "d01_groupby_core", "d02_count_distinct", "d03_having", "d04_rollup",
    "d05_cube", "d06_grouping_sets", "d08_stats", "d09_percentile_exact",
    "d11_collect_sorted", "d12_min_max_by", "d13_distinct_rows",
    "d14_salted_agg", "i01_dedup_exact", "i02_dedup_keep_first",
    "i03_shingle_jaccard", "i05_cosine_knn", "i06_pairwise_sim_threshold",
    "i07_token_stats", "i08_tfidf", "i09_ngrams", "i11_embedding_norms",
    "i12_length_histogram", "i13_language_id", "i14_quality_score",
    "i15_fingerprint", "i16_simhash", "i17_simhash_pairs", "i20_token_count",
    "i21_rolling_hash", "i22_dedup_clusters", "i23_nearest_centroid",
}
_R1_FIXED_FAILURES = ["d07_conditional_agg", "i10_pivot_lang_source",
                      "i24_curation_pipeline"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    names = sorted(registry.QUERIES)
    # unproven block is interleaved round-robin across §2 families so a
    # budget cut at any depth still lands driver rows for EVERY family;
    # depth counts only unproven names, so late-numbered additions (i25+)
    # interleave fairly instead of queueing behind their family's history
    depth = {}
    for n in names:
        if n in _R1_RECORDED or n in _R1_FIXED_FAILURES:
            continue
        fam = n.split("_")[0][0]
        depth[n] = depth.get(fam, -1) + 1
        depth[fam] = depth[n]

    def rank(name: str) -> tuple[int, int, str]:
        if name in _R1_FIXED_FAILURES:
            return (0, 0, name)
        if name not in _R1_RECORDED:
            return (1, depth[name], name)
        return (2, 0, name)

    ordered = sorted(names, key=rank)
    return {n: registry.QUERIES[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
