"""i63 line-dedup rewrite (registered round 13 — graduated from the
r10 staging module per the VERDICT r12 registration ranking): the
constructed-corpus hand check, the untouched-document byte-identity
round trip, and the no-window/no-cartesian plan pin, migrated from
tests/test_staged_r10.py.  Oracle parity runs through the registry-wide
differential suite (tests/test_differential.py) like every registered
query."""

from __future__ import annotations

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.llm_text import (
    line_dedup_rewrite,
)
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def test_i63_rewrite_on_constructed_docs(spark):
    # hand-checkable corpus (the retired i62 census's frame, now through
    # the rewrite): doc 1 keeps its boilerplate (keep-first) and tail;
    # doc 2 drops the boilerplate and keeps "y1"; doc 3's shifted copy
    # is untouched (segmentation is block-keyed, the documented C4
    # approximation); doc 5 (the non-keep copy of "t0 t1") is rewritten
    # to the EMPTY string — the all-dropped edge both engines must
    # agree on
    boiler = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    rows = [
        (1, boiler + " x1 x2"),
        (2, boiler + " y1"),
        (3, "pad " + boiler),
        (4, "t0 t1"),
        (5, "t0 t1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_kept"], r["n_dropped"], r["clean_text"])
           for r in line_dedup_rewrite(df).collect()}
    assert got == {
        1: (2, 0, boiler + " x1 x2"),
        2: (1, 1, "y1"),
        3: (2, 0, "pad " + boiler),
        4: (1, 0, "t0 t1"),
        5: (0, 1, ""),
    }


def test_i63_untouched_docs_round_trip(spark, sf_dir):
    # conservation + identity invariants against the raw corpus: line
    # counts add up to the segmentation's total, and every document the
    # rewrite did NOT touch reconstructs byte-identically from its
    # pseudo-lines
    from pyspark.sql import functions as F

    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    out = registry.QUERIES["i63_line_dedup_rewrite"](spark, sf_dir)
    joined = out.join(d, "doc_id").collect()
    assert len(joined) == d.count()
    total = sum((len(r["text"].split(" ")) + 9) // 10 for r in d.collect())
    assert sum(r["n_kept"] + r["n_dropped"] for r in joined) == total
    touched = 0
    for r in joined:
        if r["n_dropped"] == 0:
            assert r["clean_text"] == r["text"], r["doc_id"]
        else:
            touched += 1
    assert touched > 0  # the corpus's exact-dup docs guarantee drops


def test_i63_plan_shape(spark, sf_dir):
    # line-keyed boiler agg + line-keyed probe join + one doc-keyed
    # reconstruction agg; no window, no cartesian (the hot-line case
    # stays a splittable hash key end to end)
    plan = physical_plan(
        registry.QUERIES["i63_line_dedup_rewrite"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
