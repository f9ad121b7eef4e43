"""i65 model-based quality classifier (registered round 14 — graduated
from the r10 staging module per the SURVEY §7.12 ledger's named fate):
the pure-Python independent reference and the zero-exchange plan pin,
migrated from tests/test_staged_r10.py.  Oracle parity runs through the
registry-wide differential suite (tests/test_differential.py) like
every registered query."""

from __future__ import annotations

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def test_i65_matches_pure_python_classifier(spark, sf_dir):
    # independent reference: the whole scorer recomputed in Python from
    # raw text (the shared-formula hazard guard — the oracle SQL mirrors
    # the Spark expressions, so a both-engines-wrong transcription would
    # pass the differential without this)
    import hashlib

    fn = registry.QUERIES["i65_quality_classifier"]
    got = {r["doc_id"]: (r["n_toks"], r["score_e4"], r["keep"])
           for r in fn(spark, sf_dir).collect()}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    want = {}
    for r in docs:
        if r["text"] is None:
            continue
        toks = r["text"].split(" ")
        sw = sum(int(hashlib.md5(t.encode()).hexdigest()[:2], 16) - 128
                 for t in toks)
        n = len(toks)
        score = ((sw + 128 * n) * 10000) // (n * 256)  # operands >= 0
        want[r["doc_id"]] = (n, score, score >= 5000)
    assert got == want
    # the threshold must split the corpus (a one-sided keep gate would
    # mean the fixture never exercises the other branch)
    keeps = {v[2] for v in want.values()}
    assert keeps == {True, False}


def test_i65_plan_is_map_side_only(spark, sf_dir):
    # the i25/i56 idiom: no explode, no exchange at all — one
    # scan+project is the whole 100 TB cost
    fn = registry.QUERIES["i65_quality_classifier"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate explode" not in plan
    assert "BatchEvalPython" not in plan  # pure JVM expressions
