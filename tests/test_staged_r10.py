"""Round-10-era staged candidates (operators/staged_r10.py):
oracle-differential through the driver's comparator, plan pins, and
independent references.  The i59 semdedup-ANN tests moved to
tests/test_r11_queries.py when i59 registered (round 11); the i63
line-dedup-rewrite tests moved to tests/test_r13_queries.py when it
registered (round 13), the i60/i62 tests retired with their candidates
in the same §7.9 review, the i65 quality-classifier tests moved to
tests/test_r14_queries.py when it registered (round 14), and the i64
BM25-decontamination tests moved to tests/test_r15_queries.py when it
registered (round 15, the i61 tests retiring with their candidate in
the same commit)."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import STAGED
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_not_registered():
    assert not set(STAGED) & set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_matches_oracle(name, spark, oracle, sf_dir):
    fn, sql = STAGED[name]
    df = fn(spark, sf_dir)
    assert_no_antipatterns(name, df)
    assert sql is not None
    compare(df, oracle, sql)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_tri_sf_parity(name, spark):
    fn, sql = STAGED[name]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = make_oracle_con(sf_dir)
        try:
            compare(fn(spark, sf_dir), con, sql)
        finally:
            con.close()


def test_k17_matches_bruteforce_python(spark, sf_dir):
    # independent reference: brute-force all-pairs Hamming over
    # pure-Python aHash codes (the banded join must find EXACTLY the
    # radius<=1 pairs — the pigeonhole guarantee, verified against an
    # algorithm with no banding at all)
    from tests.test_property import _phash_py

    fn, _ = STAGED["k17_phash_band_neardup"]
    got = {(r["da"], r["db"], r["hamming"])
           for r in fn(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").collect()
    codes = {r["doc_id"]: _phash_py(r["text"].encode())
             for r in docs if r["text"] is not None and len(r["text"]) >= 8}
    ids = sorted(codes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(codes[a] ^ codes[b]).count("1")
            if ham <= 1:
                want.add((a, b, ham))
    assert got == want
    assert any(h == 0 for _, _, h in want)  # both distance classes
    assert any(h == 1 for _, _, h in want)


def test_k17_plan_shape(spark, sf_dir):
    # band-keyed equi-join over the pinned codes: no cartesian, no
    # window (the i34 shape)
    fn, _ = STAGED["k17_phash_band_neardup"]
    plan = physical_plan(fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" not in plan

    # the localCheckpoint pin hides the hashing lineage from the plan
    # above — lint the UNPINNED codes frame separately (this pin moved
    # here from the retired k16 census test): Arrow mapInPandas, never
    # row-at-a-time Python, and map-side only (no exchange below it)
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        phash_codes,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    binary = (d.filter(F.length("text") >= 8)
              .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    cplan = physical_plan(phash_codes(binary))
    assert "MapInPandas" in cplan and "BatchEvalPython" not in cplan
    assert "Exchange hashpartitioning" not in cplan


def test_k17_kernel_hand_computed(spark):
    # "aaaabbbb": L=8, W=1, tot=780; blocks 97*4 then 98*4 — bit b set
    # iff bsum*8 > 780, so exactly the four 98-blocks: phash 0b00001111
    from pyspark.sql import functions as F

    from csv_to_parquet_aws_datalake_spark.operators.staged_r10 import (
        phash_codes,
    )

    df = (spark.createDataFrame([(1, "aaaabbbb"), (2, "bbbbaaaa")],
                                "doc_id long, text string")
          .select("doc_id", F.encode("text", "utf-8").alias("payload")))
    got = {r["doc_id"]: r["phash"] for r in phash_codes(df).collect()}
    assert got == {1: 0b00001111, 2: 0b11110000}


def test_k17_matches_oracle_on_multibyte_text(spark, sf_dir):
    # r13: the oracle went byte-true (hex(encode) extraction via
    # _hx_byte, replacing the ord(substr) code-point shortcut whose
    # ASCII-only validity the retired test_k17_corpus_is_ascii pinned) —
    # prove kernel/oracle parity directly on the multibyte variant the
    # registered k-family sweeps use, BEFORE k17's named r16
    # registration makes the differential suite do it per-run
    from tests.test_differential import _unicode_docs_dir

    d = _unicode_docs_dir(sf_dir)
    fn, sql = STAGED["k17_phash_band_neardup"]
    con = make_oracle_con(d)
    try:
        compare(fn(spark, d), con, sql)
    finally:
        con.close()
