"""Round-16-era staged candidates (operators/staged_r16.py):
oracle-differential through the driver's comparator, plan pins, and
independent references — the staged_r10/r15 test discipline for the
bank's named moves.  The original bank's j11 TTL dedup registered on
schedule in r16, i67 RRF fusion was pulled forward to r16, j12
streaming near-dup ingest registered on schedule in r17, a19 XML
roundtrip registered on schedule in r18, j13 stream outer join
registered on schedule in r19, and k18 audio silence segmentation
registered (plus h26 VARIANT extraction pulled forward) in r20 — their
pins graduated to
tests/test_r16_queries.py / test_r17_queries.py / test_r18_queries.py
/ test_r19_queries.py / test_r20_queries.py."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.staged_r16 import STAGED
from csv_to_parquet_aws_datalake_spark.plans.checks import (
    assert_no_antipatterns,
    physical_plan,
)
from tests.differential import compare, make_oracle_con

registry.load_all()


def test_staged_r16_not_registered():
    assert not set(STAGED) & set(registry.QUERIES)


#: (name, sf_dir) -> collected rows, populated by the oracle test so
#: the mechanism-pin tests below reuse results instead of re-executing
#: the full query (several staged rows are streaming drains — the r16
#: suite-time audit found each pin paying a second drain for rows the
#: oracle test had already collected and discarded).  Pins fall back
#: to executing when the memo is cold (e.g. under -k selection).
_ROWS_MEMO: dict[tuple[str, str], list] = {}

#: (name, sf_dir) -> the returned DataFrame itself, for pins that read
#: frame-attached test surfaces (none in the current bank; the
#: mechanism stays for future candidates — j13's pre-filter surface
#: used it until its r19 graduation)
_DF_MEMO: dict[tuple[str, str], object] = {}


def _staged_rows(name: str, spark, sf_dir: str) -> list:
    key = (name, sf_dir)
    if key not in _ROWS_MEMO:
        df = STAGED[name][0](spark, sf_dir)
        _DF_MEMO[key] = df
        _ROWS_MEMO[key] = df.collect()
    return _ROWS_MEMO[key]


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_r16_matches_oracle(name, spark, oracle, sf_dir):
    fn, sql = STAGED[name]
    df = fn(spark, sf_dir)
    assert_no_antipatterns(name, df)
    assert sql is not None
    rows = df.collect()
    _DF_MEMO[(name, sf_dir)] = df
    _ROWS_MEMO[(name, sf_dir)] = rows
    compare(df, oracle, sql, s_rows=rows)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_r16_tri_sf_parity(name, spark):
    fn, sql = STAGED[name]
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        con = make_oracle_con(sf_dir)
        try:
            compare(fn(spark, sf_dir), con, sql)
        finally:
            con.close()


def test_h27_collation_actually_merges(spark, sf_dir):
    # non-vacuity: every collated group must have absorbed BOTH binary
    # spellings (the fixture's even/odd split guarantees each type has
    # upper and lower rows), the representative is the uppercase binary
    # min, and the upper-cased share is strictly inside (0, n)
    rows = _staged_rows("h27_collated_grouping", spark, sf_dir)
    assert rows
    for r in rows:
        assert r["n_variants"] == 2, r
        assert r["k"] == r["k"].upper(), r
        assert 0 < r["n_ucase"] < r["n"], r


