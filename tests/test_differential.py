"""The primary gate: every registered query with an oracle must value-match
DuckDB at the test scale factor (driver runs the same check at sf0.01)."""

from __future__ import annotations

import pytest

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.plans.checks import assert_no_antipatterns
from tests.differential import compare

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    df = registry.QUERIES[name](spark, sf_dir)
    assert_no_antipatterns(name, df)
    sql = registry.ORACLES.get(name)
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    compare(df, oracle, sql)
