"""Spark-vs-DuckDB differential comparison, mirroring the driver's t2 check:
row count + sorted-by-name schema + order-insensitive value comparison.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from csv_to_parquet_aws_datalake_spark.loader import TABLES


def make_oracle_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # our queries round explicitly; this guards only repr noise
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", int(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if v is None:
        return ("n",)
    return ("s", str(v))


def compare(spark_df, con, sql: str) -> None:
    """Raise AssertionError with a diff summary on any mismatch."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"schema: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}"

    s_ix = [s_cols.index(c) for c in sorted(s_cols)]
    d_ix = [d_cols.index(c) for c in sorted(d_cols)]
    s_set = sorted(tuple(_norm(r[i]) for i in s_ix) for r in s_rows)
    d_set = sorted(tuple(_norm(r[i]) for i in d_ix) for r in d_rows)
    if s_set != d_set:
        diffs = [(a, b) for a, b in zip(s_set, d_set) if a != b][:5]
        raise AssertionError(f"values differ; first diffs (spark, duckdb): {diffs}")
