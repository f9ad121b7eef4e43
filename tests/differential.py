"""Spark-vs-DuckDB differential comparison, mirroring the driver's t2 check:
row count + sorted-by-name schema + order-insensitive value comparison.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from csv_to_parquet_aws_datalake_spark.loader import TABLES


def round6_half_up(x: float) -> float:
    # the ONE reference implementation of the engines' shared round(x, 6)
    # contract (Spark's F.round and DuckDB's round are both half-up);
    # pure-Python mirrors in test_property.py and test_r11_queries.py
    # import it so the rounding contract cannot silently fork
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-6"),
                                     rounding=ROUND_HALF_UP))


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
            # distinct FIRST element: ("f", 0.5) < ("fnan",) compares
            # str-to-str and stays total — ("f", "nan") would compare
            # 0.5 < "nan" and TypeError whenever a column mixes NaN and
            # non-NaN rows (found by the r14 non-finite probe)
            return ("fnan",)
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


# Driver-hash dtype families, calibrated against CORRECTNESS_r01: the driver
# tolerated int-width (int8 vs int64) and datetime-resolution (ns vs us)
# differences but FAILED on DuckDB HUGEINT (pandas float64/Decimal) vs Spark
# BIGINT.  DATE and DECIMAL render differently across the two engines' pandas
# conversions (object-vs-datetime64, object-vs-float64), so outputs must not
# contain them at all — cast to TIMESTAMP / DOUBLE / BIGINT at the very end.
_BANNED = ("hugeint", "decimal", "date")


def _duck_family(t: str) -> str:
    t = t.upper()
    if t == "HUGEINT" or t == "UHUGEINT":
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t == "DATE":
        return "date"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("TIMESTAMP"):
        return "datetime"
    if t == "BOOLEAN":
        return "bool"
    return "object"


def _spark_family(dt) -> str:
    name = dt.typeName()
    if name == "decimal":
        return "decimal"
    if name == "date":
        return "date"
    if name in ("byte", "short", "integer", "long"):
        return "int"
    if name in ("float", "double"):
        return "float"
    if name.startswith("timestamp"):
        return "datetime"
    if name == "boolean":
        return "bool"
    return "object"


def check_dtypes(spark_df, con, sql: str) -> None:
    """Assert Spark and DuckDB output types land in the same pandas-level
    family (plan-only: DESCRIBE + df.schema, no query execution)."""
    d_types = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    s_types = {f.name: f.dataType for f in spark_df.schema.fields}
    for c in sorted(s_types):
        if c not in d_types:
            continue  # name mismatch is reported by compare()
        sf, df_ = _spark_family(s_types[c]), _duck_family(d_types[c])
        assert sf not in _BANNED, \
            f"dtype[{c}]: spark outputs {sf} — cast to timestamp/double/bigint"
        assert df_ not in _BANNED, \
            f"dtype[{c}]: oracle outputs {d_types[c]} — CAST it (BIGINT/TIMESTAMP/DOUBLE)"
        assert sf == df_, \
            f"dtype[{c}]: spark={s_types[c].simpleString()}({sf}) " \
            f"duckdb={d_types[c]}({df_}) — driver hash will diverge"


def compare(spark_df, con, sql: str, s_rows=None) -> None:
    """Raise AssertionError with a diff summary on any mismatch.

    ``s_rows`` lets a caller that already collected the DataFrame (to
    memoize results for its mechanism pins — the r16 suite-time audit)
    hand the rows in instead of paying a second full execution; dtype
    and schema checks still run against the DataFrame itself."""
    check_dtypes(spark_df, con, sql)
    s_cols = list(spark_df.columns)
    if s_rows is None:
        s_rows = spark_df.collect()
    s_rows = [tuple(r) for r in s_rows]
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
