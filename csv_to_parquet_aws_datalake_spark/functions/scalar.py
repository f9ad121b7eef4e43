"""Scalar double-column contracts shared across operator families.

The r14 non-finite probe series established ONE treatment for NaN/±Inf
in measure columns, everywhere a query's engines cannot express each
other's native semantics: a non-finite measure is MISSING (SQL NULL).
The probes that forced it: DuckDB's stddev/corr hard-error on Inf and
its DECIMAL/BIGINT casts hard-error on NaN (the oracle cannot even run
leniently), while Spark's legacy casts silently null NaN and the Arrow
boundary in pandas UDFs conflates NaN with NULL — so "missing" is the
only semantics BOTH engines already agree on for the finite-input case
and can be made explicit for the rest.  The SQL twin of
:func:`finite_or_null` is ``CASE WHEN isfinite(x) THEN x END``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite_or_null(col) -> Column:
    """``col`` where finite, else NULL (NaN, +Inf, -Inf, NULL -> NULL).

    An exact predicate (isnan / |x| = Inf), the same form as
    ``valid_embeddings``'s element sweep — no float-threshold
    sensitivity.  NULL input stays NULL: ``isnan`` is null-intolerant
    (returns false) and the ``when`` condition goes UNKNOWN, so the
    otherwise-branch (NULL) applies.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) != _INF), c)
