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


# Landing-capacity bounds for :func:`representable_or_null` (r14
# extreme-magnitude probe).  Each names the EXACT capacity constraint of
# a landing type, so the guard is a property of the landing, not a data
# guess:
#  - DECIMAL(18,4) holds |x| <= 99999999999999.9999, so |x| < 1e14;
#  - BIGINT holds |x| <= 9223372036854775807; 9e18 leaves ceil/floor
#    headroom (Spark's ceil CLAMPS an overflowing double to Long.Max
#    while DuckDB's BIGINT cast hard-errors — neither is a value);
#  - second-moment aggregates (stddev/var/corr) square their input, so
#    x*x must stay finite: |x| < sqrt(DBL_MAX) ~ 1.34e154, with 1e150
#    leaving mean-shift headroom (DuckDB hard-errors past it).
DECIMAL18_4_BOUND = 1e14
BIGINT_BOUND = 9e18
MOMENT_BOUND = 1e150


def representable_or_null(col, bound: float) -> Column:
    """``col`` where finite AND |col| < ``bound``, else NULL.

    The landing-capacity form of :func:`finite_or_null`: a value the
    landing type cannot represent is MISSING, the same contract as a
    non-finite one — Spark raises (ANSI casts, decimal sums) or clamps
    (ceil -> Long.Max) where DuckDB hard-errors, so NULL is the only
    semantics both engines can express.  NaN comparisons are false, so
    the single predicate also sweeps non-finite values.  SQL twin:
    ``CASE WHEN isfinite(x) AND abs(x) < bound THEN x END``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) < bound), c)
