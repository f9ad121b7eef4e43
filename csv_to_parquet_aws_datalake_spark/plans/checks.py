"""Physical-plan assertions — the 100 TB design is enforced here, not just
described: tests fail if a filter stops pushing down, a dimension join
stops broadcasting, or a top-k degenerates into a global sort.

AQE caveat: before execution, ``physical_plan`` shows the INITIAL adaptive
plan (``isFinalPlan=false``) — static properties (PushedFilters,
ReadSchema, pinned broadcast hints) are valid there, but anything AQE can
rewrite at runtime (join strategy switches, coalesced reads, codegen
spans) is only trustworthy on the FINAL plan.  ``assert_in_final_plan``
executes the DataFrame first and asserts on what actually ran.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, *, executed: bool = False) -> str:
    if executed:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    """Assert against the static (pre-execution) plan; use only for
    properties AQE cannot change (pushdown, read schema, hints)."""
    plan = physical_plan(df)
    for n in needles:
        if n not in plan:
            raise AssertionError(f"expected {n!r} in physical plan:\n{plan}")


def assert_in_final_plan(df: DataFrame, *needles: str) -> None:
    """Execute, then assert against the finalized adaptive plan."""
    plan = physical_plan(df, executed=True)
    for n in needles:
        if n not in plan:
            raise AssertionError(f"expected {n!r} in FINAL plan:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for n in needles:
        if n in plan:
            raise AssertionError(f"did not expect {n!r} in physical plan:\n{plan}")


# Scale anti-patterns linted on EVERY oracle-paired query (wired into
# tests/test_differential.py, so the check is free — the DataFrame is
# already constructed there).  Queries whose CONTRACT is the anti-pattern
# opt out explicitly.
ANTIPATTERN_ALLOW: dict[str, set[str]] = {
    "c06_cross": {"cartesian"},                     # the cross-join row itself
    "i06_pairwise_sim_threshold": {"cartesian"},    # documented O(n^2) baseline
    "c08_range_theta": {"cartesian"},               # theta join, BNLJ/cartesian
    "k01_python_udf": {"python_row_udf"},           # the row-at-a-time contract row
    "k05_python_udtf": {"python_row_udf"},          # UDTFs evaluate row-at-a-time
}


def unpartitioned_window_nodes(df: DataFrame) -> list[str]:
    """Window nodes in the OPTIMIZED LOGICAL plan whose partitionSpec is
    EMPTY — the authoritative form of the global-window test (ADVICE r7):
    instead of re-parsing the plan STRING (where an expression that
    itself prints ``], [`` — e.g. two constant-folded array literals as
    adjacent arguments — can mis-bracket the splitter in
    ``unpartitioned_window_lines``), walk the plan tree and ask each
    logical Window for its partition spec directly.  One logical Window
    covers every physical incarnation (WindowExec, WindowGroupLimit
    pushdowns, and the pandas GROUPED_AGG forms ArrowWindowPython /
    WindowInPandas — those are physical choices made AFTER this node).
    Foldable partition keys (``partitionBy(lit(0))``) are removed by the
    optimizer before this plan, so they are correctly reported as
    unpartitioned, matching the physical-string linter's semantics.
    Subquery expressions carry their own plan trees; they are walked too.
    """
    out: list[str] = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().isEmpty()):
            out.append(node.simpleString(25))
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        subq = node.subqueries()  # plans inside scalar/EXISTS/IN subqueries
        for i in range(subq.size()):
            stack.append(subq.apply(i))
    return out


def unpartitioned_window_lines(plan: str) -> list[str]:
    """Plan lines whose Window node has an EMPTY partition spec — the
    single-task global windows Spark warns about with "No Partition
    Defined".  A physical Window prints ``Window [exprs], [part], [order]``
    when fully specified, ``Window [exprs], [part]`` with no ordering,
    ``Window [exprs], [order]`` when unpartitioned, and bare
    ``Window [exprs]`` when neither (e.g. a whole-table frame via
    ``partitionBy()`` with no keys).  The one-separator forms are told
    apart by the trailing group: only an ORDER spec carries sort
    directions (SortOrder always prints ASC/DESC); the zero-separator
    form is always unpartitioned.  (A ``partitionBy(lit(0))`` does NOT
    escape this: Catalyst constant-folds foldable partition expressions
    away, verified empirically on 4.1.)  A GROUPED_AGG pandas UDF over a
    window prints the same grammar and serializes the same way —
    ``ArrowWindowPython`` on Spark 4.1, ``WindowInPandas`` on earlier
    lines — matched too (review r7 finding: a substring test on
    "Window [" alone let it escape).

    Known limit (ADVICE r7): the ``], [`` bracket-splitting can
    mis-bracket when a window EXPRESSION itself prints that separator
    (two constant-folded array literals as adjacent arguments).  Kept as
    the plan-TEXT heuristic for audits that only hold a string; the
    enforcement path (``assert_no_antipatterns``) uses the logical-tree
    walk in ``unpartitioned_window_nodes`` instead."""
    out = []
    for line in plan.splitlines():
        for node in ("ArrowWindowPython [", "WindowInPandas [", "Window ["):
            if node in line:
                groups = line.split(node, 1)[1].split("], [")
                if len(groups) == 1 or (
                        len(groups) == 2
                        and (" ASC" in groups[1] or " DESC" in groups[1])):
                    out.append(line.strip())
                break  # WindowInPandas lines must not re-match "Window ["
    return out


def assert_no_antipatterns(name: str, df: DataFrame) -> None:
    """Fail if a query's physical plan contains a scale anti-pattern it has
    not explicitly opted into: an unbroadcast cartesian product,
    row-at-a-time Python evaluation (pickled round trips) where an
    Arrow-vectorized form exists, or a global (unpartitioned) window —
    the single-task total-order shape that serializes a table-sized input
    at 100 TB (global row numbers come from
    operators.windows.global_row_number instead).  The window test reads
    the logical plan's partitionSpec (r9), not the plan string."""
    plan = physical_plan(df)
    allowed = ANTIPATTERN_ALLOW.get(name, set())
    if "CartesianProduct" in plan and "cartesian" not in allowed:
        raise AssertionError(
            f"{name}: CartesianProduct in plan — broadcast or re-key the join")
    if "BatchEvalPython" in plan and "python_row_udf" not in allowed:
        raise AssertionError(
            f"{name}: row-at-a-time Python UDF in plan — use a pandas/Arrow form")
    if "global_window" not in allowed:
        bad = unpartitioned_window_nodes(df)
        if bad:
            raise AssertionError(
                f"{name}: unpartitioned Window in plan (single-task global "
                f"order — use global_row_number or a bounded theta-join):\n"
                + "\n".join(bad))
