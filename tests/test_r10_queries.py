"""Round-10 registrations and fixes.

e19_funnel_census graduated from the r9 staging module (VERDICT r9 item
3: the one candidate judged worth a permanent freshness slot).  Its
oracle-differential runs with every registered query in
test_differential.py; here live the INDEPENDENT pins that came with it —
the third (pure-Python) formulation, the plan shape, and the
empty-funnel nullif edge ADVICE r9c flagged.
"""

from __future__ import annotations

import datetime as dt

from csv_to_parquet_aws_datalake_spark import registry
from csv_to_parquet_aws_datalake_spark.operators.windows import funnel_census
from csv_to_parquet_aws_datalake_spark.plans.checks import physical_plan

registry.load_all()


def test_e19_funnel_matches_pure_python(spark, sf_dir):
    # third formulation (after the Spark fold and the oracle's min-join
    # chain): a pure-Python greedy subsequence scan over the raw events
    row = registry.QUERIES["e19_funnel_census"](spark, sf_dir).collect()[0]
    ev = (spark.read.parquet(f"{sf_dir}/events.parquet")
          .select("user_id", "ts", "event_id", "event_type").collect())
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"]))
    reached = [0, 0, 0]
    for evs in by_user.values():
        stage, last = 0, None
        for ts, _, et in sorted(evs):
            if stage == 0 and et == "view":
                stage, last = 1, ts
            elif stage == 1 and et == "click" and ts > last:
                stage, last = 2, ts
            elif stage == 2 and et == "purchase" and ts > last:
                stage, last = 3, ts
        for s in range(1, stage + 1):
            reached[s - 1] += 1
    assert row["users_total"] == len(by_user)
    assert (row["reached_view"], row["reached_click"],
            row["reached_purchase"]) == tuple(reached)
    # monotone by construction; at ~50 events/user this corpus converts
    # nearly everyone, so equality between stages is expected — the
    # strict-order machinery is proven by the three-way formulation
    # equality above, not by stage attrition
    assert row["reached_view"] >= row["reached_click"] \
        >= row["reached_purchase"] > 0


def test_e19_single_user_shuffle(spark, sf_dir):
    # ONE user-keyed exchange (collect_list agg); the census rollup is a
    # single-partition agg of user-count rows, not a second wide shuffle
    plan = physical_plan(registry.QUERIES["e19_funnel_census"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_e19_empty_funnel_yields_null(spark):
    # ADVICE r9c: with zero view events the ratio divisor is 0 — the
    # nullif guard must yield NULL (under ANSI a bare division would
    # raise DIVIDE_BY_ZERO), matching the oracle's nullif
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 10, "click"), (1, t0 + dt.timedelta(minutes=1), 11,
             "purchase"), (2, t0, 20, "click")]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    row = funnel_census(ev).collect()[0]
    assert row["users_total"] == 2
    assert row["reached_view"] == 0
    assert row["reached_click"] == 0
    assert row["reached_purchase"] == 0
    assert row["view_to_purchase"] is None


def test_e19_null_users_excluded(spark):
    # ADVICE r10a: anonymous (NULL-user) events must not form a phantom
    # funnel user — groupBy keeps a NULL group, count(DISTINCT) doesn't,
    # so both engines now filter them up front; this pins the Spark side
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (None, t0, 1, "view"),
        (None, t0 + dt.timedelta(minutes=1), 2, "click"),
        (None, t0 + dt.timedelta(minutes=2), 3, "purchase"),
        (7, t0, 10, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    row = funnel_census(ev).collect()[0]
    assert (row["users_total"], row["reached_view"], row["reached_click"],
            row["reached_purchase"]) == (1, 1, 0, 0)


def test_e19_all_anonymous_yields_zeros(spark):
    # r11 review: with EVERY user_id NULL the per-user frame is empty and
    # a bare global sum would be NULL while the oracle's count(*) over
    # empty CTEs is 0 — the coalesce must pin all three counts to 0
    t0 = dt.datetime(2024, 1, 1)
    rows = [(None, t0, 1, "view"), (None, t0 + dt.timedelta(minutes=1),
             2, "click")]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    row = funnel_census(ev).collect()[0]
    assert (row["users_total"], row["reached_view"], row["reached_click"],
            row["reached_purchase"]) == (0, 0, 0, 0)
    assert row["view_to_purchase"] is None


def test_e19_strict_order_and_ties(spark):
    # the state machine's strict ts increase: a click AT the view's
    # timestamp must not advance the funnel; a later full chain does
    t0 = dt.datetime(2024, 1, 1)

    def u(uid, *evs):
        return [(uid, t0 + dt.timedelta(minutes=m), uid * 100 + i, et)
                for i, (m, et) in enumerate(evs)]

    rows = (
        u(1, (0, "view"), (0, "click"), (1, "purchase"))   # tie: stops at view
        + u(2, (0, "view"), (1, "click"), (2, "purchase"))  # full chain
        + u(3, (0, "purchase"), (1, "view"), (2, "click"))  # wrong order
    )
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string")
    row = funnel_census(ev).collect()[0]
    assert (row["users_total"], row["reached_view"], row["reached_click"],
            row["reached_purchase"]) == (3, 3, 2, 1)
