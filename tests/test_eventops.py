"""Event-sequence analytics (operators/eventops): sessionization gap
semantics, strictly-after funnel ordering, retention cohort offsets —
value-level checks on hand-built frames (the sf0.01 value-hash twins
are q95–q97 in the oracle gate)."""

import datetime

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.eventops import (
    funnel,
    retention_cohorts,
    sessionize,
)

_SCHEMA = ("event_id bigint, ts timestamp_ntz, user_id bigint, "
           "event_type string, value double")


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s),
          u, t, v) for i, (s, u, t, v) in enumerate(rows)],
        _SCHEMA,
    )


def test_sessionize_gap_strictly_greater_and_tiebreak(spark):
    # user 1: events at t=0, 1800 (== gap, SAME session), 3601 (> gap
    # from 1800? 3601-1800=1801 > 1800 -> NEW session)
    df = _ev(spark, [
        (0, 1, "view", 1.0),
        (1800, 1, "click", 2.0),
        (3601, 1, "view", 3.0),
        (0, 2, "view", 5.0),
    ])
    got = {(r["user_id"], r["session_idx"]): r
           for r in sessionize(df, gap_seconds=1800).collect()}
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    s11 = got[(1, 1)]
    assert s11["n_events"] == 2 and s11["sum_value"] == 3.0
    assert s11["session_start"] == datetime.datetime(2024, 1, 1)
    assert s11["session_end"] == datetime.datetime(2024, 1, 1, 0, 30)
    assert got[(1, 2)]["n_events"] == 1
    assert got[(2, 1)]["n_event_types"] == 1


def test_sessionize_single_exchange_plan(spark):
    """lag + running-sum windows and the rollup all key on user_id —
    the physical plan carries exactly ONE exchange (plus the final agg's
    reuse of it), never a second repartition of the event stream."""
    df = _ev(spark, [(0, 1, "view", 1.0), (10, 1, "click", 1.0)])
    plan = sessionize(df)._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning on user_id feeds windows AND the aggregate
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_funnel_strictly_after_and_monotone(spark):
    # user 1 completes view->click->purchase in order; user 2 clicks
    # BEFORE viewing (must not convert past stage 1); user 3's click is
    # at the SAME timestamp as the view (strictly-after: not counted)
    df = _ev(spark, [
        (0, 1, "view", 0.0), (5, 1, "click", 0.0), (9, 1, "purchase", 0.0),
        (5, 2, "click", 0.0), (9, 2, "view", 0.0),
        (3, 3, "view", 0.0), (3, 3, "click", 0.0),
    ])
    rows = {r["step"]: r for r in
            funnel(df, ["view", "click", "purchase"]).collect()}
    assert rows["view"]["n_users"] == 3
    assert rows["click"]["n_users"] == 1  # only user 1
    assert rows["purchase"]["n_users"] == 1
    assert rows["view"]["pct_of_first"] == 1.0
    assert rows["click"]["pct_of_first"] == 1 / 3


def test_funnel_earliest_arrival_frontier(spark):
    # earliest-arrival: user views at t=0 and t=100; a click at t=50
    # counts (after the EARLIEST view), even though a later view exists
    df = _ev(spark, [
        (0, 1, "view", 0.0), (100, 1, "view", 0.0), (50, 1, "click", 0.0),
    ])
    rows = {r["step"]: r["n_users"]
            for r in funnel(df, ["view", "click"]).collect()}
    assert rows == {"view": 1, "click": 1}


def test_retention_cohorts_week_offsets(spark):
    day = 86400
    # user 1 first event Tue Jan 2 (cohort week Mon Jan 1), active again
    # 2 weeks later; user 2 only in week 0
    df = _ev(spark, [
        (day, 1, "view", 0.0),
        (day + 14 * day, 1, "view", 0.0),
        (2 * day, 2, "view", 0.0),
    ])
    got = {(r["cohort_week"], r["week_offset"]): r["n_users"]
           for r in retention_cohorts(df).collect()}
    wk = datetime.date(2024, 1, 1)
    assert got == {(wk, 0): 2, (wk, 2): 1}
