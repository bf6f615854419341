"""Semantic unit tests for the exact-statistics family (q138–q145) —
closed-form ground truths the differential fuzz gate can't state:
known Gini values, a planted level shift, a planted outlier, symmetric
A/B arms, and determinism/k-contracts for negative sampling.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.curation import negative_sampling
from e_commerce_lakehouse_spark.operators.eventops import (
    cusum_changepoint,
    recency_decay_scores,
)
from e_commerce_lakehouse_spark.operators.stats import (
    gini_concentration,
    quantile_transform,
    robust_outliers,
    welch_t_stats,
    winsorized_mean,
)

_SCHEMA = "grp string, v double, tb long"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_gini_all_equal_is_zero_and_onehot_is_maximal(spark):
    eq = _df(spark, [("a", 5.0, i) for i in range(10)])
    r = {x["grp"]: x for x in gini_concentration(eq, "grp", "v", "tb").collect()}
    assert r["a"]["gini"] == 0.0
    # one holder of all value: G = (n-1)/n
    hot = _df(spark, [("b", 0.0, i) for i in range(9)] + [("b", 100.0, 9)])
    r = {x["grp"]: x for x in gini_concentration(hot, "grp", "v", "tb").collect()}
    assert r["b"]["gini"] == pytest.approx(0.9, abs=1e-9)
    # zero-sum group: undefined -> NULL
    z = _df(spark, [("c", 0.0, i) for i in range(4)])
    r = gini_concentration(z, "grp", "v", "tb").collect()
    assert r[0]["gini"] is None


def test_winsorized_mean_clamps_planted_outlier(spark):
    rows = [("a", float(v), i) for i, v in enumerate(range(1, 10))]
    rows.append(("a", 1000.0, 99))
    out = winsorized_mean(_df(spark, rows), "grp", "v", "tb", lo=0.1, hi=0.9).collect()
    r = out[0]
    # n=10: k_lo = ceil(1)=1 -> 1.0; k_hi = ceil(9)=9 -> 9.0; the 1000 clamps to 9
    assert r["p_lo"] == 1.0 and r["p_hi"] == 9.0
    assert r["winsorized_mean"] == pytest.approx((sum(range(1, 10)) + 9) / 10, abs=1e-6)
    assert r["raw_mean"] == pytest.approx((sum(range(1, 10)) + 1000) / 10, abs=1e-6)


def test_winsorized_mean_refuses_zero_lo(spark):
    with pytest.raises(ValueError):
        winsorized_mean(_df(spark, [("a", 1.0, 1)]), "grp", "v", "tb", lo=0.0)


def test_quantile_transform_endpoints_and_singleton(spark):
    rows = [("a", float(v), v) for v in range(5)] + [("solo", 7.0, 1)]
    got = {
        (r["grp"], r["tb"]): r["qnorm"]
        for r in quantile_transform(_df(spark, rows), "grp", "v", "tb").collect()
    }
    assert got[("a", 0)] == 0.0 and got[("a", 4)] == 1.0
    assert got[("a", 2)] == 0.5
    assert got[("solo", 1)] == 0.5


def test_robust_outliers_flags_planted_point(spark):
    rows = [("a", float(v), i) for i, v in enumerate([10, 11, 12, 13, 14, 15, 16])]
    rows.append(("a", 500.0, 99))
    r = robust_outliers(_df(spark, rows), "grp", "v", "tb", k=3).collect()[0]
    # n=8 -> median rank ceil(4)=4 -> 13; MAD over |v-13|: [3,2,1,0,1,2,3,487] -> rank4 = 2
    assert r["median"] == 13.0 and r["mad"] == 2.0
    assert r["n_outliers"] == 1  # only the 500 exceeds 3*MAD=6


def test_welch_t_symmetric_arms_is_zero(spark):
    rows = [(i, "x", float(v)) for i, v in enumerate([1, 2, 3, 4])] + [
        (i + 10, "x", float(v)) for i, v in enumerate([1, 2, 3, 4])
    ]
    df = spark.createDataFrame(rows, "uid long, grp string, v double")
    r = welch_t_stats(
        df, "grp", F.col("uid") < 10, F.round(F.col("v") * 100).cast("long")
    ).collect()[0]
    assert r["welch_t"] == 0.0 and r["mean_a"] == r["mean_b"]


def test_welch_t_empty_arm_reports_null(spark):
    df = spark.createDataFrame(
        [(1, "x", 1.0), (3, "x", 2.0)], "uid long, grp string, v double"
    )
    r = welch_t_stats(
        df, "grp", F.col("uid") % 2 == 0, F.round(F.col("v")).cast("long")
    ).collect()[0]
    assert r["n_a"] == 0 and r["mean_a"] is None and r["welch_t"] is None


def test_cusum_finds_planted_level_shift(spark):
    # 10 days at 5/day then 10 days at 50/day -> max |cum deviation| at day 10
    rows = []
    eid = 0
    for d in range(20):
        per = 5 if d < 10 else 50
        for i in range(per):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, 1 + d, 12, 0, 0), 1, "load", 1.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    r = cusum_changepoint(df).collect()[0]
    assert r["change_day"] == dt.date(2024, 3, 10)
    assert r["n_days"] == 20 and r["n_events"] == 550


def test_negative_sampling_contract(spark):
    pos = spark.createDataFrame(
        [(u, i) for u in range(5) for i in (u, u + 1)], "user_id long, item_id long"
    )
    items = spark.createDataFrame([(i,) for i in range(40)], "item_id long")
    a = negative_sampling(pos, items, k=3, n_buckets=4).collect()
    b = negative_sampling(pos, items, k=3, n_buckets=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    per_user = {}
    pos_set = {(u, i) for u in range(5) for i in (u, u + 1)}
    for r in a:
        per_user.setdefault(r["user_id"], []).append(r)
        assert (r["user_id"], r["neg_item"]) not in pos_set
    for u, rs in per_user.items():
        assert len(rs) <= 3 and sorted(r["rnk"] for r in rs) == list(
            range(1, len(rs) + 1)
        )


def test_recency_decay_halves_per_bucket(spark):
    # two events, 0 and 7 days before the anchor, same value: the older
    # one contributes exactly half
    rows = [
        (1, dt.datetime(2024, 2, 1, 0, 0, 0), 1, "view", 10.0, None),
        (2, dt.datetime(2024, 1, 25, 0, 0, 0), 1, "view", 10.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    r = recency_decay_scores(df, anchor="2024-02-01", half_life_days=7,
                             max_age_days=28).collect()[0]
    assert r["n_events"] == 2
    assert r["decay_score"] == pytest.approx(10.0 + 5.0, abs=1e-6)


def test_exact_stratified_split_total_is_exact(spark):
    from e_commerce_lakehouse_spark.operators.curation import (
        exact_stratified_split,
    )

    # stratum sizes chosen so naive per-stratum rounding misses the total:
    # 20% of [7, 13, 9, 11] = [1.4, 2.6, 1.8, 2.2] -> floors [1,2,1,2]=6,
    # exact total = 40*2000//10000 = 8 -> largest remainder adds 2
    rows = []
    did = 0
    for s, n in [("a", 7), ("b", 13), ("c", 9), ("d", 11)]:
        for _ in range(n):
            rows.append((did, "t", "en", s, 1))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = exact_stratified_split(df, strata_col="source", id_col="doc_id",
                                 test_bp=2000).collect()
    assert sum(r["n_test"] for r in out) == 8
    assert all(r["n_test"] + r["n_train"] == r["n_total"] for r in out)
    # remainders: b=.6, d=.2? -> rem*10000: a=4000, b=6000, c=8000, d=2000
    # leftover 2 goes to c (8000) and b (6000)
    got = {r["source"]: r["n_test"] for r in out}
    assert got == {"a": 1, "b": 3, "c": 2, "d": 2}


def test_order_reconciliation_and_duplicate_payments(spark):
    from e_commerce_lakehouse_spark.operators.stats import (
        duplicate_payments,
        order_reconciliation,
    )

    orders = spark.createDataFrame(
        [(1, 100, 30.0, dt.datetime(2024, 1, 1)),   # matches lines exactly
         (2, 100, 50.0, dt.datetime(2024, 1, 3)),   # drifts by 1 cent
         (3, 200, 30.0, dt.datetime(2024, 1, 5)),   # lineless
         (4, 100, 30.0, dt.datetime(2024, 1, 6))],  # dup of order 1 (5 days)
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    lines = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 49.99), (4, 30.0), (9, 7.0)],  # 9 headerless
        "l_orderkey long, l_extendedprice double",
    )
    r = order_reconciliation(orders, lines).collect()[0]
    assert (r["n_orders"], r["n_headerless"], r["n_lineless"]) == (5, 1, 1)
    assert (r["n_matched"], r["n_drifted"]) == (2, 1)
    assert r["max_drift_c"] == 1 and r["total_drift_c"] == 1

    d = duplicate_payments(orders, window_days=7).collect()
    assert [(x["key"], x["id_a"], x["id_b"], x["days_apart"]) for x in d] == [
        (100, 1, 4, 5)
    ]  # same cust, same 30.00, 5 days apart; order 3 is a different customer
