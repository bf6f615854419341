"""Round-5 batch-2 additions: market-basket pairs, gaps-and-islands
streaks, time-weighted averages, largest-remainder proration, token
entropy, Markov transitions. Hand-built frames pin the semantics; the
sf0.01 oracle gate (q124-q129) covers testdata scale."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.allocate import (
    prorate_largest_remainder,
)
from e_commerce_lakehouse_spark.operators.basket import copurchase_pairs
from e_commerce_lakehouse_spark.operators.eventops import (
    activity_streaks,
    event_transitions,
    time_weighted_avg,
)
from e_commerce_lakehouse_spark.operators.text import token_entropy


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------- basket

def test_copurchase_counts_support_prune_and_lift(spark):
    rows = [
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11),
        (3, 10), (3, 11),
        (4, 12),            # 12 appears in 2 baskets (1 and 4)
        (5, 99),            # 99 is infrequent (support 1) -> pruned
        (1, 10),            # duplicate line must not double-count
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {
        (r.item_a, r.item_b): r
        for r in copurchase_pairs(
            df, min_item_support=2, min_pair_support=2
        ).collect()
    }
    # (10, 11) co-occur in baskets 1,2,3; (10,12)/(11,12) only once -> cut
    assert set(out) == {(10, 11)}
    r = out[(10, 11)]
    assert r.n_baskets == 3 and r.support_a == 3 and r.support_b == 3
    # lift = 3 * 5 / (3 * 3); total baskets = 5
    assert r.lift == round(3 * 5 / 9, 6)


def test_copurchase_mega_basket_dropped(spark):
    rows = [(1, i) for i in range(5)] + [(2, 0), (2, 1), (3, 0), (3, 1)]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = copurchase_pairs(
        df, min_item_support=2, min_pair_support=2, max_basket_items=4
    ).collect()
    # basket 1 (5 items) is dropped; pair (0,1) survives via baskets 2,3
    assert {(r.item_a, r.item_b, r.n_baskets) for r in out} == {(0, 1, 2)}


# --------------------------------------------------------------- streaks

def test_activity_streaks_islands_and_tiebreak(spark):
    rows = (
        # key 1: days 1-3 (streak 3), day 5 (streak 1) -> longest 3 @ d1
        [(1, _ts(d)) for d in (1, 2, 3, 5)]
        # key 2: two length-2 streaks -> earliest start wins the tie
        + [(2, _ts(d)) for d in (10, 11, 20, 21)]
        # duplicate same-day activity collapses
        + [(1, _ts(2, hour=9))]
    )
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate timestamp")
    out = {r.key: r for r in
           activity_streaks(df, "o_custkey", "o_orderdate").collect()}
    assert out[1].active_days == 4
    assert out[1].n_streaks == 2
    assert out[1].longest_streak == 3
    assert out[1].longest_start == dt.date(2024, 1, 1)
    assert out[2].longest_streak == 2
    assert out[2].longest_start == dt.date(2024, 1, 10)


# ------------------------------------------------------------------ twap

def test_time_weighted_avg_step_semantics(spark):
    # value 10 held 60 s, value 20 held 180 s, last obs contributes 0
    rows = [
        (1, _ts(1, 0, 0), 100, 10.0),
        (1, _ts(1, 0, 1), 101, 20.0),
        (1, _ts(1, 0, 4), 102, 99.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = time_weighted_avg(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_obs == 2
    assert r.held_us == 240_000_000
    assert r.twa == round((10.0 * 60 + 20.0 * 180) / 240, 6)


def test_time_weighted_avg_single_obs_key_excluded(spark):
    df = spark.createDataFrame(
        [(1, _ts(1), 100, 5.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    assert time_weighted_avg(df).count() == 0


# ------------------------------------------------------------- proration

def test_prorate_sums_exactly_and_orders_remainders(spark):
    # total 100 cents over weights 1,1,1 -> 34,33,33 with the extra cent
    # on the smallest linenumber (equal remainders -> line tiebreak)
    rows = [(1, i, 0.01, 100) for i in (1, 2, 3)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_extendedprice double,"
        " total_c long"
    )
    out = {r.l_linenumber: r.alloc_c
           for r in prorate_largest_remainder(df).collect()}
    assert out == {1: 34, 2: 33, 3: 33}


def test_prorate_zero_weight_line_and_exact_reconciliation(spark):
    rows = [
        (7, 1, 19.99, 7777),
        (7, 2, 0.00, 7777),   # zero weight -> 0 cents, still a row
        (7, 3, 35.01, 7777),
        (8, 1, 1.00, 101),
    ]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_extendedprice double,"
        " total_c long"
    )
    out = prorate_largest_remainder(df)
    per_order = {
        r.l_orderkey: r.s
        for r in out.groupBy("l_orderkey")
        .agg(F.sum("alloc_c").alias("s"))
        .collect()
    }
    assert per_order == {7: 7777, 8: 101}
    zero = out.where(
        (F.col("l_orderkey") == 7) & (F.col("l_linenumber") == 2)
    ).collect()[0]
    assert zero.alloc_c == 0


def test_prorate_rejects_negative_weights_rows(spark):
    rows = [(1, 1, -5.0, 100), (1, 2, 10.0, 100)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber int, l_extendedprice double,"
        " total_c long"
    )
    out = prorate_largest_remainder(df).collect()
    assert [(r.l_linenumber, r.alloc_c) for r in out] == [(2, 100)]


# -------------------------------------------------------------- entropy

def test_token_entropy_uniform_and_degenerate(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # uniform over 4 -> ln 4
            (2, "x x x x"),        # single symbol -> 0
            (3, "  "),             # tokenless -> excluded
            (4, None),             # NULL text -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in token_entropy(df).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_tokens == 4 and out[1].n_distinct == 4
    assert out[1].entropy == round(math.log(4), 6)
    assert out[2].entropy == 0.0


def test_token_entropy_case_folds(spark):
    df = spark.createDataFrame([(1, "The the THE tHe")], "doc_id long, text string")
    r = token_entropy(df).collect()[0]
    assert r.n_distinct == 1 and r.entropy == 0.0


# ----------------------------------------------------------- transitions

def test_event_transitions_probs_and_null_state(spark):
    rows = [
        (1, _ts(1, 0, 0), 1, "view"),
        (1, _ts(1, 0, 1), 2, "cart"),
        (1, _ts(1, 0, 2), 3, "view"),
        (1, _ts(1, 0, 3), 4, None),    # NULL is a real next-state
        (2, _ts(1, 0, 0), 5, "view"),
        (2, _ts(1, 0, 1), 6, "cart"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {(r.prev_state, r.next_state): r for r in event_transitions(df).collect()}
    assert out[("view", "cart")].n_transitions == 2
    assert out[("view", "cart")].prob == round(2 / 3, 6)
    assert out[("cart", "view")].n_transitions == 1
    assert ("view", None) in out
    assert out[("view", None)].prob == round(1 / 3, 6)
