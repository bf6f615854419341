"""Closed-form tests for q193-q195: k-core peeling, leave-one-out
target encoding, and the equi-depth drift audit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.graph import kcore
from e_commerce_lakehouse_spark.operators.stats import (
    equidepth_drift,
    target_encode_loo,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_kcore_triangle_plus_tail(spark):
    # triangle 1-2-3 plus a pendant 4: 2-core = the triangle (each
    # degree 2); node 4 (degree 1) peels, and its removal does not
    # lower any triangle degree.
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    out = {r.node: r.degree for r in kcore(e, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_peel(spark):
    # path 1-2-3-4-5: 2-core empty, but only after CASCADING peels
    # (ends first, then the middle unravels) — needs >1 round.
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert kcore(e, k=2, rounds=6).count() == 0
    # k=1 keeps everything with degree >= 1
    assert kcore(e, k=1, rounds=2).count() == 5


def test_kcore_k3_clique(spark):
    # K4 minus one edge: nodes have degrees 3,3,2,2 -> 3-core empty
    # (peeling the 2s drops the 3s); full K4 survives at k=3.
    near = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)])
    assert kcore(near, k=3, rounds=6).count() == 0
    k4 = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    out = {r.node: r.degree for r in kcore(k4, k=3, rounds=6).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_validates_args(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore(e, k=0)
    with pytest.raises(ValueError):
        kcore(e, k=2, rounds=0)


def test_target_encode_loo_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 6.0), (4, "b", 5.0)],
        "event_id long, event_type string, value double",
    )
    out = {
        r.event_id: r.loo_enc
        for r in target_encode_loo(
            df, key_col="event_type", value_col="value", id_col="event_id"
        ).collect()
    }
    assert out[1] == 4.0  # (2+6)/2
    assert out[2] == 3.5  # (1+6)/2
    assert out[3] == 1.5  # (1+2)/2
    assert out[4] is None  # singleton category: no leakage-safe value


def test_target_encode_loo_truncates_at_micro(spark):
    # (1+1)/3 cents -> 0.666666... -> floored at micro precision
    df = spark.createDataFrame(
        [(1, "a", 0.01), (2, "a", 0.01), (3, "a", 0.01), (4, "a", 0.01)],
        "event_id long, event_type string, value double",
    )
    out = target_encode_loo(
        df, key_col="event_type", value_col="value", id_col="event_id"
    ).collect()
    assert all(r.loo_enc == 0.01 for r in out)


def test_equidepth_drift_shift_detected(spark):
    # ref half (ts 0..99): values 1..100; cur half (ts 100..199):
    # values 101..200 — everything lands in the top bucket.
    rows = [(i, i, float(i + 1)) for i in range(100)]
    rows += [(100 + i, 100 + i, float(101 + i)) for i in range(100)]
    df = spark.createDataFrame(
        rows, "event_id long, sec long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "value",
    )
    out = {
        r.bucket: r
        for r in equidepth_drift(
            df, value_col="value", ts_col="ts", id_col="event_id",
            n_buckets=10,
        ).collect()
    }
    # ref deciles are 10 rows each; the current half is entirely above
    # every boundary -> bucket 9 holds all 100 current rows
    assert out[9].n_cur == 100
    assert out[9].share_cur_ppm == 1_000_000
    for b in range(9):
        assert out[b].n_cur == 0
        assert out[b].n_ref == 10
        assert out[b].share_ref_ppm == 100_000
    assert out[9].abs_diff_ppm == 900_000


def test_equidepth_drift_identical_halves_balanced(spark):
    # same value distribution in both halves -> every bucket's shares
    # match exactly (ppm equal), abs_diff 0
    rows = [(i, i, float(i % 50)) for i in range(50)]
    rows += [(50 + i, 50 + i, float(i % 50)) for i in range(50)]
    df = spark.createDataFrame(
        rows, "event_id long, sec long, value double"
    ).select(
        "event_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        "value",
    )
    out = equidepth_drift(
        df, value_col="value", ts_col="ts", id_col="event_id", n_buckets=5
    ).collect()
    assert sum(r.n_ref for r in out) == 50
    assert sum(r.n_cur for r in out) == 50
    for r in out:
        assert r.abs_diff_ppm == 0


def test_equidepth_drift_validates(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0)], "event_id long, sec long, value double"
    ).select(
        "event_id", F.timestamp_seconds(F.col("sec")).alias("ts"), "value"
    )
    with pytest.raises(ValueError, match="at least 2"):
        equidepth_drift(
            df, value_col="value", ts_col="ts", id_col="event_id"
        )
    with pytest.raises(ValueError, match="n_buckets"):
        equidepth_drift(
            df, value_col="value", ts_col="ts", id_col="event_id",
            n_buckets=1,
        )
