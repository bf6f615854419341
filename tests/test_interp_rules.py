"""Closed-form tests for q196 (percentile_cont-style interpolated
quantiles) and q197 (directional association rules)."""

from __future__ import annotations

import pytest

from e_commerce_lakehouse_spark.operators.basket import association_rules
from e_commerce_lakehouse_spark.operators.curation import interpolated_quantiles


def test_interpolated_quantiles_exact_midpoints(spark):
    # values 10,20,30,40: q=0.5 -> pos 2.5 -> (20+30)/2 = 25;
    # q=0.25 -> pos 1.75 -> 10 + 10*0.75 = 17.5; q=1.0 -> 40.
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "doc_id long, v long"
    )
    out = {
        r.quantile: r
        for r in interpolated_quantiles(
            df, value_col="v", qs=(0.25, 0.5, 1.0)
        ).collect()
    }
    assert out[0.5].value == 25.0
    assert out[0.5].lo_rank == 2 and out[0.5].hi_rank == 3
    assert out[0.25].value == 17.5
    assert out[1.0].value == 40.0
    assert out[1.0].lo_rank == out[1.0].hi_rank == 4


def test_interpolated_quantiles_single_row_and_validation(spark):
    df = spark.createDataFrame([(1, 7)], "doc_id long, v long")
    out = interpolated_quantiles(df, value_col="v", qs=(0.5,)).collect()
    assert out[0].value == 7.0
    with pytest.raises(ValueError):
        interpolated_quantiles(df, value_col="v", qs=(1.5,))
    fdf = spark.createDataFrame([(1, 1.0)], "doc_id long, v double")
    with pytest.raises(TypeError):
        interpolated_quantiles(fdf, value_col="v", qs=(0.5,))


def test_association_rules_directional_confidence(spark):
    # baskets: {A,B} x3, {A} x2, {B} x0 extra, plus {A,C},{B,C} for a
    # second item pair under support.
    rows = []
    for k in range(3):
        rows += [(k, "A"), (k, "B")]
    rows += [(10, "A"), (11, "A")]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, min_confidence_ppm=0,
            min_item_support=2, min_pair_support=2,
        ).collect()
    }
    # support A=5, B=3, both=3: conf(A->B)=3/5=600000ppm, conf(B->A)=1.0
    assert out[("A", "B")].confidence_ppm == 600_000
    assert out[("B", "A")].confidence_ppm == 1_000_000
    assert out[("A", "B")].support_ante == 5
    assert out[("B", "A")].support_ante == 3
    assert out[("A", "B")].n_both == 3


def test_association_rules_threshold_drops_weak_direction(spark):
    rows = []
    for k in range(2):
        rows += [(k, "A"), (k, "B")]
    rows += [(i + 10, "A") for i in range(8)]  # A alone x8 -> conf A->B = 0.2
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey string")
    out = {
        (r.antecedent, r.consequent)
        for r in association_rules(
            df, min_confidence_ppm=500_000,
            min_item_support=2, min_pair_support=2,
        ).collect()
    }
    assert ("B", "A") in out  # conf 1.0
    assert ("A", "B") not in out  # conf 0.2 < 0.5


def test_variant_shred_null_on_malformed(spark):
    """q202 semantics: malformed JSON, missing key, wrong type, and NULL
    props all extract as NULL (counted in n_events, not n_with_k)."""
    import e_commerce_lakehouse_spark.queries as Q
    import os, tempfile

    rows = [
        (1, "a", '{"k": 10}'),
        (2, "a", '{"k": 32}'),
        (3, "a", "not json at all"),
        (4, "a", '{"other": 1}'),
        (5, "a", None),
        (6, "b", '{"k": 7}'),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, props string"
    )
    d = tempfile.mkdtemp(prefix="q202_")
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {r.event_type: r for r in Q.ALL["q202_variant_shred"](spark, d).collect()}
    assert out["a"].n_events == 5 and out["a"].n_with_k == 2
    assert out["a"].sum_k == 42 and out["a"].avg_k == 21.0
    assert out["b"].n_with_k == 1 and out["b"].avg_k == 7.0
