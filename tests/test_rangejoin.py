"""Bucketized interval join (operators/rangejoin.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.rangejoin import interval_join


def _points(spark, n=500):
    return spark.range(0, n).select(F.col("id").alias("pid"),
                                    (F.col("id") * 3 % 997).alias("p"))


def _intervals(spark, n=60):
    return spark.range(0, n).select(
        F.col("id").alias("iid"),
        (F.col("id") * 17 % 900).alias("s"),
        (F.col("id") * 17 % 900 + (F.col("id") % 5) * 13).alias("e"),
    )


def test_matches_naive_theta_join_exactly_once(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got = interval_join(pts, ivs, "p", "s", "e", bucket_width=10) \
        .select("pid", "iid")
    naive = pts.crossJoin(ivs).where(
        (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("e"))
    ).select("pid", "iid")
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0
    # exactly once: no pair duplicated even for intervals spanning many buckets
    assert got.count() == got.distinct().count()


def test_inclusive_bounds_and_width_sensitivity(spark):
    pts = spark.createDataFrame([(1, 10), (2, 20), (3, 15)], "pid int, p int")
    ivs = spark.createDataFrame([(9, 10, 20)], "iid int, s int, e int")
    for w in (1, 3, 7, 100):  # answer must be width-independent
        rows = sorted(r["pid"] for r in
                      interval_join(pts, ivs, "p", "s", "e", w).collect())
        assert rows == [1, 2, 3], (w, rows)


def test_plan_is_equi_join_not_nested_loop(spark):
    pts, ivs = _points(spark, 5_000), _intervals(spark, 500)
    plan = interval_join(pts, ivs, "p", "s", "e", 10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_rejects_nonpositive_width(spark):
    with pytest.raises(ValueError, match="positive"):
        interval_join(_points(spark), _intervals(spark), "p", "s", "e", 0)
