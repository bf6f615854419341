"""KMV distinct-count sketch (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.sketch import kmv_distinct_by_group


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 40).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("v")
    )
    out = kmv_distinct_by_group(df, ["g"], "v", k=64).collect()
    assert {(r["g"], r["n_min"], r["est_distinct"]) for r in out} == {
        (0, 20, 20.0), (1, 20, 20.0)
    }


def test_kmv_estimate_within_bounds(spark):
    """k=256 over 10_000 distinct values: standard error ~ 1/sqrt(k-2)
    ≈ 6.3%; assert a generous 4-sigma band (deterministic hash — the
    draw is fixed, this documents the accuracy class)."""
    df = spark.range(0, 10_000).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = kmv_distinct_by_group(df, ["g"], "v", k=256).collect()[0]
    assert row["n_min"] == 256
    assert 7_500 <= row["est_distinct"] <= 12_500


def test_kmv_deterministic_and_duplicate_insensitive(spark):
    base = spark.range(0, 1_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 100).cast("string").alias("v")
    )
    a = {tuple(r) for r in kmv_distinct_by_group(base, ["g"], "v", k=32).collect()}
    # duplicating every row must not change any estimate (set semantics)
    doubled = base.unionAll(base)
    b = {tuple(r) for r in kmv_distinct_by_group(doubled, ["g"], "v", k=32).collect()}
    assert a == b


def test_kmv_rejects_degenerate_k(spark):
    df = spark.range(3).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_distinct_by_group(df, ["g"], "v", k=1)


def test_kmv_nulls_excluded_like_count_distinct(spark):
    """NULL values must not fill k-min slots (review finding: Spark
    ranks a NULL hash FIRST; COUNT(DISTINCT) and the DuckDB oracle
    exclude it)."""
    df = spark.range(0, 30).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("string")).alias("v"),
    )
    row = kmv_distinct_by_group(df, ["g"], "v", k=64).collect()[0]
    assert row["n_min"] == 20  # 20 non-null distinct, NULLs excluded
    assert row["est_distinct"] == 20.0
