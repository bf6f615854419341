"""Bucketed co-located join: plan shape + semantics.

The whole point of writer-side bucketing is the ABSENCE of shuffle
Exchanges in the join plan — assert it, not just the row values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)


@pytest.fixture(scope="module")
def facts(spark):
    left = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("lv")
    )
    right = spark.range(0, 1500).select(
        F.col("id").alias("rk"), (F.col("id") % 5).alias("rv")
    )
    return left, right


def test_bucketed_join_no_shuffle(spark, facts, tmp_path):
    left, right = facts
    j = bucketed_join(
        spark, left, right, "k", "rk", 4,
        names=("t_bj_l", "t_bj_r"), database="t_bucketed",
        location=str(tmp_path / "wh"),
    )
    # the join itself: zero shuffle Exchanges — both scans satisfy the
    # SortMergeJoin's distribution and ordering straight off disk
    assert exchange_count(j) == 0
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    # an aggregate ON the bucket key also rides the bucketing (no
    # exchange); an aggregate on another column pays its own shuffle
    on_key = j.groupBy("k").count()
    assert exchange_count(on_key) == 0


def test_bucketed_join_matches_plain_join(spark, facts, tmp_path):
    left, right = facts
    j = bucketed_join(
        spark, left, right, "k", "rk", 4,
        names=("t_bj_l2", "t_bj_r2"), database="t_bucketed",
        location=str(tmp_path / "wh2"),
    )
    expected = left.join(
        right.withColumnRenamed("rk", "k"), "k"
    )
    assert j.select("k", "lv", "rv").exceptAll(
        expected.select("k", "lv", "rv")
    ).count() == 0
    assert expected.count() == j.count()


def test_write_bucketed_validates_identifiers(spark, facts, tmp_path):
    left, _ = facts
    with pytest.raises(ValueError):
        write_bucketed(spark, left, "bad-name", "k", 4)
    with pytest.raises(ValueError):
        write_bucketed(spark, left, "ok", "k; drop", 4)
    with pytest.raises(ValueError):
        write_bucketed(spark, left, "ok", "k", 0)


def test_bucket_pruning_on_point_filter(spark, facts, tmp_path):
    """An equality filter on the bucket key scans ~1/n of the files."""
    left, _ = facts
    t = write_bucketed(
        spark, left, "t_bp", "k", 8, database="t_bucketed",
        location=str(tmp_path / "wh3"),
    )
    # Spark's DisableUnnecessaryBucketedScan rule turns the bucketed
    # read OFF for pure-filter queries (it only weighs distribution
    # needs, not pruning) — disable it so the point lookup prunes
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        df = spark.table(t).where(F.col("k") == 42)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "SelectedBucketsCount: 1 out of 8" in plan
    finally:
        spark.conf.set(key, prev)
    assert df.count() == 1


def test_write_bucketed_clears_stale_location_from_dead_session(spark, tmp_path):
    """A killed session can leave the bucketed table's directory on disk
    while the new session's catalog has no such table; the write must
    clear the stale location instead of failing LOCATION_ALREADY_EXISTS."""
    import os

    from e_commerce_lakehouse_spark.operators.bucketing import write_bucketed

    loc = str(tmp_path / "bdb")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    name = "stale_loc_tbl"
    spark.sql(f"DROP TABLE IF EXISTS bucketed.{name}")
    os.makedirs(os.path.join(loc, name), exist_ok=True)
    with open(os.path.join(loc, name, "leftover"), "w") as fh:
        fh.write("x")
    q = write_bucketed(spark, df, name, "k", 2, location=loc)
    assert spark.table(q).count() == 2
    spark.sql(f"DROP TABLE IF EXISTS {q}")
