"""Sharded-cluster kill/resume, rejected-rows audit sink, fallback reader,
and hypothesis property tests for MERGE semantics and curve-key kernels
(SURVEY.md §5: property-based tests are absent in the reference — added)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.functions.zorder import (
    MASK31,
    hilbert_key_py,
    zorder_key_py,
)
from e_commerce_lakehouse_spark.operators.cluster import SimulatedCrash, cluster
from e_commerce_lakehouse_spark.operators.etl import write_rejected
from e_commerce_lakehouse_spark.schema import ORDERS_SCHEMA
from e_commerce_lakehouse_spark.sources.readers import read_with_fallback
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import assert_same_rows


def test_sharded_cluster_crash_resume(spark, tiny_table, tmp_path):
    ckpt = str(tmp_path / "cl.jsonl")
    before = scan(spark, tiny_table)
    with pytest.raises(SimulatedCrash):
        cluster(
            spark, tiny_table, curve="zorder", target_bytes=48 * 1024,
            shards=3, checkpoint_path=ckpt, fail_after_shards=1,
        )
    assert tiny_table.current_snapshot_id() == 3  # no commit yet
    m = cluster(
        spark, tiny_table, curve="zorder", target_bytes=48 * 1024,
        shards=3, checkpoint_path=ckpt,
    )
    assert m["committed_snapshot"] == 4
    assert_same_rows(before, scan(spark, tiny_table))


def test_rejected_rows_audit_sink(spark, tmp_path):
    dest = str(tmp_path / "rejected")
    bad = spark.createDataFrame(
        [("ORD_X", -1, 100, None, -5.0, "2024-01-01")], ORDERS_SCHEMA
    )
    write_rejected(bad, dest, reason="validation_failed", job_run_id="run-1")
    write_rejected(bad, dest, reason="validation_failed", job_run_id="run-2")
    back = spark.read.parquet(dest)
    assert back.count() == 2  # append mode accumulates
    cols = set(back.columns)
    assert {"rejection_reason", "rejection_timestamp", "job_run_id"} <= cols
    assert back.where(F.col("job_run_id") == "run-2").count() == 1


def test_read_with_fallback_csv(spark, tmp_path):
    p = str(tmp_path / "orders.csv")
    with open(p, "w") as f:
        f.write("order_num,order_id,user_id,order_timestamp,total_amount,date\n")
        f.write("ORD_001,1,100,2024-01-01 10:00:00,50.0,2024-01-01\n")
    assert read_with_fallback(spark, p, ORDERS_SCHEMA).count() == 1


# ---------------------------------------------------------- property tests


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=MASK31),
    st.integers(min_value=0, max_value=MASK31),
    st.integers(min_value=0, max_value=MASK31),
    st.integers(min_value=0, max_value=MASK31),
)
def test_zorder_key_is_injective_and_monotone_per_dim(x1, y1, x2, y2):
    z1, z2 = zorder_key_py(x1, y1), zorder_key_py(x2, y2)
    if (x1, y1) != (x2, y2):
        assert z1 != z2  # bit interleave is a bijection
    if y1 == y2 and x1 <= x2:
        assert z1 <= z2  # fixing one dim, the key is monotone in the other
    assert 0 <= z1 < 2**62


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=MASK31),
    st.integers(min_value=0, max_value=MASK31),
)
def test_hilbert_key_in_range_and_distinct_cells(x, y):
    d = hilbert_key_py(x, y, 31)
    assert 0 <= d < 2**62
    # adjacent x differs → different curve position (injectivity spot check)
    if x < MASK31:
        assert hilbert_key_py(x + 1, y, 31) != d


def test_merge_upsert_key_algebra(spark):
    """Property on real data: result keys == target ∪ source keys; source
    wins on intersection; target untouched elsewhere."""
    from e_commerce_lakehouse_spark.operators.merge import merge_upsert_dataframes

    target = spark.createDataFrame(
        [(f"c{i}", j, "u", f"t-{i}-{j}", None, "2024-01-01 00:00:00")
         for i in range(5) for j in range(4)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    source = spark.createDataFrame(
        [("c1", 0, "u", "FIX", None, "2024-01-02 00:00:00"),
         ("c9", 0, "u", "NEW", None, "2024-01-02 00:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = merge_upsert_dataframes(target, source, ("conv_id", "turn_idx"))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.collect()}
    t_keys = {(f"c{i}", j) for i in range(5) for j in range(4)}
    assert set(got) == t_keys | {("c9", 0)}
    assert got[("c1", 0)] == "FIX"
    assert got[("c2", 2)] == "t-2-2"
