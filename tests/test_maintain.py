"""Auto-maintenance planner + executor (operators/maintain): the
planner's decisions are a pure function of metadata and policy, so each
branch is pinned on a controlled layout; maintain() end-to-end must be
content-preserving and must actually clear the debts it planned against.
Replaces the reference's hand-scheduled maintenance DAG
(/root/reference/src/step_functions/etl_orchestrator.json:249-353) with
a metadata-driven scheduler."""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.cluster import cluster
from e_commerce_lakehouse_spark.operators.maintain import (
    maintain,
    plan_maintenance,
    table_health,
)
from e_commerce_lakehouse_spark.operators.rowlevel import delete_where
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.writer import append_dataframe
from tests.conftest import assert_same_rows

TARGET = 512 * 1024

POLICY = dict(target_bytes=TARGET, min_small_files=2, curve="zorder",
              cluster_min_new_files=2, tombstone_max_files=1,
              manifest_max_count=2, keep_last_snapshots=2)


def test_health_is_metadata_only(tiny_table):
    h = table_health(tiny_table, target_bytes=TARGET)
    entries = tiny_table.entries()
    assert h["live_files"] == len(entries)
    assert h["live_rows"] == sum(e.rows for e in entries)
    assert h["small_files"] > 0
    assert h["tombstone_files"] == 0
    assert not h["clustered"]
    assert h["unclustered_files"] == len(entries)
    assert h["manifests"] == 3
    assert h["snapshots"] == 3


def test_plan_fresh_table_full_cluster_subsumes_compact_and_purge(
    spark, tiny_table
):
    delete_where(spark, tiny_table, "turn_idx % 13 = 0",
                 mode="merge-on-read")
    plan = plan_maintenance(tiny_table, **POLICY)
    # full cluster sorts + bin-packs + clears tombstones: compact and
    # materialize_deletes would rewrite the same bytes twice
    assert plan == ["cluster_full", "rewrite_manifests", "expire_snapshots"]


def test_plan_no_curve_compacts_and_purges(spark, tiny_table):
    delete_where(spark, tiny_table, "turn_idx % 13 = 0",
                 mode="merge-on-read")
    plan = plan_maintenance(tiny_table, **{**POLICY, "curve": None})
    assert plan == ["materialize_deletes", "compact", "rewrite_manifests",
                    "expire_snapshots"]


def test_plan_healthy_table_is_empty(spark, tiny_table):
    maintain(spark, tiny_table, **POLICY)
    assert plan_maintenance(tiny_table, **POLICY) == []


def test_dry_run_commits_nothing(spark, tiny_table):
    head = tiny_table.current_snapshot_id()
    r = maintain(spark, tiny_table, dry_run=True, **POLICY)
    assert r["plan"] != []
    assert "steps" not in r
    assert tiny_table.current_snapshot_id() == head


def test_maintain_end_to_end_preserves_content(spark, tiny_table):
    before = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    before_rows = before.collect()
    r = maintain(spark, tiny_table, **POLICY)
    assert r["plan"][0] == "cluster_full"
    h = r["health_after"]
    assert h["tombstone_files"] == 0
    assert h["small_files"] < r["health_before"]["small_files"]
    assert h["snapshots"] <= POLICY["keep_last_snapshots"]
    after = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    assert_same_rows(
        spark.createDataFrame(before_rows, before.schema), after
    )


def test_maintain_incremental_round(spark, tiny_table, tiny_df):
    maintain(spark, tiny_table, **POLICY)
    # day 2: an append batch plus a small MoR delete
    batch = tiny_df.where(F.col("turn_idx") % 3 == 0).withColumn(
        "turn_idx", (F.col("turn_idx") + 1_000_000).cast("int")
    )
    append_dataframe(spark, tiny_table, batch, rows_per_file=300)
    delete_where(spark, tiny_table, "role = 'tool' AND turn_idx % 5 = 1",
                 mode="merge-on-read")
    expected = scan(spark, tiny_table).select(
        "conv_id", "turn_idx", "text"
    ).collect()
    r = maintain(spark, tiny_table, **POLICY)
    # clustered table: purge the tombstone, then incremental cluster
    # (O(new files), not O(table)); never a second full rewrite
    assert r["plan"][:2] == ["materialize_deletes", "cluster_incremental"]
    assert r["health_after"]["tombstone_files"] == 0
    assert r["health_after"]["unclustered_files"] == 0
    after = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    assert_same_rows(
        spark.createDataFrame(expected, after.schema), after
    )


def test_plan_clustered_table_small_append_below_threshold(
    spark, tiny_table, tiny_df
):
    cluster(spark, tiny_table, curve="zorder", target_bytes=TARGET)
    batch = tiny_df.limit(50).withColumn(
        "turn_idx", (F.col("turn_idx") + 2_000_000).cast("int")
    )
    append_dataframe(spark, tiny_table, batch, rows_per_file=300)
    plan = plan_maintenance(
        tiny_table, **{**POLICY, "cluster_min_new_files": 5,
                       "min_small_files": 50}
    )
    # one new file: below both the cluster and compact thresholds — no
    # data rewrite is planned, only metadata upkeep (the cluster commit
    # and the append each added a manifest, so rewrite fires)
    assert plan == ["rewrite_manifests", "expire_snapshots"]
