"""Named tags (GC-protected refs) and the at-least-once CDC consumer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import compact, expire_snapshots
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.cdc import IncrementalConsumer
from e_commerce_lakehouse_spark.table.writer import append_dataframe
from tests.conftest import N_TURNS, assert_same_rows


def _relabeled(tiny_df, prefix, n):
    return tiny_df.limit(n).select(
        F.concat(F.lit(prefix), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )


def test_tag_pins_snapshot_through_expire(spark, tiny_table, tiny_df):
    t = tiny_table
    tagged_sid = t.current_snapshot_id()
    t.create_tag("v1.0")
    baseline = scan(spark, t, ref="v1.0")
    n0 = baseline.count()

    # churn several snapshots past keep_last
    compact(spark, t, target_bytes=1 << 20)
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-a-", 100))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-b-", 100))
    expire_snapshots(t, keep_last=1)

    # the tagged snapshot survived expiry and still reads in full
    assert tagged_sid in t.snapshot_ids()
    assert scan(spark, t, ref="v1.0").count() == n0

    # untag -> next expire ages it out
    t.delete_tag("v1.0")
    expire_snapshots(t, keep_last=1)
    assert tagged_sid not in t.snapshot_ids()


def test_tag_guards(tiny_table):
    t = tiny_table
    t.create_tag("x")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("x")
    with pytest.raises(KeyError):
        t.resolve_ref("missing")
    with pytest.raises(FileNotFoundError):
        t.create_tag("y", snapshot_id=9999)
    assert t.delete_tag("x") == t.current_snapshot_id()


def test_cdc_initial_then_appends_then_caught_up(spark, tiny_table, tiny_df, tmp_path):
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))

    b0 = c.poll(spark)
    assert b0["mode"] == "initial" and b0["df"].count() == N_TURNS
    c.ack()
    assert c.poll(spark) is None  # caught up

    extra = _relabeled(tiny_df, "conv-cdc-", 250)
    append_dataframe(spark, t, extra)
    b1 = c.poll(spark)
    assert b1["mode"] == "chain"
    assert_same_rows(b1["df"], extra)
    c.ack()
    assert c.poll(spark) is None


def test_cdc_skips_compaction_rewrites(spark, tiny_table, tiny_df, tmp_path):
    """The whole point of chain mode: a compaction rewrite of the entire
    table must deliver ZERO rows downstream."""
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()

    compact(spark, t, target_bytes=1 << 20)
    b = c.poll(spark)
    assert b["mode"] == "chain" and b["df"].count() == 0
    c.ack()

    # and an append AFTER the compaction delivers exactly the new rows
    extra = _relabeled(tiny_df, "conv-post-", 120)
    append_dataframe(spark, t, extra)
    b2 = c.poll(spark)
    assert b2["mode"] == "chain"
    assert_same_rows(b2["df"], extra)


def test_cdc_at_least_once_redelivery(spark, tiny_table, tiny_df, tmp_path):
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-r-", 80))

    b1 = c.poll(spark)  # crash before ack: poll again re-delivers
    c2 = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    b2 = c2.poll(spark)
    assert_same_rows(b1["df"], b2["df"])
    with pytest.raises(RuntimeError, match="nothing polled"):
        IncrementalConsumer(t, str(tmp_path / "cursor.json")).ack()


def test_cdc_fileset_diff_when_intermediates_expired(
    spark, tiny_table, tiny_df, tmp_path
):
    """Chain broken mid-way but the cursor snapshot survives (tagged):
    poll degrades to the conservative file-set diff, which still carries
    every new row (plus possibly rewrites)."""
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()
    t.create_tag("cursor-pin", c.position())

    append_dataframe(spark, t, _relabeled(tiny_df, "conv-x-", 60))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-y-", 60))
    expire_snapshots(t, keep_last=1)  # expires the intermediate appends
    assert c.position() in t.snapshot_ids()

    b = c.poll(spark)
    assert b["mode"] == "fileset-diff"
    assert b["df"].where(
        F.col("conv_id").startswith("conv-x-") | F.col("conv_id").startswith("conv-y-")
    ).count() == 120
    c.ack()


def test_cdc_reloads_when_cursor_snapshot_expired(
    spark, tiny_table, tiny_df, tmp_path
):
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()
    cursor_sid = c.position()

    append_dataframe(spark, t, _relabeled(tiny_df, "conv-x-", 60))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-y-", 60))
    expire_snapshots(t, keep_last=1)  # expires the cursor snapshot
    assert cursor_sid not in t.snapshot_ids()

    b = c.poll(spark)
    # the cursor snapshot itself expired -> no diff basis remains; the
    # consumer re-delivers the whole table (at-least-once, never loses)
    assert b["mode"] == "reload"
    assert b["df"].count() == N_TURNS + 120


def test_medallion_bronze_to_silver_pipeline(spark, tiny_table, tiny_df, tmp_path):
    """End-to-end bronze → silver: a downstream table kept in sync purely
    through the CDC consumer (poll → MERGE → ack). Compaction on bronze
    ships zero rows; corrections flow as upserts; after drain, silver's
    logical content equals bronze's scan exactly."""
    from e_commerce_lakehouse_spark.operators.merge import merge_into
    from e_commerce_lakehouse_spark.synth import corrections_df
    from e_commerce_lakehouse_spark.table import scan
    from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

    bronze = tiny_table
    c = IncrementalConsumer(bronze, str(tmp_path / "silver-cursor.json"))

    def drain(silver):
        rows_shipped = 0
        while True:
            b = c.poll(spark)
            if b is None:
                return silver, rows_shipped
            if silver is None:
                silver = create_transcripts_table(
                    spark, str(tmp_path / "silver"), b["df"], rows_per_file=2000
                )
            else:
                merge_into(spark, silver, b["df"])
            rows_shipped += b["df"].count()
            c.ack()

    silver, shipped0 = drain(None)
    assert shipped0 == N_TURNS

    # bronze evolves, silver drains after each change (steady-state shape)
    from e_commerce_lakehouse_spark.operators.cluster import cluster

    extra = _relabeled(tiny_df, "conv-med-", 300)
    append_dataframe(spark, bronze, extra)
    silver, s_append = drain(silver)
    assert s_append == 300  # chain: exactly the appended rows

    cluster(spark, bronze, curve="zorder", target_bytes=24 * 1024)
    silver, s_cluster = drain(silver)
    assert s_cluster == 0  # chain: rewrites ship ZERO rows

    # corrections confined to two conversations: stat pruning bites
    corr = tiny_df.where(
        F.col("conv_id").isin("conv-000000000003", "conv-000000000007")
    ).withColumn("text", F.concat(F.lit("fixed-"), "text"))
    merge_into(spark, bronze, corr)
    silver, s_merge = drain(silver)
    # merge ships only its touched (stat-pruned) files, never the table
    assert 0 < s_merge < scan(spark, bronze).count()

    assert_same_rows(
        scan(spark, bronze).select("conv_id", "turn_idx", "text", "role"),
        scan(spark, silver).select("conv_id", "turn_idx", "text", "role"),
    )


def test_cdc_append_absorbed_by_rewrite_not_lost(spark, tiny_table, tiny_df, tmp_path):
    """Regression (real bug found by the medallion test): an append whose
    files are rewritten by a later compact/cluster BEFORE the consumer
    polls used to be silently dropped — chain mode skipped the rewrite as
    non-data AND filtered the append's (now-removed) files. The fix
    degrades that window to fileset-diff: over-delivery, never loss."""
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()

    extra = _relabeled(tiny_df, "conv-lost-", 200)
    append_dataframe(spark, t, extra)
    compact(spark, t, target_bytes=1 << 20)  # absorbs the append's files

    b = c.poll(spark)
    assert b["mode"] == "fileset-diff"  # degraded, not silently pruned
    got = b["df"].where(F.col("conv_id").startswith("conv-lost-"))
    assert got.count() == 200  # every appended row delivered
    c.ack()

    # a later merge rewriting within the SAME window stays pure chain:
    # the second data op re-delivers the first's surviving rows itself
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-ok-", 50))
    from e_commerce_lakehouse_spark.operators.merge import merge_into

    merge_into(spark, t, _relabeled(tiny_df, "conv-ok-", 50))
    b2 = c.poll(spark)
    assert b2["mode"] == "chain"
    assert b2["df"].where(F.col("conv_id").startswith("conv-ok-")).count() == 50


def test_cdc_degrades_when_cursor_parent_expired_mid_chain(
    spark, tiny_table, tiny_df, tmp_path
):
    """Cursor snapshot expired but newer snapshots retained: the chain
    walk completes yet the remover-attribution pass touches the expired
    parent — must degrade (fileset-diff/reload), never crash (review
    finding against the pre-session-2 code; fixed by the attribution
    pass's FileNotFoundError guard)."""
    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    c.poll(spark)
    c.ack()
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-a-", 50))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-b-", 50))
    expire_snapshots(t, keep_last=2)  # cursor snapshot gone, 2 newer kept
    assert c.position() not in t.snapshot_ids()
    b = c.poll(spark)  # must not raise
    assert b["mode"] in ("fileset-diff", "reload")
    assert b["df"].where(F.col("conv_id").startswith("conv-a-")).count() == 50


def test_cdc_chain_excludes_mor_deleted_rows(spark, tiny_table, tiny_df, tmp_path):
    """A row appended then MoR-deleted inside the polled window must NOT be
    delivered as a live insert: chain mode matches scan-at-`to` semantics
    (the cow-delete path already excluded it — review finding)."""
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where

    t = tiny_table
    c = IncrementalConsumer(t, str(tmp_path / "cursor.json"))
    b0 = c.poll(spark)
    assert b0["mode"] == "initial"
    c.ack()

    append_dataframe(spark, t, _relabeled(tiny_df, "conv-mor-", 60))
    delete_where(
        spark, t, F.col("conv_id").startswith("conv-mor-"), mode="merge-on-read"
    )
    b1 = c.poll(spark)
    assert b1["mode"] == "chain"
    # the appended-then-deleted rows are invisible, like scan() at `to`
    assert b1["df"].where(F.col("conv_id").startswith("conv-mor-")).count() == 0
    c.ack()
    assert scan(spark, t).where(F.col("conv_id").startswith("conv-mor-")).count() == 0


def test_change_feed_replicates_deletes_downstream(spark, tiny_table, tiny_df, tmp_path):
    """Medallion with the typed change feed: downstream applies inserts
    AND deletes in _commit_sid order and converges to the upstream scan —
    including cow deletes, MoR deletes, and an MoR update."""
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where, update_where
    from e_commerce_lakehouse_spark.table.cdc import ChangeFeedConsumer

    t = tiny_table
    c = ChangeFeedConsumer(t, str(tmp_path / "cur.json"))
    b = c.poll_changes(spark)
    assert b["mode"] == "initial"
    silver = b["df"].drop("_change_type", "_commit_sid").cache()
    assert silver.count() == N_TURNS
    c.ack()

    append_dataframe(spark, t, _relabeled(tiny_df, "conv-n-", 40))
    delete_where(spark, t, "role = 'tool'")  # cow: pre-images must replicate
    delete_where(spark, t, F.col("conv_id").startswith("conv-n-"),
                 mode="merge-on-read")
    update_where(spark, t, "role = 'user'", {"tool": "'annotated'"},
                 mode="merge-on-read")
    b = c.poll_changes(spark)
    assert b["mode"] == "chain-changes"
    changes = b["df"].cache()
    assert changes.where("_change_type = 'delete'").count() > 0

    # replay in commit order: upsert inserts, then remove deletes, per sid
    keys = ["conv_id", "turn_idx"]
    sids = sorted(r["_commit_sid"] for r in
                  changes.select("_commit_sid").distinct().collect())
    for sid in sids:
        batch = changes.where(F.col("_commit_sid") == sid)
        ins = batch.where("_change_type = 'insert'").drop("_change_type", "_commit_sid")
        dels = batch.where("_change_type = 'delete'").select(*keys).distinct()
        silver = silver.join(ins.select(*keys).distinct(), keys, "left_anti") \
                       .unionByName(ins).join(dels, keys, "left_anti")
    assert_same_rows(scan(spark, t), silver)
    c.ack()
    changes.unpersist()


def test_change_feed_raises_on_broken_chain(spark, tiny_table, tiny_df, tmp_path):
    from e_commerce_lakehouse_spark.table.cdc import ChangeFeedConsumer, ChangeFeedError
    import pytest

    t = tiny_table
    c = ChangeFeedConsumer(t, str(tmp_path / "cur.json"))
    c.poll_changes(spark)
    c.ack()
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-x-", 10))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-y-", 10))
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-z-", 10))
    expire_snapshots(t, keep_last=1)  # breaks the (cursor, head] chain
    with pytest.raises(ChangeFeedError, match="expired"):
        c.poll_changes(spark)
    # the upsert-only poll still degrades gracefully
    b = c.poll(spark)
    assert b["mode"] in ("fileset-diff", "reload")


def test_incremental_scan_excludes_mor_deleted_rows(spark, tiny_table, tiny_df):
    """The fileset-diff fallback must match chain-mode semantics: a row
    appended then MoR-deleted inside the window is not delivered
    (review finding — the raw read resurrected it)."""
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where
    from e_commerce_lakehouse_spark.table.scan import incremental_scan

    t = tiny_table
    from_id = t.current_snapshot_id()
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-inc-", 30))
    delete_where(spark, t, F.col("conv_id").startswith("conv-inc-"),
                 mode="merge-on-read")
    df = incremental_scan(spark, t, from_id)
    assert df.where(F.col("conv_id").startswith("conv-inc-")).count() == 0


def test_change_feed_rollback_raises(spark, tiny_table, tiny_df, tmp_path):
    from e_commerce_lakehouse_spark.operators.rollback import rollback_to
    from e_commerce_lakehouse_spark.table.cdc import ChangeFeedConsumer, ChangeFeedError
    import pytest

    t = tiny_table
    c = ChangeFeedConsumer(t, str(tmp_path / "cur.json"))
    c.poll_changes(spark)
    c.ack()
    target = t.current_snapshot_id()
    append_dataframe(spark, t, _relabeled(tiny_df, "conv-rb-", 10))
    rollback_to(t, target)
    with pytest.raises(ChangeFeedError, match="rollback"):
        c.poll_changes(spark)
