"""Write-audit-publish: stage an append invisibly, audit it pinned,
publish atomically — or abandon it and let GC reclaim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import expire_snapshots
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import CommitConflictError
from e_commerce_lakehouse_spark.table.writer import append_dataframe
from tests.conftest import N_TURNS


def _extra(tiny_df, prefix, n):
    return tiny_df.limit(n).select(
        F.concat(F.lit(prefix), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )


def test_stage_audit_publish(spark, tiny_table, tiny_df):
    t = tiny_table
    head = t.current_snapshot_id()
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-wap-", 200), publish=False)

    # invisible to readers until published
    assert t.current_snapshot_id() == head
    assert scan(spark, t).count() == N_TURNS
    # auditable pinned
    audit = scan(spark, t, snapshot_id=staged.snapshot_id)
    assert audit.count() == N_TURNS + 200
    assert audit.where(F.col("conv_id").startswith("conv-wap-")).count() == 200

    t.publish_snapshot(staged.snapshot_id)
    assert t.current_snapshot_id() == staged.snapshot_id
    assert scan(spark, t).count() == N_TURNS + 200


def test_publish_conflicts_if_head_moved(spark, tiny_table, tiny_df):
    t = tiny_table
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-s-", 50), publish=False)
    # another writer advances the head before the audit finishes
    append_dataframe(spark, t, _extra(tiny_df, "conv-w-", 50))
    with pytest.raises(CommitConflictError, match="re-stage"):
        t.publish_snapshot(staged.snapshot_id)
    with pytest.raises(ValueError, match="already published"):
        t.publish_snapshot(t.current_snapshot_id())


def test_staged_ids_never_collide_with_later_commits(spark, tiny_table, tiny_df):
    t = tiny_table
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-s-", 50), publish=False)
    later = append_dataframe(spark, t, _extra(tiny_df, "conv-w-", 50))
    assert later.snapshot_id != staged.snapshot_id
    # the staged snapshot's content survived the later commit untouched
    assert scan(spark, t, snapshot_id=staged.snapshot_id).where(
        F.col("conv_id").startswith("conv-s-")
    ).count() == 50


def test_abandoned_staged_snapshot_is_gcd(spark, tiny_table, tiny_df):
    t = tiny_table
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-dead-", 80), publish=False)
    # churn the table past retention, never publishing the staged snap
    append_dataframe(spark, t, _extra(tiny_df, "conv-a-", 10))
    append_dataframe(spark, t, _extra(tiny_df, "conv-b-", 10))
    res = expire_snapshots(t, keep_last=1)
    assert staged.snapshot_id not in t.snapshot_ids()
    assert res["deleted_data_files"] >= 1  # the staged append's files
    assert scan(spark, t).where(F.col("conv_id").startswith("conv-dead-")).count() == 0


def test_staged_snapshot_carries_tombstones(spark, tiny_df, tiny_table):
    """Write-audit-publish × merge-on-read: a STAGED append inherits the
    parent's live tombstones, so auditing the staged snapshot sees the
    logical (post-delete) view — publish then flips atomically."""
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where
    from e_commerce_lakehouse_spark.synth import transcripts_df
    from e_commerce_lakehouse_spark.table import scan
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    from pyspark.sql import functions as F

    n_tool = tiny_df.where("role = 'tool'").count()
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")

    # INSERT after DELETE re-inserts (round 4, seq semantics): the
    # appended file's sequence number is above the live tombstone's, so
    # the rows are VISIBLE — the pre-seq guard that refused this append
    # protected against a hazard that no longer exists
    reinserted = tiny_df.where("role = 'tool'").limit(2)
    append_dataframe(spark, tiny_table, reinserted)
    assert scan(spark, tiny_table).where("role = 'tool'").count() == 2
    assert tiny_table.tombstones()  # tombstone still live for OLD copies

    # fresh keys stage cleanly and the audit sees the logical view
    extra = transcripts_df(spark, 30, seed=9).select(
        F.concat(F.lit("wap-"), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )
    n_extra = extra.count()
    staged = append_dataframe(spark, tiny_table, extra, publish=False)
    assert tiny_table.current_snapshot_id() == staged.parent_id
    audited = scan(spark, tiny_table, snapshot_id=staged.snapshot_id)
    assert audited.count() == tiny_df.count() - n_tool + 2 + n_extra
    tiny_table.publish_snapshot(staged.snapshot_id)
    assert tiny_table.tombstones()  # still live after publish
    assert scan(spark, tiny_table).count() == audited.count()


def test_abandoned_staged_snapshot_invisible_to_time_travel_and_history(
    spark, tiny_df, tiny_table
):
    """A staged snapshot that was never published was never CURRENT at
    any wall-clock time: timestamp time travel must not serve it, and
    history must keep labeling it staged even after the head advances
    past it (review findings)."""
    import time

    from e_commerce_lakehouse_spark.synth import transcripts_df
    from e_commerce_lakehouse_spark.table import scan
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    base_rows = scan(spark, tiny_table).count()
    staged = append_dataframe(spark, tiny_table, transcripts_df(spark, 25, seed=13),
                              publish=False)
    time.sleep(0.05)
    ts_after_stage = int(time.time() * 1000)
    # time travel to "now" resolves the PUBLISHED head, not the staged id
    assert tiny_table.snapshot_id_as_of(ts_after_stage) == staged.parent_id
    assert scan(spark, tiny_table, as_of_ts_ms=ts_after_stage).count() == base_rows
    # abandon the stage; publish a different append past it
    pub = append_dataframe(spark, tiny_table, transcripts_df(spark, 10, seed=14))
    assert pub.snapshot_id > staged.snapshot_id
    hist = {h["snapshot_id"]: h for h in tiny_table.history()}
    assert hist[staged.snapshot_id]["staged"] is True  # still labeled staged
    assert hist[pub.snapshot_id]["staged"] is False
    # and time travel still never resolves the abandoned stage
    assert tiny_table.snapshot_id_as_of(int(time.time() * 1000)) == pub.snapshot_id


def test_tag_pinned_abandoned_stage_stays_staged_below_chain_floor(
    spark, tiny_table, tiny_df
):
    """An abandoned staged snapshot pinned by a tag can outlive its
    contemporaries and sink below the walkable chain floor; the explicit
    staged marker keeps snapshot_id_as_of/history from misclassifying it
    as published history (review finding)."""
    import time

    t = tiny_table
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-pin-", 40), publish=False)
    t.create_tag("audit-hold", staged.snapshot_id)
    assert staged.summary.get("staged") is True

    # churn far past retention and expire everything older than the head
    append_dataframe(spark, t, _extra(tiny_df, "conv-a-", 10))
    append_dataframe(spark, t, _extra(tiny_df, "conv-b-", 10))
    append_dataframe(spark, t, _extra(tiny_df, "conv-c-", 10))
    expire_snapshots(t, keep_last=1)

    # tag pinned it below the chain floor...
    assert staged.snapshot_id in t.snapshot_ids()
    assert staged.snapshot_id < min(t._published_ids() or {0})
    # ...but it is still excluded from published history
    assert staged.snapshot_id not in t._published_ids()
    future = int(time.time() * 1000) + 10_000
    assert t.snapshot_id_as_of(future) != staged.snapshot_id
    row = [h for h in t.history() if h["snapshot_id"] == staged.snapshot_id][0]
    assert row["staged"] is True


def test_published_stage_loses_staged_marker(spark, tiny_table, tiny_df):
    """publish_snapshot clears the staged flag so published history below a
    future chain break is still classified published."""
    t = tiny_table
    staged = append_dataframe(spark, t, _extra(tiny_df, "conv-pub-", 30), publish=False)
    t.publish_snapshot(staged.snapshot_id)
    assert t.snapshot(staged.snapshot_id).summary.get("staged") is None
    assert staged.snapshot_id in t._published_ids()
