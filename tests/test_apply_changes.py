"""APPLY CHANGES INTO: the CDC-consume side (operators/apply_changes).

Contract under test: end-state (SCD1) semantics per key — greatest
_commit_sid wins, insert outranks delete at equal sid (an exact-mode
rewrite emits delete pre-image + insert post-image under one sid);
winners route to MERGE (insert) and MoR key tombstones (delete); and a
ChangeFeedConsumer→replicate loop converges a downstream table to the
upstream scan across appends, merges, cow/MoR deletes, and updates —
including under redelivery (crash before ack).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.apply_changes import apply_changes, replicate
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.cdc import ChangeFeedConsumer
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.writer import append_dataframe

from tests.conftest import assert_same_rows

KEYS = ["conv_id", "turn_idx"]


def _with_change(df, change_type, sid):
    return df.withColumn("_change_type", F.lit(change_type)) \
             .withColumn("_commit_sid", F.lit(sid).cast("long"))


def test_apply_changes_end_state_semantics(spark, tiny_df, tmp_path):
    t = Table.create(str(tmp_path / "tgt"))
    base = tiny_df.limit(200).cache()
    # initial batch: plain inserts into an empty table -> append path
    r = apply_changes(spark, t, _with_change(base, "insert", 1), KEYS)
    assert r["upserted"] == 200 and r["deleted"] == 0
    assert scan(spark, t).count() == 200

    rows = base.orderBy("conv_id", "turn_idx").limit(3).collect()
    k0, k1, k2 = [(r["conv_id"], r["turn_idx"]) for r in rows]
    mutated = base.where(
        (F.col("conv_id") == k0[0]) & (F.col("turn_idx") == k0[1])
    ).withColumn("role", F.lit("rewritten"))
    batch = (
        # k0: exact-mode rewrite shape — delete pre-image + insert
        # post-image at ONE sid: post-image must win
        _with_change(base.where((F.col("conv_id") == k0[0]) & (F.col("turn_idx") == k0[1])), "delete", 2)
        .unionByName(_with_change(mutated, "insert", 2))
        # k1: deleted at sid 2, nothing later -> gone
        .unionByName(_with_change(base.where((F.col("conv_id") == k1[0]) & (F.col("turn_idx") == k1[1])), "delete", 2))
        # k2: deleted at sid 2 but re-inserted at sid 3 -> alive
        .unionByName(_with_change(base.where((F.col("conv_id") == k2[0]) & (F.col("turn_idx") == k2[1])), "delete", 2))
        .unionByName(_with_change(base.where((F.col("conv_id") == k2[0]) & (F.col("turn_idx") == k2[1])), "insert", 3))
    )
    r = apply_changes(spark, t, batch, KEYS)
    assert r["upserted"] == 2 and r["deleted"] == 1
    got = scan(spark, t)
    assert got.count() == 199  # one net delete
    assert got.where((F.col("conv_id") == k0[0]) & (F.col("turn_idx") == k0[1]))
    assert got.where((F.col("conv_id") == k0[0]) & (F.col("turn_idx") == k0[1])).collect()[0]["role"] == "rewritten"
    assert got.where((F.col("conv_id") == k1[0]) & (F.col("turn_idx") == k1[1])).count() == 0
    assert got.where((F.col("conv_id") == k2[0]) & (F.col("turn_idx") == k2[1])).count() == 1


def test_apply_changes_rejects_unknown_change_type(spark, tiny_df, tmp_path):
    t = Table.create(str(tmp_path / "tgt"))
    bad = _with_change(tiny_df.limit(1), "upsert", 1)
    with pytest.raises(ValueError, match="unknown _change_type"):
        apply_changes(spark, t, bad, KEYS)


def test_apply_changes_missing_columns(spark, tiny_df, tmp_path):
    t = Table.create(str(tmp_path / "tgt"))
    with pytest.raises(ValueError, match="missing columns"):
        apply_changes(spark, t, tiny_df.limit(1), KEYS)


def test_replicate_converges_through_lifecycle(spark, tiny_table, tiny_df, tmp_path):
    """Full CDC loop: every replicate() tick converges the replica to the
    upstream scan — appends, merge updates, cow delete, MoR delete+update."""
    from e_commerce_lakehouse_spark.operators.merge import merge_into
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where, update_where

    src = tiny_table
    tgt = Table.create(str(tmp_path / "replica"))
    c = ChangeFeedConsumer(src, str(tmp_path / "cur.json"))

    def tick_and_check():
        out = replicate(spark, c, tgt, KEYS, exact=True)
        assert out is not None
        assert_same_rows(scan(spark, src), scan(spark, tgt))
        # caught up: next tick is a no-op
        assert replicate(spark, c, tgt, KEYS, exact=True) is None

    tick_and_check()  # initial sync

    # upstream mutations, one replication tick over the whole span
    extra = tiny_df.limit(500).withColumn(
        "conv_id", F.concat(F.lit("conv-r-"), F.col("conv_id")))
    append_dataframe(spark, src, extra)
    merge_into(spark, src, tiny_df.limit(120).withColumn("role", F.lit("edited")))
    delete_where(spark, src, "role = 'tool'")  # copy-on-write
    tick_and_check()

    delete_where(spark, src, F.col("conv_id").startswith("conv-r-"),
                 mode="merge-on-read")
    update_where(spark, src, "role = 'user'", {"tool": "'flagged'"},
                 mode="merge-on-read")
    tick_and_check()


def test_replicate_redelivery_is_absorbed(spark, tiny_table, tmp_path):
    """Crash between apply and ack: the batch re-delivers and the second
    apply is a value-level no-op (at-least-once -> same end state)."""
    src = tiny_table
    tgt = Table.create(str(tmp_path / "replica"))
    c = ChangeFeedConsumer(src, str(tmp_path / "cur.json"))
    b = c.poll_changes(spark, exact=True)
    apply_changes(spark, tgt, b["df"], KEYS)
    # no ack — simulate crash; re-poll re-delivers the same span
    c2 = ChangeFeedConsumer(src, str(tmp_path / "cur.json"))
    b2 = c2.poll_changes(spark, exact=True)
    apply_changes(spark, tgt, b2["df"], KEYS)
    c2.ack()
    assert_same_rows(scan(spark, src), scan(spark, tgt))
