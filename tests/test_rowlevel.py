"""Row-level DELETE WHERE / UPDATE SET: only matching rows change, only
files that contain matches are rewritten, commits are atomic snapshots
that compose with time travel and the maintenance lifecycle."""

import os

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.cluster import cluster
from e_commerce_lakehouse_spark.operators.rowlevel import (
    delete_where,
    materialize_deletes,
    update_where,
)
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import assert_same_rows


def test_delete_where_removes_only_matches(spark, tiny_df, tiny_table):
    before = tiny_table.total_rows()
    n_match = tiny_df.where("role = 'tool'").count()
    assert 0 < n_match < before
    m = delete_where(spark, tiny_table, "role = 'tool'")
    assert m["committed_snapshot"] is not None
    after = scan(spark, tiny_table).cache()
    assert after.count() == before - n_match
    assert after.where("role = 'tool'").count() == 0
    # survivors byte-identical (per-turn text invariant)
    assert_same_rows(
        tiny_df.where("role <> 'tool'").select("conv_id", "turn_idx", "text"),
        after.select("conv_id", "turn_idx", "text"),
    )
    after.unpersist()


def test_delete_prunes_untouched_files(spark, tiny_df, tiny_table):
    cluster(spark, tiny_table, curve="zorder", target_bytes=24 * 1024)
    m = delete_where(spark, tiny_table, "conv_id = 'conv-000000000003'")
    assert m["touched_files"] < m["total_files"]
    assert scan(spark, tiny_table).where("conv_id = 'conv-000000000003'").count() == 0


def test_delete_no_match_is_noop(spark, tiny_table):
    sid = tiny_table.current_snapshot_id()
    m = delete_where(spark, tiny_table, "conv_id = 'no-such-conv'")
    assert m["committed_snapshot"] is None and m["touched_files"] == 0
    assert tiny_table.current_snapshot_id() == sid


def test_delete_entire_file_drops_it(spark, tiny_df, tiny_table):
    before_rows = tiny_table.total_rows()
    pre_sid = tiny_table.current_snapshot_id()
    m = delete_where(spark, tiny_table, F.lit(True))
    assert m["added_files"] == 0  # zero-row rewrites never hit the manifest
    assert tiny_table.total_rows() == 0
    # time travel still sees the pre-delete snapshot
    prev = scan(spark, tiny_table, snapshot_id=pre_sid)
    assert prev.count() == before_rows
    # and no empty parquet files were left behind in data/
    for e in tiny_table.entries():
        assert e.rows > 0


def test_update_where_sets_only_matches(spark, tiny_df, tiny_table):
    pred = "role = 'assistant' AND turn_idx <= 3"
    n_match = tiny_df.where(pred).count()
    assert n_match > 0
    m = update_where(
        spark, tiny_table, pred,
        {"text": "upper(text)", "tool": F.lit("patched")},
    )
    after = scan(spark, tiny_table).cache()
    assert after.count() == tiny_df.count()
    got = after.where(pred)
    assert got.count() == n_match
    assert got.where(F.col("tool") != "patched").count() == 0
    # matched text transformed exactly; everything else untouched
    exp_match = tiny_df.where(pred).select("conv_id", "turn_idx",
                                           F.upper("text").alias("text"))
    assert_same_rows(exp_match, got.select("conv_id", "turn_idx", "text"))
    assert_same_rows(
        tiny_df.where(f"NOT ({pred})").select("conv_id", "turn_idx", "text", "tool"),
        after.where(f"NOT ({pred})").select("conv_id", "turn_idx", "text", "tool"),
    )
    after.unpersist()


def test_update_unknown_column_raises(spark, tiny_table):
    import pytest

    with pytest.raises(ValueError, match="non-existent"):
        update_where(spark, tiny_table, "turn_idx = 0", {"nope": F.lit(1)})


def test_update_preserves_column_types(spark, tiny_df, tiny_table):
    update_where(spark, tiny_table, "turn_idx = 1", {"turn_idx": "turn_idx + 100"})
    after = scan(spark, tiny_table)
    assert dict(after.dtypes)["turn_idx"] == dict(tiny_df.dtypes)["turn_idx"]
    expected_101 = tiny_df.where("turn_idx = 1").count() + tiny_df.where("turn_idx = 101").count()
    assert after.where("turn_idx = 101").count() == expected_101
    assert after.where("turn_idx = 1").count() == 0


def test_delete_then_maintenance_lifecycle(spark, tiny_df, tiny_table):
    """Row-level ops compose with compact+cluster: the lifecycle sees the
    post-delete table and never resurrects deleted rows."""
    from e_commerce_lakehouse_spark.operators.compact import compact

    delete_where(spark, tiny_table, "turn_idx >= 8")
    compact(spark, tiny_table, target_bytes=64 * 1024)
    cluster(spark, tiny_table, curve="zorder", target_bytes=64 * 1024)
    after = scan(spark, tiny_table)
    assert after.where("turn_idx >= 8").count() == 0
    assert after.count() == tiny_df.where("turn_idx < 8").count()


# ------------------------------------------------- merge-on-read deletes


def test_mor_delete_hides_rows_without_rewriting(spark, tiny_df, tiny_table):
    files_before = {e.path for e in tiny_table.entries()}
    n_match = tiny_df.where("role = 'tool'").count()
    m = delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    assert m["mode"] == "merge-on-read" and m["tombstoned_keys"] == n_match
    # data files untouched — the whole point
    assert {e.path for e in tiny_table.entries()} == files_before
    after = scan(spark, tiny_table)
    assert after.where("role = 'tool'").count() == 0
    assert after.count() == tiny_df.count() - n_match
    # time travel before the delete still sees the rows
    pre = scan(spark, tiny_table, snapshot_id=m["committed_snapshot"] - 1)
    assert pre.where("role = 'tool'").count() == n_match


def test_mor_deletes_stack_and_materialize(spark, tiny_df, tiny_table):
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    delete_where(spark, tiny_table, "turn_idx >= 9", mode="merge-on-read")
    assert len(tiny_table.tombstones()) >= 2
    expected = tiny_df.where("role <> 'tool' AND turn_idx < 9")
    logical = scan(spark, tiny_table)
    assert logical.count() == expected.count()
    mm = materialize_deletes(spark, tiny_table)
    assert mm["committed_snapshot"] is not None
    assert tiny_table.tombstones() == []
    physical = scan(spark, tiny_table)
    assert_same_rows(
        expected.select("conv_id", "turn_idx", "text"),
        physical.select("conv_id", "turn_idx", "text"),
    )
    # physical rows now match logical rows (manifest row counts honest again)
    assert tiny_table.total_rows() == expected.count()


def test_mor_survives_compaction_rewrite(spark, tiny_df, tiny_table):
    from e_commerce_lakehouse_spark.operators.compact import compact

    n_match = tiny_df.where("role = 'tool'").count()
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    compact(spark, tiny_table, target_bytes=1 << 20)  # rewrites files
    after = scan(spark, tiny_table)
    assert after.where("role = 'tool'").count() == 0  # key tombstones still apply
    assert after.count() == tiny_df.count() - n_match
    assert tiny_table.tombstones()  # compaction propagates, never clears


def test_merge_resurrects_tombstoned_key(spark, tiny_df, tiny_table):
    """Upsert of a MoR-deleted key must come back: MERGE materializes the
    tombstones first, so the fresh row is never anti-joined away."""
    victim = tiny_df.where("conv_id = 'conv-000000000003' AND turn_idx = 1")
    assert victim.count() == 1
    delete_where(spark, tiny_table,
                 "conv_id = 'conv-000000000003' AND turn_idx = 1",
                 mode="merge-on-read")
    assert scan(spark, tiny_table).where(
        "conv_id = 'conv-000000000003' AND turn_idx = 1").count() == 0
    from e_commerce_lakehouse_spark.operators.merge import merge_into

    merge_into(spark, tiny_table, victim.withColumn("text", F.lit("resurrected")))
    assert tiny_table.tombstones() == []  # materialized en route
    got = scan(spark, tiny_table).where(
        "conv_id = 'conv-000000000003' AND turn_idx = 1").collect()
    assert len(got) == 1 and got[0]["text"] == "resurrected"


def test_mor_noop_and_gc_protection(spark, tiny_df, tiny_table):
    import os

    m = delete_where(spark, tiny_table, "conv_id = 'nope'", mode="merge-on-read")
    assert m["committed_snapshot"] is None and tiny_table.tombstones() == []
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    from e_commerce_lakehouse_spark.operators.expire import expire_snapshots

    expire_snapshots(tiny_table, keep_last=1)
    # live tombstone files survive GC
    assert tiny_table.tombstones()
    for t in tiny_table.tombstones():
        assert os.path.exists(os.path.join(tiny_table.root, t))
    assert scan(spark, tiny_table).where("role = 'tool'").count() == 0
    # after materialization, once no retained snapshot references them,
    # the applied tombstone files fall to orphan GC (grace 0: this test
    # KNOWS no writer is in flight — the noop delete's unreferenced
    # tombstone debris would otherwise sit out the in-flight-writer
    # grace window and keep its dir alive)
    materialize_deletes(spark, tiny_table)
    expire_snapshots(tiny_table, keep_last=1, orphan_grace_ms=0)
    data_dirs = os.listdir(os.path.join(tiny_table.root, "data"))
    assert not any(d.startswith("tombstone-") for d in data_dirs)


def test_cow_delete_null_predicate_keeps_rows(spark, tiny_df, tiny_table):
    """SQL DELETE semantics: rows where the predicate is NULL are KEPT
    (review finding — a bare ~pred filtered them out). Both modes agree."""
    n_null = tiny_df.where("tool IS NULL").count()
    victim_tool = tiny_df.where("tool IS NOT NULL").select("tool").first()["tool"]
    n_match = tiny_df.where(f"tool = '{victim_tool}'").count()
    assert n_null > 0 and n_match > 0
    delete_where(spark, tiny_table, f"tool = '{victim_tool}'")
    after = scan(spark, tiny_table)
    assert after.where("tool IS NULL").count() == n_null  # NULL rows kept
    assert after.count() == tiny_df.count() - n_match


def test_mor_mixed_key_sets_refused(spark, tiny_table):
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read",
                 keys=["conv_id", "turn_idx"])
    import pytest

    with pytest.raises(ValueError, match="materialize_deletes first"):
        delete_where(spark, tiny_table, "turn_idx >= 9", mode="merge-on-read",
                     keys=["conv_id"])
    # after materializing, a different key set is fine
    materialize_deletes(spark, tiny_table)
    delete_where(spark, tiny_table, "turn_idx >= 9", mode="merge-on-read",
                 keys=["conv_id"])


def test_clear_tombstones_conflicts_on_concurrent_delete(spark, tiny_table):
    """A delete-mor landing between an op's scan and its clearing commit
    must CONFLICT (lost-update guard), not silently discard the new
    tombstone."""
    import pytest

    from e_commerce_lakehouse_spark.table.meta import CommitConflictError

    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    planned = tiny_table.tombstones()
    # concurrent writer adds a second tombstone after our "scan"
    delete_where(spark, tiny_table, "turn_idx >= 9", mode="merge-on-read")
    with pytest.raises(CommitConflictError, match="tombstone list changed"):
        tiny_table.commit_rewrite([], [], operation="materialize-deletes",
                                  clear_tombstones=True,
                                  expected_tombstones=planned)
    # fresh plan succeeds
    materialize_deletes(spark, tiny_table)
    assert tiny_table.tombstones() == []


def test_mor_update_one_snapshot_post_image_survives(spark, tiny_df, tiny_table):
    """MoR UPDATE commits tombstone + post-image in ONE snapshot; the
    strict data-sequence comparison exempts the post-image file from its
    own tombstone (Iceberg v2 semantics)."""
    t = tiny_table
    before = t.current_snapshot_id()
    n_match = tiny_df.where("role = 'tool'").count()
    assert n_match > 0
    m = update_where(spark, t, "role = 'tool'", {"text": "upper(text)"},
                     mode="merge-on-read")
    assert m["mode"] == "merge-on-read"
    assert m["updated_rows"] == n_match
    # exactly ONE new snapshot, no data file rewritten
    assert t.current_snapshot_id() == before + 1
    assert t.snapshot().operation == "update-mor"
    after = scan(spark, t).cache()
    assert after.count() == tiny_df.count()  # row count unchanged
    assert after.where("role = 'tool'").count() == n_match
    # matched rows carry the post-image, others untouched
    assert after.where("role = 'tool'").where(
        F.col("text") != F.upper(F.col("text"))).count() == 0
    assert_same_rows(
        tiny_df.where("role <> 'tool'").select("conv_id", "turn_idx", "text"),
        after.where("role <> 'tool'").select("conv_id", "turn_idx", "text"),
    )
    after.unpersist()
    # time travel to the pre-update snapshot still sees the pre-image
    assert scan(spark, t, snapshot_id=before).where(
        "role = 'tool' AND text <> upper(text)").count() > 0


def test_mor_update_then_stacked_delete_and_materialize(spark, tiny_df, tiny_table):
    """A LATER MoR delete (higher seq) applies to the update's post-images;
    materialize folds both tombstone generations correctly."""
    t = tiny_table
    update_where(spark, t, "role = 'tool'", {"tool": "'patched'"},
                 mode="merge-on-read")
    delete_where(spark, t, "tool = 'patched'", mode="merge-on-read")
    assert scan(spark, t).where("role = 'tool'").count() == 0
    expected = tiny_df.where("role <> 'tool'").count()
    assert scan(spark, t).count() == expected
    m = materialize_deletes(spark, t)
    assert m["committed_snapshot"] is not None
    assert t.tombstones() == []
    assert scan(spark, t).count() == expected
    assert scan(spark, t).where("role = 'tool'").count() == 0


def test_mor_update_delete_predicate_sees_post_image(spark, tiny_df, tiny_table):
    """DELETE evaluates its predicate on the LOGICAL view: after an MoR
    update rewrites tool to 'patched', deleting the OLD value matches
    nothing (a raw-file read would have matched the dead pre-images and
    killed the live post-image rows)."""
    t = tiny_table
    old_tools = [r["tool"] for r in
                 tiny_df.where("role = 'tool'").select("tool").distinct().collect()
                 if r["tool"] is not None]
    assert old_tools
    update_where(spark, t, "role = 'tool'", {"tool": "'patched'"},
                 mode="merge-on-read")
    m = delete_where(spark, t, F.col("tool") == old_tools[0], mode="merge-on-read")
    assert m["tombstoned_keys"] == 0 and m["committed_snapshot"] is None
    assert scan(spark, t).where("tool = 'patched'").count() == \
        tiny_df.where("role = 'tool'").count()


def test_mor_update_rewrites_keys(spark, tiny_df, tiny_table):
    """Key-rewriting MoR UPDATE (one atomic snapshot): the tombstone is
    keyed on the PRE-image identity, the post-image file carries the NEW
    keys (seq-exempt from its own tombstone) — the rows MOVE."""
    t = tiny_table
    n_tool = tiny_df.where("role = 'tool'").count()
    n_all = tiny_df.count()
    m = update_where(spark, t, "role = 'tool'",
                     {"turn_idx": "turn_idx + 1000"}, mode="merge-on-read")
    assert m["mode"] == "merge-on-read" and m["updated_rows"] == n_tool
    after = scan(spark, t).cache()
    assert after.count() == n_all  # moved, not duplicated or lost
    assert after.where("role = 'tool' AND turn_idx < 1000").count() == 0
    assert after.where("turn_idx >= 1000").count() == n_tool
    # non-key columns of moved rows are intact
    moved = after.where("turn_idx >= 1000").withColumn(
        "turn_idx", F.col("turn_idx") - 1000)
    assert_rows = sorted(map(tuple, moved.collect()))
    assert assert_rows == sorted(map(tuple,
                                     tiny_df.where("role = 'tool'").collect()))
    # materialize folds the key-rewrite tombstone cleanly
    from e_commerce_lakehouse_spark.operators.rowlevel import materialize_deletes

    materialize_deletes(spark, t)
    assert t.tombstones() == []
    assert scan(spark, t).count() == n_all


def test_mor_update_key_shift_overlapping_ranges(spark, tiny_df, tiny_table):
    """Shifting keys INTO the matched range (turn_idx += 1 for
    turn_idx < 3): pre-image keys 0-2 are tombstoned, post-images land on
    1-3 — the unmatched original turn 3 now shares its key with a shifted
    row (documented SQL-UPDATE semantics: no uniqueness enforcement),
    and no row is lost."""
    t = tiny_table
    n_all = tiny_df.count()
    n_matched = tiny_df.where("turn_idx < 3").count()
    update_where(spark, t, "turn_idx < 3", {"turn_idx": "turn_idx + 1"},
                 mode="merge-on-read")
    after = scan(spark, t).cache()
    assert after.count() == n_all
    assert after.where("turn_idx = 0").count() == 0  # all moved off 0
    per_conv_t3 = (after.where("turn_idx = 3").groupBy("conv_id").count()
                   .agg(F.max("count")).first()[0])
    assert per_conv_t3 == 2  # original turn 3 + shifted turn 2 coexist
    # survivors below 3 are exactly the rows shifted onto 1 and 2,
    # i.e. the originals at 0 and 1 (the originals at 0,1,2 all moved)
    assert after.where("turn_idx < 3").count() == \
        tiny_df.where("turn_idx < 2").count()
    assert n_matched == tiny_df.where("turn_idx < 3").count()


def test_compact_preserves_tombstone_applicability(spark, tiny_df, tiny_table):
    """Compaction between an MoR update and the scan must not let the
    tombstone kill the carried post-image rows (seq-class planning +
    max-seq outputs) nor resurrect pre-images."""
    from e_commerce_lakehouse_spark.operators.compact import compact

    t = tiny_table
    n_tool = tiny_df.where("role = 'tool'").count()
    update_where(spark, t, "role = 'tool'", {"tool": "'patched'"},
                 mode="merge-on-read")
    compact(spark, t, target_bytes=1 << 20)
    after = scan(spark, t).cache()
    assert after.count() == tiny_df.count()
    assert after.where("tool = 'patched'").count() == n_tool
    # pre-images stay dead
    assert after.where("role = 'tool' AND (tool IS NULL OR tool <> 'patched')").count() == 0
    after.unpersist()


def test_cow_delete_whole_file_drop_is_metadata_only(spark, tmp_path):
    """Archival on a day-partitioned table: ``DELETE WHERE ts < day
    boundary`` fully matches every file of the expired days (files are
    partition-pure), so the commit removes them METADATA-ONLY — zero
    rewrite output files — and keeps the later days byte-identical."""
    from e_commerce_lakehouse_spark.synth import transcripts_df
    from e_commerce_lakehouse_spark.table.partition import PartitionField
    from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

    df = transcripts_df(spark, 3_000, seed=11).cache()
    t = create_transcripts_table(
        spark, str(tmp_path / "ptbl"), df, rows_per_file=400,
        partition_spec=[PartitionField("ts_day", "ts", "day")],
    )
    days = sorted({e.partition["ts_day"] for e in t.entries()})
    assert len(days) >= 3
    cut_day = days[len(days) // 2]
    import datetime as dtm

    cutoff = dtm.datetime(1970, 1, 1) + dtm.timedelta(days=int(cut_day))
    pred = F.col("ts") < F.lit(cutoff)
    n_match = df.where(pred).count()
    assert n_match > 0
    m = delete_where(spark, t, pred)
    # every pre-cutoff file is partition-pure → all dropped, none rewritten
    assert m["dropped_files"] >= 1
    assert m["added_files"] == 0
    assert m["touched_files"] == m["dropped_files"]
    assert t.snapshot().summary.get("metadata_only") is True
    after = scan(spark, t)
    assert after.count() == df.count() - n_match
    assert_same_rows(
        df.where(~pred).select("conv_id", "turn_idx", "text"),
        after.select("conv_id", "turn_idx", "text"),
    )
    df.unpersist()


def test_cow_delete_mixed_full_and_partial_files(spark, tiny_df, tiny_table):
    """Full files drop, boundary files rewrite; survivors byte-identical."""
    cluster(spark, tiny_table, curve="zorder", target_bytes=24 * 1024)
    # ts cutoff in the middle: early files fully match, one straddles
    cutoff = tiny_df.selectExpr(
        "timestamp_micros(cast(percentile(unix_micros(ts), 0.45) as long)) as c"
    ).collect()[0]["c"]
    pred = F.col("ts") < F.lit(cutoff)
    keep_expected = tiny_df.where(~F.coalesce(pred, F.lit(False)))
    m = delete_where(spark, tiny_table, pred)
    assert m["committed_snapshot"] is not None
    after = scan(spark, tiny_table)
    assert_same_rows(
        keep_expected.select("conv_id", "turn_idx", "text"),
        after.select("conv_id", "turn_idx", "text"),
    )
