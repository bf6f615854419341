"""Liquid-style incremental clustering (cluster(incremental=True)).

Selection is pure metadata: files whose data-sequence number postdates
the last cluster commit. Invariants: old clustered files are untouched
byte-for-byte, content equality holds, and a caught-up run is a noop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.cluster import _last_cluster_sid, cluster
from e_commerce_lakehouse_spark.operators.merge import merge_into
from e_commerce_lakehouse_spark.synth import corrections_df, transcripts_df
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.writer import create_transcripts_table, write_files

from tests.conftest import assert_same_rows


def _mk(spark, tmp_path, n=4_000):
    root = str(tmp_path / "incr_tbl")
    df = transcripts_df(spark, n, seed=21).cache()
    t = create_transcripts_table(spark, root, df, rows_per_file=1_000)
    return root, df, t


def test_incremental_clusters_only_new_files(spark, tmp_path):
    root, df, t = _mk(spark, tmp_path)
    cluster(spark, t, curve="zorder", target_bytes=256 * 1024)
    full_sid = t.current_snapshot_id()
    clustered_paths = {e.path for e in t.entries()}

    extra = transcripts_df(spark, 800, seed=99)
    entries = write_files(spark, t, extra, 2, "late-batch")
    t.commit_append(entries, {"op": "append"})
    before = scan(spark, t).cache()
    before.count()

    r = cluster(spark, t, curve="zorder", target_bytes=256 * 1024,
                incremental=True)
    assert not r.get("noop")
    # every previously clustered file survives untouched
    after_paths = {e.path for e in t.entries()}
    assert clustered_paths <= after_paths
    # only the late batch was rewritten
    assert r["rows"] == 800
    assert_same_rows(scan(spark, t), before)
    # the increment's outputs are key-sorted new files, seq-preserved
    new_entries = [e for e in t.entries() if e.path not in clustered_paths]
    assert all((e.seq or 0) > full_sid for e in new_entries)


def test_incremental_noop_when_caught_up(spark, tmp_path):
    root, df, t = _mk(spark, tmp_path, n=2_000)
    cluster(spark, t, curve="zorder", target_bytes=256 * 1024)
    r = cluster(spark, t, curve="zorder", incremental=True)
    assert r["noop"] and r["incremental"]
    # a second incremental after an incremental is also a noop
    extra = write_files(spark, t, transcripts_df(spark, 400, seed=5), 1, "b2")
    t.commit_append(extra, {"op": "append"})
    r1 = cluster(spark, t, curve="zorder", target_bytes=256 * 1024,
                 incremental=True)
    assert not r1.get("noop")
    r2 = cluster(spark, t, curve="zorder", incremental=True)
    assert r2["noop"]


def test_incremental_on_never_clustered_table_is_full(spark, tmp_path):
    root, df, t = _mk(spark, tmp_path, n=2_000)
    assert _last_cluster_sid(t) is None
    before = scan(spark, t).cache()
    before.count()
    r = cluster(spark, t, curve="zorder", target_bytes=256 * 1024,
                incremental=True)
    assert not r.get("noop")
    assert r["rows"] == 2_000  # bootstraps as a FULL cluster
    assert_same_rows(scan(spark, t), before)


def test_incremental_picks_up_merge_outputs(spark, tmp_path):
    root, df, t = _mk(spark, tmp_path)
    cluster(spark, t, curve="zorder", target_bytes=256 * 1024)
    corr = corrections_df(spark, df, seed=7, update_pct=2, n_inserts=30)
    merge_into(spark, t, corr)
    before = scan(spark, t).cache()
    before.count()
    r = cluster(spark, t, curve="zorder", target_bytes=256 * 1024,
                incremental=True)
    assert not r.get("noop")
    assert r["rows"] > 0  # the merge-rewritten files were re-clustered
    assert_same_rows(scan(spark, t), before)
    assert cluster(spark, t, curve="zorder", incremental=True)["noop"]


def test_incremental_rejects_predicate_scope(spark, tmp_path):
    root, df, t = _mk(spark, tmp_path, n=1_000)
    import pytest

    with pytest.raises(ValueError, match="mutually exclusive"):
        cluster(spark, t, incremental=True,
                conv_id_range=("conv-000000000000", "conv-000000000005"))


def test_incremental_point_scan_improves_after_increment(spark, tmp_path):
    """The whole point: post-increment, a conv point scan must not read
    the ENTIRE late batch's row spread — the increment's outputs carry
    narrow conv_id stats like any clustered file."""
    from e_commerce_lakehouse_spark.table.scan import planned_entries

    root, df, t = _mk(spark, tmp_path)
    cluster(spark, t, curve="zorder", target_bytes=128 * 1024)
    extra = transcripts_df(spark, 4_000, seed=99)
    entries = write_files(spark, t, extra, 4, "late")
    t.commit_append(entries, {"op": "append"})
    key = extra.select("conv_id").first()[0]
    kept_before = len(planned_entries(t, conv_id=key))
    cluster(spark, t, curve="zorder", target_bytes=128 * 1024,
            incremental=True)
    kept_after = len(planned_entries(t, conv_id=key))
    assert kept_after <= kept_before
    got = scan(spark, t, conv_id=key)
    want = scan(spark, t).where(F.col("conv_id") == key)
    assert_same_rows(got, want)
