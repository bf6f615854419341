"""Table format: commits, snapshot pinning, stat-based pruning (SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.table import Table, prune_entries, scan
from tests.conftest import N_TURNS, assert_same_rows


def test_roundtrip_byte_equality(spark, tiny_df, tiny_table):
    back = scan(spark, tiny_table)
    assert back.count() == N_TURNS
    assert_same_rows(
        back.select("conv_id", "turn_idx", "text"),
        tiny_df.select("conv_id", "turn_idx", "text"),
    )


def test_append_commits_accumulate_manifests(tiny_table):
    assert tiny_table.snapshot_ids() == [1, 2, 3]
    snap = tiny_table.snapshot()
    assert len(snap.manifests) == 3
    assert tiny_table.total_rows() == N_TURNS


def test_snapshot_pinning(spark, tiny_table):
    rows_s1 = scan(spark, tiny_table, snapshot_id=1).count()
    rows_s3 = scan(spark, tiny_table, snapshot_id=3).count()
    assert 0 < rows_s1 < rows_s3 == N_TURNS


def test_stats_present_and_pruning_works(spark, tiny_table):
    entries = tiny_table.entries()
    assert all("conv_id" in e.stats and "ts" in e.stats and "turn_idx" in e.stats for e in entries)
    # a conv_id outside every file's range prunes everything
    none = prune_entries(entries, conv_id="zzzz")
    assert none == []
    df = scan(spark, tiny_table, conv_id="zzzz")
    assert df.count() == 0
    # point query returns exactly the rows of that conv
    some = scan(spark, tiny_table, conv_id="conv-000000000000")
    expect = scan(spark, tiny_table).where(F.col("conv_id") == "conv-000000000000")
    assert some.count() == expect.count() > 0


def test_atomic_version_flip(tiny_table, tmp_path):
    t = Table.load(tiny_table.root)
    assert t.current_snapshot_id() == 3
    snap = t.snapshot()
    assert snap.operation == "append"
    assert snap.parent_id == 2


def test_commit_lock_enforces_single_writer(tiny_table):
    import os
    import time

    from e_commerce_lakehouse_spark.table.meta import CommitConflictError

    t = Table.load(tiny_table.root)
    lock = os.path.join(t.metadata_dir, "COMMIT.lock")
    # a FRESH foreign lock blocks commits (second writer fails fast)
    with open(lock, "w") as f:
        f.write("99999 held")
    import pytest

    with pytest.raises(CommitConflictError):
        t.commit_manifests([t.snapshot().manifests[0]], operation="reset")
    # a STALE lock (crashed writer) is broken and the commit proceeds
    old = time.time() - 10_000
    os.utime(lock, (old, old))
    snap = t.commit_manifests(list(t.snapshot().manifests), operation="reset")
    assert snap.snapshot_id == 4
    assert not os.path.exists(lock)  # released after commit


def test_snapshot_diff_tracks_maintenance(spark, tiny_table):
    from e_commerce_lakehouse_spark.operators.compact import compact

    before = tiny_table.current_snapshot_id()
    m = compact(spark, tiny_table, target_bytes=96 * 1024)
    d = tiny_table.snapshot_diff(before, m["committed_snapshot"])
    assert d["operation"] == "replace"
    assert len(d["added_files"]) == m["output_files"]
    assert len(d["removed_files"]) == m["input_files"]
    assert d["rows_delta"] == 0  # compaction moves bytes, never rows


def test_parquet_fallback_sink_raises_by_default(spark, tiny_df, tmp_path):
    """S9 (orders_etl.py:196-199): default is NO silent ACID downgrade."""
    import os

    from e_commerce_lakehouse_spark.table.writer import write_with_parquet_fallback

    root = str(tmp_path / "s9tbl")
    # force the table write to fail deterministically: the ingest subdir
    # already exists, so write_files refuses to overwrite it
    os.makedirs(os.path.join(root, "data", "ingest-00000001-0000"))
    with pytest.raises(FileExistsError):
        write_with_parquet_fallback(spark, root, tiny_df.limit(100))


def test_parquet_fallback_sink_opt_in_degrades_loudly(spark, tiny_df, tmp_path):
    import os
    import warnings

    from e_commerce_lakehouse_spark.table.writer import (
        NonAcidFallbackWarning,
        write_with_parquet_fallback,
    )

    root = str(tmp_path / "s9tbl")
    os.makedirs(os.path.join(root, "data", "ingest-00000001-0000"))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = write_with_parquet_fallback(
            spark, root, tiny_df.limit(100), allow_non_acid_fallback=True
        )
    assert res["mode"] == "parquet-fallback" and res["acid"] is False
    assert any(issubclass(w.category, NonAcidFallbackWarning) for w in caught)
    back = spark.read.parquet(res["path"])
    assert back.count() == 100


def test_parquet_fallback_sink_happy_path_is_acid(spark, tiny_df, tmp_path):
    from e_commerce_lakehouse_spark.table.writer import write_with_parquet_fallback

    res = write_with_parquet_fallback(spark, str(tmp_path / "s9ok"), tiny_df.limit(100))
    assert res["mode"] == "table" and res["acid"] is True and res["snapshot"] == 1


def test_scan_rejects_nonstring_conv_id(spark, tiny_table):
    """conv_id is a string column; a non-string predicate must fail with
    a clear TypeError at plan time, not an arrow kernel error mid-scan."""
    with pytest.raises(TypeError, match="conv_id predicates must be strings"):
        scan(spark, tiny_table, conv_id=42)
    with pytest.raises(TypeError, match="conv_id predicates must be strings"):
        scan(spark, tiny_table, conv_id_range=(1, 99))
