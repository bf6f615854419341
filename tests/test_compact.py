"""Op-1 compaction: file-count drop, byte-equality, snapshot isolation,
kill-and-resume at file-group granularity (SURVEY.md §5 items 2/3/5)."""

import pytest

from e_commerce_lakehouse_spark.operators.compact import SimulatedCrash, compact
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import assert_same_rows

TARGET = 512 * 1024  # small target so the tiny table still forms groups


def test_compact_reduces_files_and_preserves_bytes(spark, tiny_table):
    before = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    n_before = len(tiny_table.entries())
    m = compact(spark, tiny_table, target_bytes=TARGET)
    n_after = len(tiny_table.entries())
    assert n_after < n_before
    assert m["committed_snapshot"] == 4
    after = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    assert_same_rows(before, after)


def test_compact_snapshot_isolation(spark, tiny_table):
    pre_id = tiny_table.current_snapshot_id()
    pre_files = set(e.path for e in tiny_table.entries())
    compact(spark, tiny_table, target_bytes=TARGET)
    # pinned reader still sees the exact pre-compaction file set
    assert set(e.path for e in tiny_table.entries(pre_id)) == pre_files
    pinned = scan(spark, tiny_table, snapshot_id=pre_id)
    current = scan(spark, tiny_table)
    assert_same_rows(pinned, current)


def test_compact_crash_resume(spark, tiny_table, tmp_path):
    ckpt = str(tmp_path / "ck.jsonl")
    before = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    with pytest.raises(SimulatedCrash):
        compact(
            spark,
            tiny_table,
            target_bytes=TARGET,
            checkpoint_path=ckpt,
            max_concurrent_groups=1,
            fail_after_groups=1,
        )
    # no commit happened
    assert tiny_table.current_snapshot_id() == 3
    # resume completes, skipping the finished group
    m = compact(spark, tiny_table, target_bytes=TARGET, checkpoint_path=ckpt)
    assert m["resumed_groups"] >= 1
    assert tiny_table.current_snapshot_id() == 4
    assert_same_rows(before, scan(spark, tiny_table).select("conv_id", "turn_idx", "text"))


def test_compact_jobs_mode_parity(spark, tiny_table):
    before = scan(spark, tiny_table).select("conv_id", "turn_idx", "text")
    n_before = len(tiny_table.entries())
    m = compact(spark, tiny_table, target_bytes=TARGET, mode="jobs", max_concurrent_groups=4)
    assert len(tiny_table.entries()) < n_before
    assert m["committed_snapshot"] == 4
    assert_same_rows(before, scan(spark, tiny_table).select("conv_id", "turn_idx", "text"))


def test_compact_noop_when_healthy(spark, tiny_table):
    compact(spark, tiny_table, target_bytes=TARGET)
    m2 = compact(spark, tiny_table, target_bytes=TARGET)
    assert m2.get("noop") or m2["planned_groups"] <= 1
