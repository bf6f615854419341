"""Op-3 manifest rewrite + op-4 snapshot expire/GC (SURVEY.md §7.3 step 7)."""

import os

from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.expire import expire_snapshots
from e_commerce_lakehouse_spark.operators.manifest_rewrite import rewrite_manifests
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import assert_same_rows


def test_rewrite_manifests_pure_metadata(spark, tiny_table):
    compact(spark, tiny_table, target_bytes=512 * 1024)  # creates tombstones
    before_entries = {e.path for e in tiny_table.entries()}
    before_rows = scan(spark, tiny_table)
    snap_before = tiny_table.snapshot()
    assert len(snap_before.manifests) > 1 or snap_before.removed_files

    m = rewrite_manifests(tiny_table, target_entries_per_manifest=1000)
    snap_after = tiny_table.snapshot()
    assert len(snap_after.manifests) == m["manifests_after"] == 1
    assert snap_after.removed_files == []
    assert {e.path for e in tiny_table.entries()} == before_entries
    assert_same_rows(before_rows, scan(spark, tiny_table))


def test_expire_gc_removes_unreferenced_files(spark, tiny_table):
    pre_files = set(tiny_table.file_paths())
    compact(spark, tiny_table, target_bytes=512 * 1024)  # snapshot 4 replaces files
    assert all(os.path.exists(p) for p in pre_files)  # still on disk (isolation)

    m = expire_snapshots(tiny_table, keep_last=1)
    # snapshots 1..3 expired; their exclusive files are gone
    assert m["expired_snapshots"] == [1, 2, 3]
    live = set(tiny_table.file_paths())
    for p in pre_files - live:
        assert not os.path.exists(p)
    for p in live:
        assert os.path.exists(p)
    # current snapshot still scans fine
    assert scan(spark, tiny_table).count() == tiny_table.total_rows()


def test_expire_cleans_crash_debris(spark, tiny_table):
    """Unreferenced debris is grace-bounded: a YOUNG file (possibly an
    in-flight writer's) survives the default grace; an OLD one (a real
    crash's) is collected. Referenced-by-expired files are exempt from
    grace (covered by test_expire_deletes_old_exclusive_files)."""
    debris_dir = os.path.join(tiny_table.data_dir, "merge-99999999")
    os.makedirs(debris_dir)
    debris = os.path.join(debris_dir, "part-dead.parquet")
    with open(debris, "wb") as f:
        f.write(b"dead")
    keep = len(tiny_table.snapshot_ids())
    m = expire_snapshots(tiny_table, keep_last=keep)
    assert os.path.exists(debris)  # young: could be an in-flight commit
    assert m["skipped_young_orphans"] >= 1
    old = os.path.getmtime(debris) - 25 * 3600
    os.utime(debris, (old, old))
    expire_snapshots(tiny_table, keep_last=keep)
    assert not os.path.exists(debris)  # aged past grace: crash debris


def test_expire_dry_run_deletes_nothing(spark, tiny_table):
    compact(spark, tiny_table, target_bytes=512 * 1024)
    m = expire_snapshots(tiny_table, keep_last=1, dry_run=True)
    assert m["expired_snapshots"] == [1, 2, 3]
    # everything still present
    assert tiny_table.snapshot_ids() == [1, 2, 3, 4]
    assert scan(spark, tiny_table, snapshot_id=1).count() > 0
