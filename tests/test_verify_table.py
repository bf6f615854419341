"""verify_table: the metadata ↔ filesystem integrity audit."""

import os

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import verify_table
from e_commerce_lakehouse_spark.operators.constraints import add_constraint
from e_commerce_lakehouse_spark.operators.rowlevel import delete_where


def test_healthy_table_verifies_clean(spark, tiny_table):
    r = verify_table(tiny_table, spark=spark)
    assert r["ok"] is True
    assert r["files_checked"] == len(tiny_table.entries())
    assert r["missing_files"] == r["size_mismatches"] == r["stat_mismatches"] == 0


def test_detects_missing_and_corrupt_files(spark, tiny_table):
    entries = tiny_table.entries()
    victim = os.path.join(tiny_table.root, entries[0].path)
    os.remove(victim)
    # truncate a second file: size mismatch
    victim2 = os.path.join(tiny_table.root, entries[1].path)
    with open(victim2, "r+b") as f:
        f.truncate(os.path.getsize(victim2) - 10)
    r = verify_table(tiny_table, spark=spark)
    assert r["ok"] is False
    assert r["missing_files"] == 1
    assert r["size_mismatches"] == 1
    kinds = {i["kind"] for i in r["issues"]}
    assert {"missing-file", "size-mismatch"} <= kinds


def test_detects_manifest_stat_lies(spark, tiny_table):
    """A manifest whose stats disagree with the footer would silently
    corrupt file skipping — verify must flag it."""
    import json

    # tamper with a manifest copy of the stats (json or parquet manifests:
    # easiest route is rewriting a JSON manifest; skip if parquet codec)
    snap = tiny_table.snapshot()
    mpath = os.path.join(tiny_table.metadata_dir, snap.manifests[0])
    if mpath.endswith(".json"):
        with open(mpath) as f:
            d = json.load(f)
        d["entries"][0]["rows"] += 5
        with open(mpath, "w") as f:
            json.dump(d, f)
        r = verify_table(tiny_table, spark=spark)
        assert r["ok"] is False and r["stat_mismatches"] >= 1
    else:  # parquet manifests: tamper the data file instead (same check)
        e = tiny_table.entries()[0]
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(tiny_table.root, e.path))
        pq.write_table(t.slice(0, max(1, t.num_rows - 3)),
                       os.path.join(tiny_table.root, e.path))
        r = verify_table(tiny_table, spark=spark)
        assert r["ok"] is False
        assert r["stat_mismatches"] >= 1 or r["size_mismatches"] >= 1


def test_missing_tombstone_and_bad_constraint_flagged(spark, tiny_table):
    delete_where(spark, tiny_table, "role = 'tool'", mode="merge-on-read")
    tpath = tiny_table.tombstones()[0]
    os.remove(os.path.join(tiny_table.root, tpath))
    add_constraint(spark, tiny_table, "ghost", "no_such_col > 0",
                   validate_existing=False)
    r = verify_table(tiny_table, spark=spark)
    kinds = {i["kind"] for i in r["issues"]}
    assert "missing-tombstone" in kinds
    assert "unresolvable-constraint" in kinds


def test_orphans_reported_not_fatal(spark, tiny_table):
    junk = os.path.join(tiny_table.data_dir, "junk-dir")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "stray.parquet"), "wb") as f:
        f.write(b"not really parquet")
    r = verify_table(tiny_table, spark=spark)
    assert r["orphan_files"] >= 1
    assert r["ok"] is True  # orphans are GC's job, not integrity errors
