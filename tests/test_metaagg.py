"""Metadata-only aggregation (operators/metaagg.py).

Invariants: the count is EXACT under every classification mix (pure
metadata, boundary reads, legacy files without null counts, tombstone
fallback); file attribution proves the metadata path actually engages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.metaagg import (
    metadata_count,
    metadata_min_max,
)
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.writer import write_files
from tests.conftest import N_TURNS


def _truth(spark, t, **kw):
    df = scan(spark, t)
    if "ts_range" in kw:
        lo, hi = kw["ts_range"]
        if lo is not None:
            df = df.where(F.col("ts") >= lo)
        if hi is not None:
            df = df.where(F.col("ts") <= hi)
    if "conv_id_range" in kw:
        lo, hi = kw["conv_id_range"]
        df = df.where((F.col("conv_id") >= lo) & (F.col("conv_id") <= hi))
    if "eq" in kw:
        for c, v in kw["eq"].items():
            df = df.where(F.col(c) == v)
    return df.count()


def test_metadata_count_exact_and_attributed(spark, tiny_table, tiny_df):
    t = tiny_table
    lo = tiny_df.selectExpr("min(ts)").first()[0]
    hi = tiny_df.selectExpr("max(ts)").first()[0]
    # full range: answered WITHOUT opening a single data file
    m = metadata_count(spark, t, ts_range=(lo, hi))
    assert m["count"] == N_TURNS
    assert m["files_scanned"] == 0 and m["files_metadata"] == m["files_total"]
    # half-open wide range: interior files from metadata, boundary read
    mid = lo + (hi - lo) * 3 // 4
    m2 = metadata_count(spark, t, ts_range=(None, mid))
    assert m2["count"] == _truth(spark, t, ts_range=(None, mid))
    assert m2["files_metadata"] + m2["files_scanned"] + m2["files_pruned"] \
        == m2["files_total"]
    # point predicate on a non-core column via eq
    m3 = metadata_count(spark, t, eq={"role": "user"})
    assert m3["count"] == _truth(spark, t, eq={"role": "user"})


def test_metadata_count_legacy_files_demote_to_boundary(spark, tiny_df, tmp_path):
    """Entries committed without null counts (pre-feature vintage) can
    never be proven fully-inside — they are read, and the count stays
    exact."""
    from e_commerce_lakehouse_spark.table.meta import Table

    root = str(tmp_path / "legacy_tbl")
    t = Table.create(root)
    entries = write_files(spark, t, tiny_df, 4, "ingest-00000001-0000")
    for e in entries:
        e.nulls = None  # simulate a pre-feature manifest
    t.commit_append(entries, {"op": "legacy-ingest"})
    lo = tiny_df.selectExpr("min(ts)").first()[0]
    hi = tiny_df.selectExpr("max(ts)").first()[0]
    m = metadata_count(spark, t, ts_range=(lo, hi))
    assert m["count"] == N_TURNS
    assert m["files_metadata"] == 0 and m["files_scanned"] == m["files_total"]


def test_metadata_count_tombstones_fall_back(spark, tiny_table):
    from e_commerce_lakehouse_spark.operators.rowlevel import delete_where

    t = tiny_table
    delete_where(spark, t, F.col("role") == "user", mode="merge-on-read")
    m = metadata_count(spark, t)
    assert m["fallback"] == "tombstones"
    assert m["count"] == scan(spark, t).count()
    # sanity: the logical count really shrank
    assert m["count"] < N_TURNS


def test_metadata_min_max_matches_scan(spark, tiny_table):
    import datetime as dt

    t = tiny_table
    row = scan(spark, t).agg(F.min("ts"), F.max("ts")).collect()[0]
    mm = metadata_min_max(spark, t, "ts")
    epoch = dt.datetime(1970, 1, 1)
    assert mm["min"] == (row[0] - epoch) // dt.timedelta(microseconds=1)
    assert mm["max"] == (row[1] - epoch) // dt.timedelta(microseconds=1)
    assert mm["files_scanned"] == 0

    row2 = scan(spark, t).agg(F.min("conv_id"), F.max("conv_id")).collect()[0]
    mm2 = metadata_min_max(spark, t, "conv_id")
    assert (mm2["min"], mm2["max"]) == (row2[0], row2[1])
