"""Hidden partitioning (table/partition.py): Iceberg-style transforms.

Reference analog: partitioned Delta writes + partition pruning
(`orders_etl.py:191-194`, `products_etl.py:91-94`). Here the partition
values are DERIVED from row columns by declared transforms (bucket/day/
identity), stored per-file in the manifest, never in the data files —
and the planner prunes EXACTLY from ordinary column predicates.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.cluster import cluster
from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.rowlevel import delete_where
from e_commerce_lakehouse_spark.synth import transcripts_df
from e_commerce_lakehouse_spark.table import planned_entries, scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.partition import (
    PartitionField,
    apply_transform,
)
from e_commerce_lakehouse_spark.table.writer import (
    append_dataframe,
    create_transcripts_table,
)
from tests.conftest import assert_same_rows

BUCKET = PartitionField("conv_bucket", "conv_id", "bucket[4]")
DAY = PartitionField("ts_day", "ts", "day")


@pytest.fixture()
def bucket_table(spark, tmp_path):
    df = transcripts_df(spark, 2_000, seed=5).cache()
    df.count()
    root = str(tmp_path / "ptbl")
    t = create_transcripts_table(spark, root, df, rows_per_file=250,
                                 partition_spec=[BUCKET])
    return t, df


def test_partitioned_write_and_exact_point_pruning(spark, bucket_table):
    t, df = bucket_table
    entries = t.entries()
    assert entries and all(
        e.partition is not None and "conv_bucket" in e.partition for e in entries
    )
    buckets = {e.partition["conv_bucket"] for e in entries}
    assert buckets == {0, 1, 2, 3}
    # full scan: unchanged data schema, full-row equality
    assert_same_rows(scan(spark, t), df)

    some_conv = df.select("conv_id").first()["conv_id"]
    want = apply_transform(BUCKET, some_conv)
    planned = planned_entries(t, conv_id=some_conv)
    assert planned, "point scan planned zero files"
    assert all(e.partition["conv_bucket"] == want for e in planned)
    # EXACT: files from the other three buckets are gone regardless of
    # their conv_id min/max stats
    assert len(planned) < len(entries)
    assert_same_rows(
        scan(spark, t, conv_id=some_conv), df.where(F.col("conv_id") == some_conv)
    )


def test_compact_preserves_partition_purity(spark, bucket_table):
    t, df = bucket_table
    n_before = len(t.entries())
    m = compact(spark, t, target_bytes=256 << 20)  # would merge ALL without the split
    assert not m.get("noop")
    entries = t.entries()
    # outputs inherit their group's partition tuple; never cross-bucket
    assert all(e.partition is not None for e in entries)
    assert len(entries) == 4 < n_before  # one output per bucket
    assert_same_rows(scan(spark, t), df)
    some_conv = df.select("conv_id").first()["conv_id"]
    planned = planned_entries(t, conv_id=some_conv)
    assert len(planned) == 1  # exact pruning survives compaction


def test_cluster_is_partition_pure(spark, bucket_table):
    t, df = bucket_table
    m = cluster(spark, t, curve="zorder", target_bytes=1 << 20)
    assert m["output_files"] >= 4
    entries = t.entries()
    assert all(e.partition is not None and "conv_bucket" in e.partition
               for e in entries)
    assert {e.partition["conv_bucket"] for e in entries} == {0, 1, 2, 3}
    assert_same_rows(scan(spark, t), df)
    some_conv = df.select("conv_id").first()["conv_id"]
    want = apply_transform(BUCKET, some_conv)
    planned = planned_entries(t, conv_id=some_conv)
    assert planned and all(e.partition["conv_bucket"] == want for e in planned)
    with pytest.raises(ValueError, match="sharded clustering"):
        cluster(spark, t, curve="zorder", shards=4)


def test_append_derives_partition_and_mor_delete_reads_right(spark, bucket_table):
    t, df = bucket_table
    extra = (
        transcripts_df(spark, 400, seed=6)
        .withColumn("conv_id", F.concat(F.lit("zz-"), F.col("conv_id")))
        .cache()
    )
    extra.count()
    append_dataframe(spark, t, extra, rows_per_file=200)
    new_entries = [e for e in t.entries() if e.path.startswith("data/append-")]
    assert new_entries and all(e.partition is not None for e in new_entries)

    pred = "turn_idx = 0 AND conv_id <= 'conv-0000000000zz'"
    delete_where(spark, t, pred, mode="merge-on-read")
    expected = df.unionByName(extra).where(f"NOT ({pred})")
    assert_same_rows(scan(spark, t), expected)


def test_day_partitioning_prunes_time_ranges(spark, tmp_path):
    df = transcripts_df(spark, 800, seed=7).cache()
    df.count()
    t = create_transcripts_table(spark, str(tmp_path / "dtbl"), df,
                                 rows_per_file=800, partition_spec=[DAY])
    entries = t.entries()
    days = sorted({e.partition["ts_day"] for e in entries})
    assert len(days) > 5  # synth spreads ts over ~116 days
    # a 3-day window keeps only those days' files — exact, not stat-based
    lo_day = days[len(days) // 2]
    lo = dt.datetime(1970, 1, 1) + dt.timedelta(days=lo_day)
    hi = lo + dt.timedelta(days=2, hours=23, minutes=59)
    planned = planned_entries(t, ts_range=(lo, hi))
    assert planned and all(
        lo_day <= e.partition["ts_day"] <= lo_day + 2 for e in planned
    )
    assert len(planned) < len(entries)
    assert_same_rows(
        scan(spark, t, ts_range=(lo, hi)),
        df.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))),
    )


def test_spec_guards(spark, tmp_path, bucket_table):
    t, df = bucket_table
    with pytest.raises(ValueError, match="write-once"):
        t.set_partition_spec([DAY], ["conv_id", "ts"])
    empty = Table.create(str(tmp_path / "etbl"))
    with pytest.raises(ValueError, match="unknown partition transform"):
        empty.set_partition_spec(
            [PartitionField("x", "ts", "month")], ["ts"]
        )
    with pytest.raises(ValueError, match="not in schema"):
        empty.set_partition_spec(
            [PartitionField("x", "nope", "day")], ["ts"]
        )
    with pytest.raises(ValueError, match="collides"):
        empty.set_partition_spec(
            [PartitionField("ts", "ts", "day")], ["ts"]
        )
    # spec on a table with committed data: refused
    t2 = create_transcripts_table(spark, str(tmp_path / "dtbl2"),
                                  transcripts_df(spark, 100, seed=8))
    with pytest.raises(ValueError, match="committed data"):
        t2.set_partition_spec([DAY], ["conv_id", "ts"])
