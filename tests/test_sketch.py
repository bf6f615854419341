"""KMV distinct-count sketch (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.sketch import kmv_distinct_by_group


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 40).select(
        (F.col("id") % 2).alias("g"), F.col("id").cast("string").alias("v")
    )
    out = kmv_distinct_by_group(df, ["g"], "v", k=64).collect()
    assert {(r["g"], r["n_min"], r["est_distinct"]) for r in out} == {
        (0, 20, 20.0), (1, 20, 20.0)
    }


def test_kmv_estimate_within_bounds(spark):
    """k=256 over 10_000 distinct values: standard error ~ 1/sqrt(k-2)
    ≈ 6.3%; assert a generous 4-sigma band (deterministic hash — the
    draw is fixed, this documents the accuracy class)."""
    df = spark.range(0, 10_000).select(
        F.lit("a").alias("g"), F.col("id").cast("string").alias("v")
    )
    row = kmv_distinct_by_group(df, ["g"], "v", k=256).collect()[0]
    assert row["n_min"] == 256
    assert 7_500 <= row["est_distinct"] <= 12_500


def test_kmv_deterministic_and_duplicate_insensitive(spark):
    base = spark.range(0, 1_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 100).cast("string").alias("v")
    )
    a = {tuple(r) for r in kmv_distinct_by_group(base, ["g"], "v", k=32).collect()}
    # duplicating every row must not change any estimate (set semantics)
    doubled = base.unionAll(base)
    b = {tuple(r) for r in kmv_distinct_by_group(doubled, ["g"], "v", k=32).collect()}
    assert a == b


def test_kmv_rejects_degenerate_k(spark):
    df = spark.range(3).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_distinct_by_group(df, ["g"], "v", k=1)


def test_kmv_nulls_excluded_like_count_distinct(spark):
    """NULL values must not fill k-min slots (review finding: Spark
    ranks a NULL hash FIRST; COUNT(DISTINCT) and the DuckDB oracle
    exclude it)."""
    df = spark.range(0, 30).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.col("id").cast("string")).alias("v"),
    )
    row = kmv_distinct_by_group(df, ["g"], "v", k=64).collect()[0]
    assert row["n_min"] == 20  # 20 non-null distinct, NULLs excluded
    assert row["est_distinct"] == 20.0


def test_per_file_ndv_sketches_merge_and_survive_rewrites(spark, tmp_path):
    """Manifest KMV sketches: declared spec -> every write path sketches;
    the merged estimate is invariant under compaction (exact sketch
    algebra) and exact below k; undeclared/legacy files count as
    missing; CLI ops round-trip."""
    import sys

    sys.path.insert(0, ".")
    from run_maintenance import main

    from e_commerce_lakehouse_spark.operators.compact import compact
    from e_commerce_lakehouse_spark.operators.sketch import table_ndv
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import (
        append_dataframe,
        write_files,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "ndv_tbl")
    t = Table.create(root)
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    entries = write_files(spark, t, docs.limit(20), 1, "legacy-0000",
                          stat_columns=("doc_id",))
    t.commit_append(entries, {"op": "pre-spec"})  # legacy: no sketch

    assert main(["--table", root, "--op", "set-ndv",
                 "--columns", "lang,text"]) == 0
    append_dataframe(spark, t, docs.exceptAll(docs.limit(20)))

    r = table_ndv(t, "lang")
    assert r["files_missing"] == 1  # the pre-spec file
    exact_lang = docs.select("lang").distinct().count()
    # lang NDV is far below k: the covered files report exactly
    assert r["n_min"] <= exact_lang

    before = table_ndv(t, "text")
    compact(spark, t, target_bytes=1 << 20, stat_columns=("doc_id",))
    after = table_ndv(t, "text")
    assert after["files_missing"] == 0  # compaction backfilled the legacy file
    # post-compact estimate covers MORE data (legacy rows included) and
    # n_min can only grow; with full coverage it equals the global sketch
    assert after["n_min"] >= before["n_min"]
    assert main(["--table", root, "--op", "ndv", "--columns", "lang"]) == 0


def test_key_overlap_estimate_exact_below_k(spark, tmp_path):
    """key_overlap_estimate is EXACT when both key sets have < k
    distinct values (the sketches degenerate to the full hash sets):
    planted overlap of 10 keys between 20- and 15-key tables."""
    from e_commerce_lakehouse_spark.operators.sketch import (
        key_overlap_estimate,
    )
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    a_df = spark.range(0, 20).selectExpr("id AS k1")       # keys 0..19
    b_df = spark.range(10, 25).selectExpr("id AS k2")      # keys 10..24
    ta = Table.create(str(tmp_path / "a"))
    ta.append_schema_version(a_df.schema.jsonValue(), as_of_snapshot=0)
    ta.set_ndv_columns(["k1"], k=64)
    append_dataframe(spark, ta, a_df)
    tb = Table.create(str(tmp_path / "b"))
    tb.append_schema_version(b_df.schema.jsonValue(), as_of_snapshot=0)
    tb.set_ndv_columns(["k2"], k=64)
    append_dataframe(spark, tb, b_df)
    r = key_overlap_estimate(ta, "k1", tb, "k2")
    assert r["est_union"] == 25.0     # exact |0..24|
    assert r["n_inter"] == 10         # exact |10..19|
    assert r["est_common"] == 10.0
    assert abs(r["jaccard"] - 10 / 25) < 1e-12
