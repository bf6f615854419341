"""Op-5 MERGE INTO: corrections win, inserts land, untouched rows are
byte-identical, file pruning rewrites only overlapping files
(SURVEY.md §5 item 4)."""

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.cluster import cluster
from e_commerce_lakehouse_spark.operators.merge import (
    dedup_keep_latest,
    merge_into,
    merge_upsert_dataframes,
)
from e_commerce_lakehouse_spark.synth import corrections_df
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import assert_same_rows


def test_merge_semantics_updates_and_inserts(spark, tiny_df, tiny_table):
    src = corrections_df(spark, tiny_df, seed=42, update_pct=2, n_inserts=20).cache()
    n_updates = src.where(~F.col("conv_id").startswith("conv-new")).count()
    n_inserts = src.where(F.col("conv_id").startswith("conv-new")).count()
    assert n_updates > 0 and n_inserts > 0
    before_rows = tiny_table.total_rows()

    m = merge_into(spark, tiny_table, src)
    after = scan(spark, tiny_table).cache()
    assert after.count() == before_rows + n_inserts
    # every correction won (matched keys carry the corrected text)
    joined = after.join(src.select("conv_id", "turn_idx", F.col("text").alias("src_text")),
                        ["conv_id", "turn_idx"])
    assert joined.where(F.col("text") != F.col("src_text")).count() == 0
    # untouched keys byte-identical
    untouched_before = tiny_df.join(
        src.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    ).select("conv_id", "turn_idx", "text")
    untouched_after = after.join(
        src.select("conv_id", "turn_idx"), ["conv_id", "turn_idx"], "left_anti"
    ).select("conv_id", "turn_idx", "text")
    assert_same_rows(untouched_before, untouched_after)
    after.unpersist()


def test_merge_prunes_files_after_clustering(spark, tiny_df, tiny_table):
    # cluster first so conv_id ranges are narrow per file, then a correction
    # batch touching ONE conversation must rewrite a strict subset of files
    cluster(spark, tiny_table, curve="zorder", target_bytes=24 * 1024)
    one_conv = tiny_df.where(F.col("conv_id") == "conv-000000000007").limit(3)
    src = one_conv.withColumn("text", F.lit("patched"))
    m = merge_into(spark, tiny_table, src)
    assert m["touched_files"] < m["total_files"]
    got = (
        scan(spark, tiny_table, conv_id="conv-000000000007")
        .where(F.col("text") == "patched")
        .count()
    )
    assert got == 3


def test_merge_dataflow_keep_latest_tiebreak(spark):
    rows = [
        ("c1", 0, "user", "old", None, "2024-01-01 00:00:00"),
        ("c1", 0, "user", "newer", None, "2024-01-02 00:00:00"),
        ("c1", 0, "user", "tie-a", None, "2024-01-03 00:00:00"),
        ("c1", 0, "user", "tie-b", None, "2024-01-03 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = dedup_keep_latest(df, ["conv_id", "turn_idx"]).collect()
    assert len(out) == 1
    assert out[0]["text"] in ("tie-a", "tie-b")
    # deterministic: same winner every run
    again = dedup_keep_latest(df, ["conv_id", "turn_idx"]).collect()[0]["text"]
    assert again == out[0]["text"]


def test_merge_upsert_dataframes_pure(spark):
    target = spark.createDataFrame(
        [("c1", 0, "u", "t0", None, "2024-01-01 00:00:00"),
         ("c1", 1, "a", "t1", None, "2024-01-01 00:01:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    source = spark.createDataFrame(
        [("c1", 1, "a", "t1-fixed", None, "2024-01-01 02:00:00"),
         ("c2", 0, "u", "new", None, "2024-01-01 03:00:00")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = merge_upsert_dataframes(target, source, ("conv_id", "turn_idx"))
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in out.collect()}
    assert got == {("c1", 0): "t0", ("c1", 1): "t1-fixed", ("c2", 0): "new"}


def test_touched_paths_numeric_key_native_compare(spark):
    """ADVICE r1: a lexicographic string compare would order '10' < '9'
    and miss the touched file for numeric keys; the range join must run
    in the stat values' native type."""
    from e_commerce_lakehouse_spark.operators.merge import _touched_paths
    from e_commerce_lakehouse_spark.table.meta import DataFileEntry

    class StubTable:
        def entries(self):
            return [
                DataFileEntry(path="data/f1.parquet", rows=10, bytes=1,
                              stats={"k": [9, 20]}),
                DataFileEntry(path="data/f2.parquet", rows=10, bytes=1,
                              stats={"k": [100, 120]}),
                DataFileEntry(path="data/f3.parquet", rows=10, bytes=1, stats={}),
            ]

    source = spark.createDataFrame([(10,)], "k long")
    touched = sorted(_touched_paths(spark, StubTable(), source, "k"))
    # f1 overlaps 10 (9<=10<=20); f2 does not; f3 has no stats -> touched
    assert touched == ["data/f1.parquet", "data/f3.parquet"]


def test_touched_paths_timestamp_key_micros(spark):
    """Timestamp keys compare as epoch micros (the manifest stat form)."""
    from e_commerce_lakehouse_spark.operators.merge import _touched_paths
    from e_commerce_lakehouse_spark.table.meta import DataFileEntry

    lo = 1_700_000_000 * 1_000_000
    hi = lo + 3_600 * 1_000_000

    class StubTable:
        def entries(self):
            return [
                DataFileEntry(path="data/t1.parquet", rows=1, bytes=1,
                              stats={"ts": [lo, hi]}),
                DataFileEntry(path="data/t2.parquet", rows=1, bytes=1,
                              stats={"ts": [hi + 1, hi + 10]}),
            ]

    source = spark.createDataFrame(
        [("2023-11-14 22:30:00",)], "ts string"
    ).withColumn("ts", F.to_timestamp("ts"))  # 1700001000 epoch — inside [lo, hi]
    touched = _touched_paths(spark, StubTable(), source, "ts")
    assert touched == ["data/t1.parquet"]
