"""Bloom-filter point-lookup skipping index (_bloom.py, Table.set_bloom_columns).

Delta bloom-filter-index / Iceberg puffin analog: min/max stats cannot
prune append-vintage files (each spans nearly the whole conv_id range);
the per-file bloom prunes by MEMBERSHIP. Correctness bar: a bloom may
only ever cause a file to be SKIPPED when the key is definitely absent —
zero false negatives, scans return identical rows with and without it.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark._bloom import bloom_contains, build_bloom
from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.manifest_rewrite import rewrite_manifests
from e_commerce_lakehouse_spark.synth import transcripts_df
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.scan import planned_entries
from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

from tests.conftest import assert_same_rows

# lexically INSIDE every file's conv-id range but never generated
# (synth ids are conv-%012d with no suffix; tiny_df spans ~199 convs, so
# a key between conv-...099 and conv-...100 sits above every file's min
# and below every file's max)
ABSENT_IN_RANGE = "conv-000000000099-absent"


@pytest.fixture()
def bloom_table(spark, tiny_df, tmp_path):
    """4 append commits split by conv-id HASH: every file spans nearly the
    whole conv RANGE (min/max useless) but holds a disjoint conv SET —
    the exact shape the bloom index exists for."""
    root = str(tmp_path / "bloomtbl")
    shutil.rmtree(root, ignore_errors=True)
    t = Table.create(root)
    t.set_bloom_columns(["conv_id"])
    from e_commerce_lakehouse_spark.table.writer import write_files

    for i in range(4):
        part = tiny_df.where(F.abs(F.hash("conv_id")) % 4 == i)
        entries = write_files(spark, t, part, 2, f"ingest-0000000{i}-0000")
        t.commit_append(entries, {"op": f"ingest-{i}"})
    return t


def test_bloom_unit_no_false_negatives_and_low_fpp():
    vals = [f"conv-{i:012d}" for i in range(2000)]
    b = build_bloom(vals, fpp=0.01)
    assert all(bloom_contains(b, v) for v in vals)  # NEVER a false negative
    fp = sum(bloom_contains(b, f"other-{i}") for i in range(10_000))
    assert fp / 10_000 < 0.03  # ~1% target with deterministic slack


def test_entries_carry_blooms_and_manifest_roundtrip(bloom_table):
    entries = bloom_table.entries()
    assert all(e.blooms and "conv_id" in e.blooms for e in entries)
    # parquet manifest column exists and survives materialization
    import pyarrow.parquet as pq

    m = bloom_table.snapshot().manifests[-1]
    names = pq.read_schema(os.path.join(bloom_table.metadata_dir, m)).names
    assert "bloom_conv_id" in names


def test_point_scan_prunes_absent_key_where_minmax_cannot(bloom_table):
    # every append file spans nearly the whole conv range -> min/max keeps
    # them all; the bloom must prune ALL files for an in-range absent key
    from e_commerce_lakehouse_spark.table.scan import prune_entries

    entries = bloom_table.entries()
    minmax_kept = prune_entries(
        [type(e)(e.path, e.rows, e.bytes, e.stats, e.seq, e.partition, None)
         for e in entries],
        conv_id=ABSENT_IN_RANGE,
    )
    assert len(minmax_kept) == len(entries)  # min/max alone prunes nothing
    planned = planned_entries(bloom_table, conv_id=ABSENT_IN_RANGE)
    assert planned == []  # bloom prunes everything


def test_point_scan_correctness_present_key(spark, bloom_table, tiny_df):
    key = tiny_df.select("conv_id").first()[0]
    got = scan(spark, bloom_table, conv_id=key)
    expect = scan(spark, bloom_table).where(F.col("conv_id") == key)
    assert got.count() == expect.count() > 0
    assert_same_rows(got, expect)
    # the conv lives in ONE hash bucket (2 of 8 files); min/max alone
    # keeps all 8 — the bloom must skip the other buckets
    assert len(planned_entries(bloom_table, conv_id=key)) <= 3
    assert len(bloom_table.entries()) == 8


def test_every_written_key_survives_bloom_pruning(spark, bloom_table):
    """Zero-false-negative sweep: EVERY live conv_id must plan >=1 file."""
    keys = [r[0] for r in scan(spark, bloom_table).select("conv_id").distinct().collect()]
    missed = [k for k in keys if not planned_entries(bloom_table, conv_id=k)]
    assert missed == []


def test_compact_outputs_carry_blooms(spark, bloom_table):
    compact(spark, bloom_table, target_bytes=1 << 20)
    entries = bloom_table.entries()
    assert all(e.blooms and "conv_id" in e.blooms for e in entries)
    assert planned_entries(bloom_table, conv_id=ABSENT_IN_RANGE) == []


def test_rewrite_manifests_preserves_blooms(spark, bloom_table):
    rewrite_manifests(bloom_table)
    assert planned_entries(bloom_table, conv_id=ABSENT_IN_RANGE) == []
    assert all(e.blooms for e in bloom_table.entries())


def test_json_codec_roundtrip(spark, tiny_df, tmp_path):
    from e_commerce_lakehouse_spark.table import meta as M

    old = M.MANIFEST_CODEC
    M.MANIFEST_CODEC = "json"
    try:
        root = str(tmp_path / "jsontbl")
        t = Table.create(root)
        t.set_bloom_columns(["conv_id"])
        from e_commerce_lakehouse_spark.table.writer import write_files

        entries = write_files(spark, t, tiny_df.limit(500), 3, "ingest-j")
        t.commit_append(entries, {"op": "ingest"})
        assert all(e.blooms for e in t.entries())
        # limit() files share one conv set -> identical blooms, so a single
        # probe key is one correlated ~0.4% fp draw; pick a key the blooms
        # themselves report absent (exists by the measured fp rate)
        key = next(
            k for k in (f"conv-000000000099-absent-{j}" for j in range(50))
            if not any(bloom_contains(e.blooms["conv_id"], k) for e in t.entries())
        )
        assert planned_entries(t, conv_id=key) == []
    finally:
        M.MANIFEST_CODEC = old


def test_undeclared_table_unaffected(spark, tiny_table):
    """No bloom spec -> no bloom columns, planner conservative as before."""
    assert tiny_table.bloom_spec() == {}
    assert all(e.blooms is None for e in tiny_table.entries())
    key = scan(spark, tiny_table).select("conv_id").first()[0]
    assert len(planned_entries(tiny_table, conv_id=key)) >= 1


def test_pre_declaration_files_stay_conservative(spark, tiny_table, tiny_df):
    """Declaring the index on a table WITH data: old files keep no bloom
    (kept conservatively); new appends carry one — Delta backfill shape."""
    tiny_table.set_bloom_columns(["conv_id"])
    from e_commerce_lakehouse_spark.table.writer import write_files

    extra = tiny_df.limit(200)
    entries = write_files(spark, tiny_table, extra, 2, "ingest-post-decl")
    tiny_table.commit_append(entries, {"op": "post-decl"})
    by_bloom = [e.blooms is not None for e in tiny_table.entries()]
    assert any(by_bloom) and not all(by_bloom)
    # absent key: old files kept (no bloom), new files pruned
    planned = planned_entries(tiny_table, conv_id=ABSENT_IN_RANGE)
    assert all(e.blooms is None for e in planned)
    # compaction backfills: afterwards every live file has a bloom
    compact(spark, tiny_table, target_bytes=1 << 20)
    assert all(e.blooms for e in tiny_table.entries())
    assert planned_entries(tiny_table, conv_id=ABSENT_IN_RANGE) == []


def test_generic_eq_point_pruning_non_transcript_column(spark, tmp_path):
    """scan(eq={col: value}): point skipping for ANY stat-tracked +
    bloom-indexed column — here an int64 doc_id on a documents-shaped
    table (no conv_id anywhere)."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet") \
        .select("doc_id", "source", "lang", "n_chars")
    t = Table.create(str(tmp_path / "eqtbl"))
    t.set_bloom_columns(["doc_id"])
    from e_commerce_lakehouse_spark.table.writer import write_files

    for i in range(4):
        part = docs.where(F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(4)) == i)
        entries = write_files(spark, t, part, 2, f"eq-{i}", stat_columns=("doc_id",))
        t.commit_append(entries, {"op": f"eq-{i}"})
    total = len(t.entries())
    # every file spans nearly the full doc_id range; the bloom must cut
    # the plan down to (about) the key's own bucket
    kept = planned_entries(t, eq={"doc_id": 123})
    assert 0 < len(kept) < total
    got = scan(spark, t, eq={"doc_id": 123}, schema=docs.schema)
    want = scan(spark, t, schema=docs.schema).where("doc_id = 123")
    assert_same_rows(got, want)
    assert got.count() == 1
    # int out of every file's range: stats alone prune to zero
    assert planned_entries(t, eq={"doc_id": 10**12}) == []
    # a FLOAT probe must NOT bloom-probe (str(123.0) != str(123) — a
    # false negative hazard): plan stays conservative and the row filter
    # still finds the value under SQL numeric-equality semantics
    assert len(planned_entries(t, eq={"doc_id": 123.0})) == total
    got_f = scan(spark, t, eq={"doc_id": 123.0}, schema=docs.schema)
    assert got_f.count() == 1


def test_build_bloom_odd_max_bits_no_crash():
    """A cap not divisible by 64 must round DOWN, never index past the
    bitmap (review finding: 1001 -> bytearray(125) but pos up to 1000)."""
    vals = [f"v-{i}" for i in range(5000)]
    b = build_bloom(vals, fpp=0.01, max_bits=1001)
    assert b["m"] == 960 and b["m"] % 64 == 0
    assert all(bloom_contains(b, v) for v in vals)  # probes don't crash either


def test_eq_conv_id_stat_pruning_without_range(spark, tiny_df, tmp_path):
    """conv_id arriving ONLY via eq= must still stat-prune (review
    finding: the dedup guard skipped _overlaps entirely)."""
    from e_commerce_lakehouse_spark.table import meta as M
    from e_commerce_lakehouse_spark.table.writer import write_files

    old = M.MANIFEST_CODEC
    M.MANIFEST_CODEC = "json"  # exercises the prune_entries (non-arrow) path
    try:
        t = Table.create(str(tmp_path / "eqconvtbl"))
        sorted_df = tiny_df.orderBy("conv_id").coalesce(1)
        entries = write_files(spark, t, sorted_df.where("conv_id < 'conv-000000000100'"),
                              1, "lo")
        t.commit_append(entries, {"op": "lo"})
        entries = write_files(spark, t, sorted_df.where("conv_id >= 'conv-000000000100'"),
                              1, "hi")
        t.commit_append(entries, {"op": "hi"})
        kept = planned_entries(t, eq={"conv_id": "conv-000000000002"})
        assert len(kept) == 1  # the hi file's [min,max] excludes the key
    finally:
        M.MANIFEST_CODEC = old


def test_verify_table_bloom_audit(spark, bloom_table):
    """Doctor opt-in: a healthy index audits clean; a tampered bloom (one
    file's bloom swapped for another's) is flagged as bloom-mismatch."""
    from e_commerce_lakehouse_spark.operators.verify import verify_table

    ok = verify_table(bloom_table, spark=spark, check_blooms=True)
    assert ok["ok"] and ok["bloom_mismatches"] == 0
    # tamper: give file 0 the bloom of file 1 (disjoint conv sets), commit
    entries = bloom_table.entries()
    entries[0].blooms = dict(entries[1].blooms)
    names = [bloom_table.write_manifest_for(entries, 0)]
    bloom_table.commit_manifests(names, operation="reset")
    bad = verify_table(bloom_table, spark=spark, check_blooms=True)
    assert not bad["ok"] and bad["bloom_mismatches"] >= 1
    assert any(i["kind"] == "bloom-mismatch" and i["false_negatives"] > 0
               for i in bad["issues"])
    # default (no data pages) still passes: blooms are opt-in to audit
    assert verify_table(bloom_table, spark=spark)["bloom_mismatches"] == 0
