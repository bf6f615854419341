"""Incrementally-maintained materialized aggregates (operators/matview.py).

Invariant under EVERY mutation class: after refresh, the view equals a
full recompute of the spec over the source's current snapshot. The
exact change feed (cdc poll_changes(exact=True)) must balance rewrite
re-emissions with delete pre-images, or carried-along rows double-count.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.matview import (
    create_matview,
    matview_spec,
    read_matview,
    refresh_matview,
)
from e_commerce_lakehouse_spark.operators.merge import merge_into
from e_commerce_lakehouse_spark.operators.rowlevel import delete_where, update_where
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.writer import write_files

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture()
def mv_pair(spark, tmp_path):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "source", "lang", "n_chars")
        # NULL group keys must aggregate as their own group end-to-end
        .withColumn("lang", F.when(F.col("doc_id") % 97 == 0, None)
                    .otherwise(F.col("lang")))
    )
    src = Table.create(str(tmp_path / "mv_src"))
    e = write_files(spark, src, docs.where("doc_id < 400"), 3, "seed",
                    stat_columns=("doc_id",))
    src.commit_append(e, {"op": "append"})
    view = create_matview(
        spark, src, str(tmp_path / "mv_view"), ["source", "lang"],
        {"n": ("count", "*"), "sum_chars": ("sum", "n_chars")},
        source_schema=docs.schema,
    )
    return docs, src, view


def _assert_view_is_recompute(spark, src, view, schema):
    truth = (
        scan(spark, src, schema=schema)
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("sum_chars"))
    )
    mv = read_matview(spark, view).select("source", "lang", "n", "sum_chars")
    assert mv.exceptAll(truth).count() == 0
    assert truth.exceptAll(mv).count() == 0


def test_matview_tracks_every_mutation_class(spark, mv_pair):
    docs, src, view = mv_pair
    sch = docs.schema

    def refresh_and_check(tag):
        refresh_matview(spark, src, view, source_schema=sch)
        _assert_view_is_recompute(spark, src, view, sch)

    e = write_files(spark, src, docs.where("doc_id >= 400 and doc_id < 470"),
                    2, "app2", stat_columns=("doc_id",))
    src.commit_append(e, {"op": "append"})
    refresh_and_check("append")

    delete_where(spark, src, "lang = 'de'", schema=sch, stat_columns=("doc_id",))
    refresh_and_check("cow-delete")

    delete_where(spark, src, "source = 'src1'", schema=sch,
                 mode="merge-on-read", keys=["doc_id"])
    refresh_and_check("mor-delete")

    # cow UPDATE rewrites whole touched files: carried-along rows re-emit
    # as inserts and MUST cancel against exact-mode delete pre-images
    update_where(spark, src, "lang = 'zh'", {"n_chars": "n_chars + 7"},
                 schema=sch, stat_columns=("doc_id",))
    refresh_and_check("cow-update")

    update_where(spark, src, "lang = 'fr'", {"n_chars": "n_chars * 2"},
                 schema=sch, mode="merge-on-read", keys=["doc_id"],
                 stat_columns=("doc_id",))
    refresh_and_check("mor-update")

    corr = docs.where("doc_id < 30 or (doc_id >= 470 and doc_id < 490)") \
               .withColumn("n_chars", F.col("n_chars") + 1000)
    merge_into(spark, src, corr, keys=["doc_id"], order_col=None,
               schema=sch, stat_columns=("doc_id",))
    refresh_and_check("merge-upsert")


def test_matview_multi_commit_single_refresh(spark, mv_pair):
    """One refresh applies a whole chain of source commits."""
    docs, src, view = mv_pair
    sch = docs.schema
    e = write_files(spark, src, docs.where("doc_id >= 400"), 2, "app2",
                    stat_columns=("doc_id",))
    src.commit_append(e, {"op": "append"})
    delete_where(spark, src, "n_chars < 150", schema=sch, stat_columns=("doc_id",))
    update_where(spark, src, "lang = 'en'", {"n_chars": "n_chars + 1"},
                 schema=sch, stat_columns=("doc_id",))
    out = refresh_matview(spark, src, view, source_schema=sch)
    assert out["noop"] is False
    _assert_view_is_recompute(spark, src, view, sch)


def test_matview_physical_commit_advances_metadata_only(spark, mv_pair):
    docs, src, view = mv_pair
    files_before = sorted(e.path for e in view.entries())
    r = compact(spark, src, target_bytes=1 << 26, schema=docs.schema,
                stat_columns=("doc_id",))
    assert not r.get("noop"), "compact must actually commit for this test"
    out = refresh_matview(spark, src, view, source_schema=docs.schema)
    assert out.get("delta") == "empty"
    # cursor advanced, view files byte-identical
    assert view.snapshot().summary["matview_to_sid"] == src.current_snapshot_id()
    assert sorted(e.path for e in view.entries()) == files_before
    _assert_view_is_recompute(spark, src, view, docs.schema)


def test_matview_refresh_idempotent_when_caught_up(spark, mv_pair):
    docs, src, view = mv_pair
    assert refresh_matview(spark, src, view, source_schema=docs.schema)["noop"]
    sid = view.current_snapshot_id()
    assert refresh_matview(spark, src, view, source_schema=docs.schema)["noop"]
    assert view.current_snapshot_id() == sid  # no empty commits


def test_matview_rejects_non_additive_aggs(spark, mv_pair, tmp_path):
    docs, src, _ = mv_pair
    with pytest.raises(ValueError, match="not additively maintainable"):
        create_matview(spark, src, str(tmp_path / "v2"), ["source"],
                       {"m": ("min", "n_chars")}, source_schema=docs.schema)


def test_matview_rejects_wrong_source(spark, mv_pair, tmp_path):
    docs, src, view = mv_pair
    other = Table.create(str(tmp_path / "other_src"))
    e = write_files(spark, other, docs.limit(10), 1, "seed",
                    stat_columns=("doc_id",))
    other.commit_append(e, {"op": "append"})
    with pytest.raises(ValueError, match="materialized over"):
        refresh_matview(spark, other, view, source_schema=docs.schema)


def test_matview_spec_roundtrip(mv_pair):
    _, _, view = mv_pair
    spec = matview_spec(view)
    assert spec["group_by"] == ["source", "lang"]
    assert spec["aggs"] == {"n": ["count", "*"], "sum_chars": ["sum", "n_chars"]}


def test_matview_group_death_and_rebirth(spark, mv_pair):
    """A group whose count reaches zero must LEAVE the view, and come
    back if rows for it are appended again."""
    docs, src, view = mv_pair
    sch = docs.schema
    langs = lambda: {r[0] for r in read_matview(spark, view)  # noqa: E731
                     .select("lang").distinct().collect()}
    assert "de" in langs()
    delete_where(spark, src, "lang = 'de'", schema=sch, stat_columns=("doc_id",))
    refresh_matview(spark, src, view, source_schema=sch)
    assert "de" not in langs()
    back = docs.where("lang = 'de' and doc_id < 50")
    e = write_files(spark, src, back, 1, "rebirth", stat_columns=("doc_id",))
    src.commit_append(e, {"op": "append"})
    refresh_matview(spark, src, view, source_schema=sch)
    assert "de" in langs()
    _assert_view_is_recompute(spark, src, view, sch)


def test_matview_survives_maintenance_commit_on_the_view(spark, mv_pair):
    """The view is a normal table: a rewrite-manifests commit on it must
    not brick refresh (review finding: head-summary indexing raised
    KeyError — the cursor now chain-walks)."""
    from e_commerce_lakehouse_spark.operators.manifest_rewrite import rewrite_manifests

    docs, src, view = mv_pair
    rewrite_manifests(view)  # head summary now lacks matview_to_sid
    e = write_files(spark, src, docs.where("doc_id >= 400 and doc_id < 430"),
                    1, "post-maint", stat_columns=("doc_id",))
    src.commit_append(e, {"op": "append"})
    out = refresh_matview(spark, src, view, source_schema=docs.schema)
    assert out["noop"] is False
    _assert_view_is_recompute(spark, src, view, docs.schema)
