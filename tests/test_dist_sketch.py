"""Distribution sketches: per-file equi-width histograms + count-min,
merged table-level from manifests with ZERO data reads (operators/
sketch.table_histogram / table_quantiles / cm_estimate / heavy_hitters).

Invariants under test:
- per-file bin counts merge by SUM into the EXACT whole-table histogram
  (verified against a brute-force binning of the full data);
- quantile interpolation is within one bin width of the true quantile;
- count-min estimates NEVER underestimate (guaranteed upper bound), and
  the heavy-hitter candidate filter never drops a true heavy hitter;
- rewrites (compact) re-sketch outputs so coverage heals;
- spec drift and renames of sketched columns are refused.
"""

import pytest

from e_commerce_lakehouse_spark._footer_stats import (
    cm_rows,
    hist_counts,
    topk_counts,
)


def test_hist_counts_edges():
    # [under, b0, b1, b2, b3, over] for lo=0, hi=4, bins=4
    vals = [-1.0, 0.0, 0.5, 1.0, 3.999, 4.0, 7.0]
    cnts = [2, 1, 1, 1, 1, 1, 3]
    out = hist_counts(vals, cnts, 0.0, 4.0, 4)
    assert out == [2, 2, 1, 0, 1, 4]
    assert sum(out) == sum(cnts)


def test_cm_rows_never_underestimate_and_merge():
    vals = list(range(50))
    cnts = [v + 1 for v in vals]
    w, d = 16, 3
    m = cm_rows(vals, cnts, w, d)
    # split the same stream in two and merge: identical matrix
    m1 = cm_rows(vals[:25], cnts[:25], w, d)
    m2 = cm_rows(vals[25:], cnts[25:], w, d)
    merged = [[a + b for a, b in zip(r1, r2)] for r1, r2 in zip(m1, m2)]
    assert merged == m
    # estimates >= truth for every value
    import hashlib

    for v, c in zip(vals, cnts):
        est = min(
            m[j][int(hashlib.md5(f"{j}|{v}".encode()).hexdigest()[:15], 16) % w]
            for j in range(d)
        )
        assert est >= c


def test_topk_deterministic_tiebreak():
    assert topk_counts(["b", "a", "c"], [2, 2, 1], 2) == [["a", 2], ["b", 2]]


@pytest.fixture(scope="module")
def dist_table(spark, tmp_path_factory):
    """documents table with hist(n_chars) + cm(lang) declared after one
    legacy file, then appended and compacted."""
    from e_commerce_lakehouse_spark.operators.compact import compact
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import (
        append_dataframe,
        write_files,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path_factory.mktemp("dist") / "tbl")
    t = Table.create(root)
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    entries = write_files(spark, t, docs.limit(20), 1, "legacy-0000",
                          stat_columns=("doc_id",))
    t.commit_append(entries, {"op": "pre-spec"})  # legacy: no sketch
    t.set_histogram_columns({"n_chars": (0.0, 2000.0, 40)})
    t.set_cm_columns(["lang"], w=64, d=3, topk=4)
    append_dataframe(spark, t, docs.exceptAll(docs.limit(20)))
    pre = t.current_snapshot_id()
    compact(spark, t, target_bytes=1 << 20, stat_columns=("doc_id",))
    return t, docs, pre


def test_merged_histogram_is_exact(spark, dist_table):
    from e_commerce_lakehouse_spark.operators.sketch import table_histogram

    t, docs, pre = dist_table
    # BEFORE compact: the legacy file is uncovered
    h_pre = table_histogram(t, "n_chars", snapshot_id=pre)
    assert h_pre["files_missing"] == 1
    # AFTER compact: full coverage, merged == brute-force binning
    h = table_histogram(t, "n_chars")
    assert h["files_missing"] == 0
    rows = docs.select("n_chars").collect()
    brute = [0] * 42
    for r in rows:
        x = float(r[0])
        if x < 0.0:
            brute[0] += 1
        elif x >= 2000.0:
            brute[41] += 1
        else:
            brute[1 + min(39, int(x * 40 / 2000.0))] += 1
    assert h["counts"] == brute
    assert h["total"] == docs.where("n_chars IS NOT NULL").count()


def test_quantile_estimates_within_bin_width(spark, dist_table):
    from e_commerce_lakehouse_spark.operators.sketch import table_quantiles

    t, docs, _pre = dist_table
    qs = [0.25, 0.5, 0.75, 0.95, 1.0]
    ests = dict(table_quantiles(t, "n_chars", qs))
    vals = sorted(r[0] for r in docs.select("n_chars").collect())
    n = len(vals)
    bin_w = 2000.0 / 40
    for q in qs:
        true_q = vals[min(n - 1, max(0, int(q * n) - 1))]
        assert abs(ests[q] - true_q) <= bin_w + 1e-9, (q, ests[q], true_q)
    with pytest.raises(ValueError):
        table_quantiles(t, "n_chars", [0.0])


def test_cm_upper_bound_and_heavy_hitters(spark, dist_table):
    from e_commerce_lakehouse_spark.operators.sketch import (
        cm_estimate,
        heavy_hitters,
        table_cm,
    )

    t, docs, _pre = dist_table
    truth = {
        str(r[0]): r[1]
        for r in docs.groupBy("lang").count().collect()
        if r[0] is not None
    }
    cm = table_cm(t, "lang")
    assert cm["files_missing"] == 0
    ests = dict(cm_estimate(t, "lang", list(truth)))
    for v, c in truth.items():
        assert ests[v] >= c  # count-min never underestimates
    thresh = sorted(truth.values())[-2]  # second-highest true count
    hh = heavy_hitters(t, "lang", thresh)
    hh_vals = {v for v, _ in hh}
    for v, c in truth.items():
        if c >= thresh:
            assert v in hh_vals  # no true heavy hitter dropped
    # exact verify leg: one scan filtered to candidates confirms counts
    cand = list(hh_vals)
    verified = {
        str(r[0]): r[1]
        for r in docs.where(docs.lang.isin(cand)).groupBy("lang").count().collect()
    }
    for v, est in hh:
        assert est >= verified.get(v, 0)


def test_spec_drift_refused(spark, tmp_path):
    from e_commerce_lakehouse_spark.operators.sketch import table_histogram
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "drift")
    t = Table.create(root)
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    append_dataframe(spark, t, docs.limit(5))  # pre-spec seed commit
    t.set_histogram_columns({"n_chars": (0.0, 100.0, 10)})
    append_dataframe(spark, t, docs.limit(10))
    t.set_histogram_columns({"n_chars": (0.0, 200.0, 10)})
    append_dataframe(spark, t, docs.limit(10))
    with pytest.raises(ValueError, match="spec drift"):
        table_histogram(t, "n_chars")


def test_rename_of_sketched_column_refused(spark, tmp_path):
    from e_commerce_lakehouse_spark.operators.schema_evolution import (
        rename_column,
    )
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    root = str(tmp_path / "ren")
    t = Table.create(root)
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    t.set_cm_columns(["lang"])
    append_dataframe(spark, t, docs.limit(10))
    with pytest.raises(ValueError, match="distribution-sketch"):
        rename_column(t, "lang", "language")


def test_branch_declaration_refused(spark, tmp_path):
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = Table.create(str(tmp_path / "br"))
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    append_dataframe(spark, t, docs.limit(5))
    t.create_branch("dev")
    b = Table.load(str(tmp_path / "br"), branch="dev")
    with pytest.raises(ValueError, match="branch"):
        b.set_histogram_columns({"x": (0.0, 1.0)})
    with pytest.raises(ValueError, match="branch"):
        b.set_cm_columns(["x"])


def test_hist_nan_excluded_like_null_and_nonnumeric_refused():
    out = hist_counts([float("nan"), 1.0], [5, 2], 0.0, 4.0, 4)
    assert out == [0, 0, 2, 0, 0, 0]  # NaN rows contribute to no bin
    with pytest.raises(ValueError, match="non-numeric"):
        hist_counts(["abc"], [1], 0.0, 4.0, 4)


def test_verify_audits_dist_sketches(spark, dist_table):
    from e_commerce_lakehouse_spark.operators.verify import verify_table

    t, _docs, _pre = dist_table
    r = verify_table(t, check_blooms=True)
    assert r["dist_mismatches"] == 0
    # corrupt one file's stored histogram -> the audit flags it
    import json as _json

    import os as _os

    entries = t.entries()
    e = next(e for e in entries if e.dist and "n_chars" in e.dist)
    e.dist["n_chars"]["hist"]["counts"][1] += 1  # in-memory corruption
    sid = t.current_snapshot_id()
    snap = t.snapshot(sid)
    # rewrite the snapshot onto ONE manifest holding the tampered entries
    snap.manifests = [t._write_manifest(sid, 998, entries)]
    snap.removed_files = []
    tmp = t._snap_path(sid) + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(snap.to_dict(), f)
    _os.replace(tmp, t._snap_path(sid))
    t._entries_cache.clear()
    r2 = verify_table(t, check_blooms=True)
    assert r2["dist_mismatches"] == 1
    assert any(i["kind"] == "dist-sketch-mismatch" for i in r2["issues"])


def test_histogram_drift_and_spec_change_refused(spark, tmp_path):
    from e_commerce_lakehouse_spark.operators.sketch import (
        histogram_drift,
        table_histogram,
    )
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import append_dataframe

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = Table.create(str(tmp_path / "drift2"))
    t.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    t.set_histogram_columns({"n_chars": (0.0, 600.0, 6)})
    append_dataframe(spark, t, docs.limit(30))
    append_dataframe(spark, t, docs.exceptAll(docs.limit(30)))
    s1, s2 = t.snapshot_ids()
    rows = histogram_drift(t, "n_chars", from_snapshot=s1, to_snapshot=s2)
    assert len(rows) == 8  # grid incl. under/overflow
    # deltas sum to the appended row count; n_to is the full histogram
    assert sum(d for _b, _a, _t, d in rows) == docs.count() - 30
    assert [nt for _b, _a, nt, _d in rows] == table_histogram(t, "n_chars")["counts"]
    # no sketch at a snapshot -> clear error
    t2 = Table.create(str(tmp_path / "nospec"))
    t2.append_schema_version(docs.schema.jsonValue(), as_of_snapshot=0)
    append_dataframe(spark, t2, docs.limit(5))
    append_dataframe(spark, t2, docs.limit(5))
    a, b = t2.snapshot_ids()
    with pytest.raises(ValueError, match="no histogram sketch"):
        histogram_drift(t2, "n_chars", from_snapshot=a, to_snapshot=b)
