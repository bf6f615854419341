"""Concurrent-writer stress: maintenance + appends + MoR deletes racing.

The commit protocol claims (table/meta.py): the O_EXCL lock serializes
read-parent→flip; rewrite commits conflict (CommitConflictError) instead
of double-tombstoning files a concurrent writer already rewrote; the
tombstone-changed guard stops a rewrite from stamping outputs exempt from
a newer MoR tombstone. This test exercises those guards under REAL
thread-level concurrency rather than the staged two-writer sequences in
test_commit_conflict.py, and asserts the end state a user cares about:
exactly (initial ∪ appended) − deleted, full-row equality (the north
rule's per-turn text-equality invariant), with a clean doctor audit.

Spark note: one shared local SparkSession; concurrent jobs from threads
are a supported Spark pattern (separate job groups per action).
"""

from __future__ import annotations

import os
import shutil
import threading

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.rowlevel import delete_where
from e_commerce_lakehouse_spark.operators.verify import verify_table
from e_commerce_lakehouse_spark.pipeline import with_retries
from e_commerce_lakehouse_spark.synth import transcripts_df
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.writer import create_transcripts_table, write_files

from tests.conftest import assert_same_rows

DELETE_PRED = "turn_idx = 0 AND conv_id <= 'conv-000000000199'"


def _appender(spark, root, batches, errors):
    try:
        for i, df in enumerate(batches):
            t = Table.load(root)
            entries = write_files(spark, t, df, 2, f"app-{i:04d}")
            # appends never remove files, so the only contention is the
            # commit lock itself (blocking, built-in retry); retries here
            # only absorb transient fs hiccups
            with_retries(lambda: t.commit_append(entries, {"op": f"app-{i}"}),
                         attempts=3, backoff_s=0.2)
    except Exception as e:  # noqa: BLE001 — surfaced via the errors list
        errors.append(("appender", e))


def _compactor(spark, root, errors):
    try:
        for _ in range(3):
            # re-plan from the head on CommitConflictError: fresh
            # Table.load per attempt is the documented retry contract
            with_retries(
                lambda: compact(spark, Table.load(root), target_bytes=1 << 20),
                attempts=5, backoff_s=0.2,
            )
    except Exception as e:  # noqa: BLE001
        errors.append(("compactor", e))


def _deleter(spark, root, errors):
    try:
        with_retries(
            lambda: delete_where(spark, Table.load(root), DELETE_PRED,
                                 mode="merge-on-read"),
            attempts=5, backoff_s=0.2,
        )
    except Exception as e:  # noqa: BLE001
        errors.append(("deleter", e))


def test_concurrent_append_compact_mor_delete(spark, tmp_path):
    root = str(tmp_path / "tbl")
    shutil.rmtree(root, ignore_errors=True)
    initial = transcripts_df(spark, 8_000, seed=11).cache()
    initial.count()
    create_transcripts_table(spark, root, initial, rows_per_file=250,
                             n_append_commits=2)

    # appended conversations get a prefix that sorts ABOVE the delete
    # predicate's conv_id bound so the predicate can never match them —
    # the final state is deterministic under EVERY interleaving (an
    # 'app-' prefix sorted BELOW 'conv-…' and made turn_idx=0 appends
    # race the delete)
    appended = (
        transcripts_df(spark, 2_000, seed=12)
        .withColumn("conv_id", F.concat(F.lit("zapp-"), F.col("conv_id")))
        .cache()
    )
    appended.count()
    # pmod, not %: xxhash64 is signed and Spark's % keeps the sign, so
    # negative-hash rows would fall in NO batch
    batches = [appended.where(F.pmod(F.xxhash64("conv_id"), F.lit(4)) == i).cache()
               for i in range(4)]
    for b in batches:
        b.count()

    errors: list = []
    threads = [
        threading.Thread(target=_appender, args=(spark, root, batches, errors)),
        threading.Thread(target=_compactor, args=(spark, root, errors)),
        threading.Thread(target=_deleter, args=(spark, root, errors)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "writer thread hung"
    assert not errors, f"writer failed after retries: {errors}"

    table = Table.load(root)
    final = scan(spark, table)
    expected = initial.unionByName(appended).where(f"NOT ({DELETE_PRED})")
    assert_same_rows(final, expected)

    # no duplicate keys anywhere (the lost-update signature)
    dup = (final.groupBy("conv_id", "turn_idx").count()
           .where("count > 1").count())
    assert dup == 0

    # doctor audit: manifests, footers, stats all consistent
    report = verify_table(table, spark=spark)
    assert report["ok"], report["issues"][:5]

    # every commit landed: 3 initial (create+2 appends) + 4 appends +
    # 1 delete; compaction may legitimately have NOOP'd under some
    # interleavings (every racey attempt re-planned past a conflict into
    # empty work), so the compact floor is asserted DETERMINISTICALLY:
    # one post-race compact must either commit now (the racey ones all
    # noop'd over 30+ small files — it has work) or noop because a racey
    # one already packed the table (then >=9 snapshots already exist).
    assert len(table.snapshot_ids()) >= 8
    compact(spark, Table.load(root), target_bytes=1 << 20)
    table = Table.load(root)
    sids = table.snapshot_ids()
    assert len(sids) >= 9
    chain = set()
    sid = table.current_snapshot_id()
    while sid is not None:
        assert sid not in chain, "cycle in snapshot chain"
        chain.add(sid)
        sid = table.snapshot(sid).parent_id
    assert chain == set(sids), "orphaned snapshot outside the head chain"


def test_lock_wait_serializes_concurrent_appends_without_retries(spark, tmp_path):
    """lock_wait_s > 0: N concurrent appenders all land with ZERO caller
    retry loops — contention becomes transparent serialization (the
    parent is re-read inside the lock, so appends never conflict
    semantically). Default 0 keeps fail-fast
    (test_commit_lock_enforces_single_writer)."""
    from e_commerce_lakehouse_spark.synth import transcripts_df

    root = str(tmp_path / "lockwait_tbl")
    df = transcripts_df(spark, 2_000, seed=11).cache()
    create_transcripts_table(spark, root, df, rows_per_file=1_000)
    batches = [df.limit(200) for _ in range(3)]
    errors: list = []

    def _worker(i):
        try:
            t = Table.load(root, lock_wait_s=30.0)
            entries = write_files(spark, t, batches[i], 1, f"lw-{i:02d}")
            t.commit_append(entries, {"op": f"lw-{i}"})  # NO with_retries
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=_worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors
    table = Table.load(root)
    # all three appends landed on a linear chain
    assert table.current_snapshot_id() == 4  # create(1) + 3 appends
    assert scan(spark, table).count() == 2_000 + 3 * 200


def test_compact_rebases_past_concurrent_rewrite(spark, tmp_path, monkeypatch):
    """Automatic rebase (r4 verdict #4): a cow DELETE rewrites one of
    compaction's input files between its plan and its commit. Compact
    must NOT raise CommitConflictError — it drops exactly the conflicted
    group(s), deletes their uncommitted outputs, and recommits the
    disjoint remainder against the new head. Final state = delete's."""
    root = str(tmp_path / "tbl")
    initial = transcripts_df(spark, 4_000, seed=41).cache()
    initial.count()
    create_transcripts_table(spark, root, initial, rows_per_file=200,
                             n_append_commits=2)
    t1 = Table.load(root)
    victim_conv = scan(spark, t1).select("conv_id").orderBy("conv_id").first()[0]
    pred = f"conv_id = '{victim_conv}'"

    orig = Table.commit_rewrite
    raced = {"fired": False}

    def hooked(self, removed_paths, added, **kw):
        if self is t1 and not raced["fired"]:
            raced["fired"] = True
            # concurrent writer lands a cow DELETE that rewrites files
            # compact planned as inputs — compact's commit now conflicts
            delete_where(spark, Table.load(root), pred)
        return orig(self, removed_paths, added, **kw)

    monkeypatch.setattr(Table, "commit_rewrite", hooked)
    m = compact(spark, t1, target_bytes=1 << 20)  # no caller retry
    assert raced["fired"]
    assert m.get("rebase_dropped_groups", 0) >= 1

    table = Table.load(root)
    final = scan(spark, table)
    assert_same_rows(final, initial.where(f"NOT ({pred})"))
    dup = (final.groupBy("conv_id", "turn_idx").count()
           .where("count > 1").count())
    assert dup == 0
    # the dropped groups' uncommitted outputs were deleted, not orphaned
    # (orphan_files also counts Spark's _SUCCESS/.crc sidecars — check
    # that no orphaned PARQUET data file exists)
    report = verify_table(table, spark=spark)
    assert report["ok"], report["issues"][:5]
    referenced = {e.path for s in table.snapshot_ids()
                  for e in table.entries(s)}
    leaked = [
        os.path.relpath(os.path.join(dirpath, fn), table.root)
        for dirpath, _dirs, files in os.walk(table.data_dir)
        for fn in files
        if fn.endswith(".parquet")
        and os.path.relpath(os.path.join(dirpath, fn), table.root)
        not in referenced
    ]
    assert not leaked, f"rebase leaked uncommitted outputs: {leaked[:5]}"


def test_compact_vs_append_race_without_caller_retry(spark, tmp_path):
    """compact() called DIRECTLY (no with_retries wrapper) while an
    appender races it: lock contention is absorbed by compact's bounded
    internal retry, so both writers land and the final state is exact."""
    root = str(tmp_path / "tbl")
    initial = transcripts_df(spark, 6_000, seed=43).cache()
    initial.count()
    create_transcripts_table(spark, root, initial, rows_per_file=200,
                             n_append_commits=2)
    appended = (
        transcripts_df(spark, 1_500, seed=44)
        .withColumn("conv_id", F.concat(F.lit("zapp-"), F.col("conv_id")))
        .cache()
    )
    appended.count()
    batches = [appended.where(F.pmod(F.xxhash64("conv_id"), F.lit(3)) == i).cache()
               for i in range(3)]
    for b in batches:
        b.count()

    errors: list = []

    def _bare_compactor():
        try:
            for _ in range(3):
                compact(spark, Table.load(root), target_bytes=1 << 20)
        except Exception as e:  # noqa: BLE001
            errors.append(("compactor", e))

    threads = [
        threading.Thread(target=_appender, args=(spark, root, batches, errors)),
        threading.Thread(target=_bare_compactor),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not any(t.is_alive() for t in threads), "writer thread hung"
    assert not errors, f"writer failed: {errors}"

    table = Table.load(root)
    assert_same_rows(scan(spark, table), initial.unionByName(appended))
    report = verify_table(table, spark=spark)
    assert report["ok"], report["issues"][:5]


def test_cluster_rebases_whole_plan_past_concurrent_rewrite(
    spark, tmp_path, monkeypatch
):
    """Cluster's conflict rebase (r5): unlike compact's independent
    groups, cluster's output is ONE globally-sorted rewrite — a cow
    DELETE landing between plan and commit invalidates the whole plan.
    cluster() must delete its uncommitted outputs and re-run from the
    new head instead of raising; final state = delete's, clustered."""
    from e_commerce_lakehouse_spark.operators.cluster import cluster

    root = str(tmp_path / "tbl")
    initial = transcripts_df(spark, 4_000, seed=47).cache()
    initial.count()
    create_transcripts_table(spark, root, initial, rows_per_file=200,
                             n_append_commits=2)
    t1 = Table.load(root)
    victim_conv = scan(spark, t1).select("conv_id").orderBy("conv_id").first()[0]
    pred = f"conv_id = '{victim_conv}'"

    orig = Table.commit_rewrite
    raced = {"fired": False}

    def hooked(self, removed_paths, added, **kw):
        op = (kw.get("summary") or {}).get("op", "")
        if self is t1 and op.startswith("cluster") and not raced["fired"]:
            raced["fired"] = True
            delete_where(spark, Table.load(root), pred)
        return orig(self, removed_paths, added, **kw)

    monkeypatch.setattr(Table, "commit_rewrite", hooked)
    m = cluster(spark, t1, curve="zorder", target_bytes=1 << 20)
    assert raced["fired"]
    assert m["committed_snapshot"] > m["base_snapshot"]

    table = Table.load(root)
    final = scan(spark, table)
    assert_same_rows(final, initial.where(f"NOT ({pred})"))
    report = verify_table(table, spark=spark)
    assert report["ok"], report["issues"][:5]
    referenced = {e.path for s in table.snapshot_ids()
                  for e in table.entries(s)}
    leaked = [
        os.path.relpath(os.path.join(dirpath, fn), table.root)
        for dirpath, _dirs, files in os.walk(table.data_dir)
        for fn in files
        if fn.endswith(".parquet")
        and os.path.relpath(os.path.join(dirpath, fn), table.root)
        not in referenced
    ]
    assert not leaked, f"rebase leaked uncommitted outputs: {leaked[:5]}"
    # exhausted retry budget still surfaces the conflict
    raced["fired"] = False
    t2 = Table.load(root)
    import pytest as _pytest

    from e_commerce_lakehouse_spark.table.meta import CommitConflictError

    def hooked2(self, removed_paths, added, **kw):
        op = (kw.get("summary") or {}).get("op", "")
        if self is t2 and op.startswith("cluster") and not raced["fired"]:
            raced["fired"] = True
            delete_where(
                spark, Table.load(root),
                "turn_idx >= 0",  # rewrites everything, every re-plan loses
            )
        return orig(self, removed_paths, added, **kw)

    monkeypatch.setattr(Table, "commit_rewrite", hooked2)
    with _pytest.raises(CommitConflictError):
        cluster(spark, t2, curve="zorder", target_bytes=1 << 20,
                retry_on_conflict=0)
