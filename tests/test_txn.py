"""Multi-table atomic transactions (table/txn.py): two-phase commit over
the WAP machinery with an atomically-renamed decision log.

Invariants:
- all-or-nothing VISIBILITY: before commit no table shows staged rows,
  after commit every table does;
- first-writer-wins: an interleaved commit on any participant aborts the
  whole transaction (CommitConflictError), leaving every table at its
  pre-txn content;
- crash atomicity: a crash AFTER the decision record but mid-head-flip
  is healed by the next Table.load (the decided txn finishes); a crash
  BEFORE the decision record leaves nothing visible;
- expire never GCs a committed-but-unhealed txn snapshot;
- abort cleans markers and stays invisible.
"""

import os

import pytest

from e_commerce_lakehouse_spark.table.meta import CommitConflictError, Table
from e_commerce_lakehouse_spark.table.txn import (
    MultiTableTransaction,
    heal_table_txns,
    txn_state,
)
from e_commerce_lakehouse_spark.table.writer import append_dataframe
from e_commerce_lakehouse_spark.table.scan import scan


def _mk_tables(spark, tmp_path, names=("a", "b")):
    out = []
    for name in names:
        df = spark.range(10).selectExpr("id", f"'{name}' AS tbl")
        t = Table.create(str(tmp_path / name))
        t.append_schema_version(df.schema.jsonValue(), as_of_snapshot=0)
        append_dataframe(spark, t, df)
        out.append(t)
    return out


def _batch(spark, name, lo=100, n=5):
    return spark.range(lo, lo + n).selectExpr("id", f"'{name}' AS tbl")


def test_all_or_nothing_visibility(spark, tmp_path):
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    assert txn.state() == "pending"
    # staged: INVISIBLE everywhere
    assert scan(spark, a).count() == 10
    assert scan(spark, b).count() == 10
    r = txn.commit()
    assert r["state"] == "committed" and r["tables"] == 2
    assert scan(spark, a).count() == 15
    assert scan(spark, b).count() == 15
    # markers gone, published summaries keep txn provenance
    assert not os.listdir(os.path.join(a.metadata_dir, "txns"))
    head = a.snapshot(a.current_snapshot_id())
    assert head.summary["txn"] == txn.txn_id
    assert "staged" not in head.summary
    # single-use
    with pytest.raises(ValueError, match="finished"):
        txn.commit()


def test_interleaved_commit_aborts_whole_txn(spark, tmp_path):
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    # a concurrent writer lands on b between stage and commit
    append_dataframe(spark, b, _batch(spark, "b", lo=900, n=3))
    with pytest.raises(CommitConflictError, match="re-stage"):
        txn.commit()
    assert txn.state() == "aborted"
    # NEITHER table shows txn rows; b shows only the interleaved commit
    assert scan(spark, a).count() == 10
    assert scan(spark, b).count() == 13
    assert not os.listdir(os.path.join(a.metadata_dir, "txns"))


def test_crash_after_decision_heals_on_load(spark, tmp_path):
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(_fail_after_flips=1)  # a flipped, b crashed mid-flip
    assert txn.state() == "committed"  # the decision is durable
    assert scan(spark, a).count() == 15
    # b's flip is missing until heal — Table.load finishes the txn
    b2 = Table.load(b.root)
    assert scan(spark, b2).count() == 15
    assert not os.listdir(os.path.join(b2.metadata_dir, "txns"))
    # heal is idempotent
    assert heal_table_txns(b2)["healed"] == 0


def test_crash_before_decision_stays_invisible(spark, tmp_path):
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    # coordinator dies before commit(): logs stay pending, nothing flips
    assert txn.state() == "pending"
    a2, b2 = Table.load(a.root), Table.load(b.root)
    assert scan(spark, a2).count() == 10
    assert scan(spark, b2).count() == 10
    # fresh pending txns are left alone by heal...
    r = heal_table_txns(a2)
    assert r["left"] == 1 and r["cleaned"] == 0
    # ...and presumed aborted once stale
    r = heal_table_txns(a2, stale_txn_s=0.0)
    assert r["cleaned"] == 1
    assert txn_state(txn.log_path) == "aborted"


def test_commit_through_stale_handle_heals_first(spark, tmp_path):
    """A decided txn whose flips crashed is finished by the NEXT commit
    even through a long-lived in-process handle (no Table.load): the
    commit lock heals before the new commit reads its parent, so nothing
    ever builds past an unflipped decided txn."""
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(_fail_after_flips=0)  # decided, ZERO flips done
    # commit via the SAME handles — heal runs inside the lock first
    append_dataframe(spark, a, _batch(spark, "a", lo=200, n=2))
    append_dataframe(spark, b, _batch(spark, "b", lo=200, n=2))
    assert scan(spark, a).count() == 17  # 10 + 5 txn + 2
    assert scan(spark, b).count() == 17
    # the txn snapshot is an ANCESTOR of the new head on both tables
    for t in (a, b):
        chain = set()
        sid = t.current_snapshot_id()
        while sid is not None:
            chain.add(sid)
            sid = t.snapshot(sid).parent_id
        assert any(t.snapshot(s).summary.get("txn") == txn.txn_id
                   for s in chain)


def test_expire_never_gcs_pending_txn_snapshot(spark, tmp_path):
    from e_commerce_lakehouse_spark.operators.expire import expire_snapshots

    (a,) = _mk_tables(spark, tmp_path, names=("a",))
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    staged_sid = txn._staged[0][1]
    # pile on published commits so keep_last would drop the staged id
    # (each append's auto-heal leaves the fresh pending marker alone)
    for i in range(3):
        append_dataframe(spark, a, _batch(spark, "a", lo=200 + 10 * i, n=2))
    expire_snapshots(a, keep_last=1, orphan_grace_ms=0)
    assert staged_sid in a.snapshot_ids()  # pinned: in-flight txn
    # presumed-abort once stale -> the pin lapses and GC collects it
    heal_table_txns(a, stale_txn_s=0.0)
    expire_snapshots(a, keep_last=1, orphan_grace_ms=0)
    assert staged_sid not in a.snapshot_ids()


def test_abort_cleans_and_stays_invisible(spark, tmp_path):
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    txn.abort()
    assert txn.state() == "aborted"
    assert scan(spark, Table.load(a.root)).count() == 10
    assert not os.listdir(os.path.join(a.metadata_dir, "txns"))
    with pytest.raises(ValueError, match="finished"):
        txn.stage_append(spark, a, _batch(spark, "a"))


def test_same_table_staged_twice_refused(spark, tmp_path):
    (a,) = _mk_tables(spark, tmp_path, names=("a",))
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    with pytest.raises(ValueError, match="already staged"):
        txn.stage_append(spark, a, _batch(spark, "a", lo=300))
    with pytest.raises(ValueError, match="nothing staged"):
        MultiTableTransaction(str(tmp_path / "_txns")).commit()


def test_decided_txn_cannot_be_aborted_or_recommitted(spark, tmp_path):
    """The decision record is FINAL: after a mid-flip crash, abort() and
    commit() both refuse — the only way forward is heal (review
    finding: abort used to rewrite 'committed' to 'aborted', leaving
    the txn half-applied forever)."""
    a, b = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn.stage_append(spark, b, _batch(spark, "b"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        txn.commit(_fail_after_flips=1)
    with pytest.raises(ValueError, match="already decided committed"):
        txn.abort()
    with pytest.raises(ValueError, match="already decided committed"):
        txn.commit()
    assert txn.state() == "committed"
    heal_table_txns(Table.load(b.root))
    assert scan(spark, Table.load(b.root)).count() == 15


def test_lock_reentry_is_thread_scoped(tmp_path):
    """A second THREAD sharing the handle must not ride the re-entrancy
    flag past the file lock (review finding)."""
    import threading

    t = Table.create(str(tmp_path / "t"))
    # simulate another thread currently holding the lock via this handle
    open(t._lock_path(), "w").write("other")
    t._lock_depth = 1
    t._lock_owner = threading.get_ident() + 1  # some OTHER thread
    with pytest.raises(CommitConflictError, match="COMMIT.lock"):
        with t._commit_lock():
            pass
    os.remove(t._lock_path())
    t._lock_depth = 0
    t._lock_owner = None


def test_load_during_live_commit_window_does_not_raise(spark, tmp_path):
    """Table.load's heal is best-effort: a committed marker whose table
    lock is held by a live coordinator must not fail the load (review
    finding)."""
    import json

    (a,) = _mk_tables(spark, tmp_path, names=("a",))
    txn = MultiTableTransaction(str(tmp_path / "_txns"))
    txn.stage_append(spark, a, _batch(spark, "a"))
    txn._write_log("committed")  # decided...
    open(a._lock_path(), "w").write("coordinator")  # ...lock held live
    a2 = Table.load(a.root)  # must not raise
    assert scan(spark, a2).count() == 10  # flip not healed (lock held)
    os.remove(a._lock_path())
    heal_table_txns(Table.load(a.root))
    assert scan(spark, Table.load(a.root)).count() == 15


def test_vacuum_txn_logs(spark, tmp_path):
    from e_commerce_lakehouse_spark.table.txn import vacuum_txn_logs

    a, b = _mk_tables(spark, tmp_path)
    log_dir = str(tmp_path / "_txns")
    done = MultiTableTransaction(log_dir)
    done.stage_append(spark, a, _batch(spark, "a"))
    done.stage_append(spark, b, _batch(spark, "b"))
    done.commit()
    gone = MultiTableTransaction(log_dir)
    gone.stage_append(spark, a, _batch(spark, "a", lo=300))
    gone.abort()
    # a decided-but-unhealed txn: markers still point at its log
    crashed = MultiTableTransaction(log_dir)
    crashed.stage_append(spark, a, _batch(spark, "a", lo=400))
    crashed.stage_append(spark, b, _batch(spark, "b", lo=400))
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.commit(_fail_after_flips=0)
    # fresh logs are all kept
    r = vacuum_txn_logs(log_dir)
    assert r["removed"] == 0 and r["kept"] == 3
    # aged: decided logs go; the crashed one HEALS first (markers gone),
    # then goes too — and the heal made its rows visible
    r = vacuum_txn_logs(log_dir, older_than_s=0.0)
    assert r["removed"] == 3, r
    assert scan(spark, Table.load(a.root)).count() == 20  # 10+5+5
    assert not os.listdir(os.path.join(a.metadata_dir, "txns"))


def test_two_coordinators_racing_same_tables(spark, tmp_path):
    """Two transactions staged over the same two tables, committed
    concurrently from two threads: realpath-ordered lock acquisition
    prevents deadlock, exactly ONE wins; the loser aborts with
    CommitConflictError (its staged parents moved) and leaks nothing."""
    from concurrent.futures import ThreadPoolExecutor

    a, b = _mk_tables(spark, tmp_path)
    # both coordinators WAIT on contended locks (lock_wait_s) so the
    # loser deterministically reaches the verify step and aborts itself
    # (a fail-fast loser would raise on the lock and stay pending until
    # heal's presumed-abort — legal, but not what this test pins)
    a.lock_wait_s = b.lock_wait_s = 10.0
    t1 = MultiTableTransaction(str(tmp_path / "_txns"))
    t1.stage_append(spark, a, _batch(spark, "a", lo=100))
    t1.stage_append(spark, b, _batch(spark, "b", lo=100))
    t2 = MultiTableTransaction(str(tmp_path / "_txns"))
    t2.stage_append(spark, Table.load(a.root, lock_wait_s=10.0),
                    _batch(spark, "a", lo=200))
    t2.stage_append(spark, Table.load(b.root, lock_wait_s=10.0),
                    _batch(spark, "b", lo=200))

    def _commit(txn):
        try:
            return ("ok", txn.commit())
        except CommitConflictError as e:
            return ("conflict", str(e))

    with ThreadPoolExecutor(max_workers=2) as ex:
        r1, r2 = list(ex.map(_commit, [t1, t2]))
    outcomes = sorted([r1[0], r2[0]])
    assert outcomes == ["conflict", "ok"], (r1, r2)
    # exactly one txn's rows landed on BOTH tables
    assert scan(spark, Table.load(a.root)).count() == 15
    assert scan(spark, Table.load(b.root)).count() == 15
    winner = t1 if r1[0] == "ok" else t2
    for root in (a.root, b.root):
        t = Table.load(root)
        assert t.snapshot(t.current_snapshot_id()).summary["txn"] == winner.txn_id
    assert not os.listdir(os.path.join(a.metadata_dir, "txns"))


def test_cli_txn_ingest_atomic(spark, tmp_path):
    """--op txn-ingest: one landing batch per table, all heads flip
    together (the reference's Parallel ETL fan-out, atomic)."""
    import sys

    sys.path.insert(0, ".")
    from run_maintenance import main

    a, b = _mk_tables(spark, tmp_path)
    land_a, land_b = str(tmp_path / "la"), str(tmp_path / "lb")
    _batch(spark, "a").coalesce(1).write.parquet(land_a)
    _batch(spark, "b").coalesce(1).write.parquet(land_b)
    rc = main(["--table", a.root, "--op", "txn-ingest",
               "--tables", b.root, "--source", f"{land_a},{land_b}",
               "--txn-dir", str(tmp_path / "_txns")])
    assert rc == 0
    assert scan(spark, Table.load(a.root)).count() == 15
    assert scan(spark, Table.load(b.root)).count() == 15
    ta = Table.load(a.root)
    assert "txn" in ta.snapshot(ta.current_snapshot_id()).summary


def test_commit_refuses_presumed_aborted_txn(spark, tmp_path):
    """Decision finality (ADVICE r5): a txn that heal presumed aborted
    (stale) must never be flipped to committed by a late coordinator —
    commit raises, nothing publishes, and the log stays aborted."""
    ta, tb = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "txns"))
    da = spark.range(10, 15).selectExpr("id", "'a' AS tbl")
    db = spark.range(10, 15).selectExpr("id", "'b' AS tbl")
    txn.stage_append(spark, ta, da)
    txn.stage_append(spark, tb, db)
    # a heal pass on another node presumed this txn aborted (stale clock)
    heal_table_txns(ta, stale_txn_s=0.0)
    assert txn_state(txn.log_path) == "aborted"
    with pytest.raises(CommitConflictError, match="presumed aborted"):
        txn.commit()
    assert txn_state(txn.log_path) == "aborted"  # never resurrected
    assert scan(spark, Table.load(ta.root)).count() == 10
    assert scan(spark, Table.load(tb.root)).count() == 10


def test_heal_presumed_abort_rechecks_under_lock(spark, tmp_path):
    """heal's stale-presumed-abort must re-read the log under the commit
    lock: a log that reads committed by then is left for the committed
    branch, never overwritten with aborted."""
    ta, tb = _mk_tables(spark, tmp_path)
    txn = MultiTableTransaction(str(tmp_path / "txns"))
    txn.stage_append(spark, ta, spark.range(10, 15).selectExpr("id", "'a' AS tbl"))
    txn.stage_append(spark, tb, spark.range(10, 15).selectExpr("id", "'b' AS tbl"))
    txn.commit()
    # tb's marker was removed by commit; recreate the crashed-mid-flip
    # state: marker present, log committed, flip already applied — a
    # stale-threshold heal must take the committed branch (clean), not
    # the presumed-abort one
    txn2 = MultiTableTransaction(str(tmp_path / "txns"), txn_id=txn.txn_id)
    txn2._staged = [(tb, tb.current_snapshot_id())]
    txn2._write_marker(tb, tb.current_snapshot_id())
    rep = heal_table_txns(tb, stale_txn_s=0.0)
    assert rep["cleaned"] == 1 and rep["stuck"] == 0
    assert txn_state(txn.log_path) == "committed"
