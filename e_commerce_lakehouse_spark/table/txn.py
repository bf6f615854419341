"""Multi-table ATOMIC transactions over the write-audit-publish machinery.

The reference publishes three tables from one orchestration run
(`/root/reference/src/step_functions/etl_orchestrator.json:249-353`,
Parallel fan-out of orders/products/order_items ETL) with NO cross-table
atomicity — a failed branch leaves sibling tables already updated. This
module closes that gap Nessie/lakehouse-catalog style: stage one snapshot
per table (invisible, `commit_append(publish=False)`), then flip ALL
heads under a two-phase protocol whose source of truth is a single
atomically-renamed transaction log file:

1. STAGE — per table: write data files + a staged snapshot whose summary
   carries the txn id and log path, plus a per-table marker file under
   ``metadata/txns/`` (what makes crashed transactions discoverable from
   the table alone).
2. COMMIT — acquire every table's commit lock in deterministic
   (realpath-sorted) order, verify each staged snapshot's parent is
   still that table's head (first-writer-wins: any interleaved commit
   aborts the txn), atomically write the log's state to ``committed``,
   then flip each head (publish_snapshot — the commit lock is re-entrant
   per handle, so the held lock covers verify → mark → flip).

Crash atomicity (presumed abort):
- crash BEFORE the log says committed → no head ever flipped; staged
  snapshots are invisible and age out like abandoned WAP stages; heal
  removes the markers after ``STALE_TXN_S``.
- crash AFTER the log says committed → the txn is durably decided;
  ``heal_table_txns`` (run automatically by ``Table.load``) finishes the
  remaining flips. Because every writer goes through ``Table.load`` and
  heal runs under the commit lock BEFORE any new commit can take it, no
  commit can build on a pre-txn head once the txn is decided.

The published snapshots keep ``txn``/``txn_log`` in their summary as
provenance (Delta's ``txn`` appId analog).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
import uuid

from .meta import CommitConflictError, Table

#: a pending (undecided) transaction older than this is presumed aborted:
#: its markers are pruned and its staged snapshots fall back to ordinary
#: abandoned-stage lifecycle (expire GC). Matches expire's in-flight
#: bound — both answer "how long can a legitimate write be mid-flight".
STALE_TXN_S = 24 * 3600


def _read_json(path: str) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def _write_json_atomic(path: str, obj: dict) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def txn_state(log_path: str) -> str:
    """``pending`` | ``committed`` | ``aborted`` | ``absent``."""
    d = _read_json(log_path)
    return d["state"] if d else "absent"


def _marker_dir(table: Table) -> str:
    return os.path.join(table.metadata_dir, "txns")


def _on_published_chain(table: Table, sid: int) -> bool:
    head = table.current_snapshot_id()
    while head is not None:
        if head == sid:
            return True
        try:
            head = table.snapshot(head).parent_id
        except FileNotFoundError:
            return False
    return False


class MultiTableTransaction:
    """Stage appends on several tables, publish all-or-nothing.

    ``txn_dir`` is the shared transaction-log directory (same filesystem
    namespace as the tables — on a real deployment, the catalog volume).
    One instance is single-use: after ``commit()`` or ``abort()`` it
    refuses further staging."""

    def __init__(self, txn_dir: str, txn_id: str | None = None):
        os.makedirs(txn_dir, exist_ok=True)
        self.txn_dir = os.path.abspath(txn_dir)
        self.txn_id = txn_id or uuid.uuid4().hex[:16]
        self._staged: list[tuple[Table, int]] = []
        self._done = False

    @property
    def log_path(self) -> str:
        return os.path.join(self.txn_dir, f"txn-{self.txn_id}.json")

    def state(self) -> str:
        return txn_state(self.log_path)

    def _write_log(self, state: str) -> None:
        if state != "committed" and txn_state(self.log_path) == "committed":
            raise ValueError(f"transaction {self.txn_id} is already decided "
                             f"committed; refusing {state!r}")
        if state == "committed" and txn_state(self.log_path) != "pending":
            # symmetric decision-finality guard (ADVICE r5): a stale txn
            # that heal presumed aborted (or whose log was vacuumed) must
            # never be flipped to committed — a participant may already
            # have acted on the abort, and a vacuumed txn's staged
            # snapshots may be expired
            raise ValueError(
                f"transaction {self.txn_id} is no longer pending "
                f"(state={txn_state(self.log_path)!r}); refusing to decide "
                f"committed")
        _write_json_atomic(self.log_path, {
            "txn_id": self.txn_id,
            "state": state,
            "tables": [{"root": t.root, "snapshot_id": sid}
                       for t, sid in self._staged],
            "ts_ms": int(time.time() * 1000),
        })

    def _write_marker(self, table: Table, sid: int) -> None:
        mdir = _marker_dir(table)
        os.makedirs(mdir, exist_ok=True)
        _write_json_atomic(os.path.join(mdir, f"{self.txn_id}.json"), {
            "txn_id": self.txn_id,
            "txn_log": self.log_path,
            "snapshot_id": sid,
            "ts_ms": int(time.time() * 1000),
        })

    @staticmethod
    def _remove_marker(table: Table, txn_id: str) -> None:
        with contextlib.suppress(FileNotFoundError):
            os.remove(os.path.join(_marker_dir(table), f"{txn_id}.json"))

    def _check_open(self) -> None:
        if self._done:
            raise ValueError(f"transaction {self.txn_id} already finished")

    def stage_append(self, spark, table: Table, df, rows_per_file: int = 100_000):
        """Stage one table's append (invisible until commit). Returns the
        staged Snapshot."""
        self._check_open()
        if table.branch is not None:
            raise ValueError("multi-table transactions commit to main; "
                             "branch handles are not supported")
        if any(os.path.realpath(t.root) == os.path.realpath(table.root)
               for t, _ in self._staged):
            raise ValueError(f"table {table.root} already staged in this "
                             f"transaction (one snapshot per table)")
        from .writer import append_dataframe

        snap = append_dataframe(
            spark, table, df, rows_per_file=rows_per_file, publish=False,
            extra_summary={"txn": self.txn_id, "txn_log": self.log_path},
        )
        self._staged.append((table, snap.snapshot_id))
        self._write_marker(table, snap.snapshot_id)
        self._write_log("pending")
        return snap

    def commit(self, _fail_after_flips: int | None = None) -> dict:
        """Atomically publish every staged snapshot (all-or-nothing).

        Raises CommitConflictError (and aborts the transaction) if any
        table advanced past its staged parent — re-stage on the new
        heads. ``_fail_after_flips`` is a TEST hook simulating a crash
        after the decision record but mid-flip (heal finishes)."""
        self._check_open()
        if not self._staged:
            raise ValueError("nothing staged")
        if self.state() == "committed":
            # the decision record is FINAL: a flip-side failure after it
            # does not un-decide the txn — finishing is heal's job, and
            # re-running the verify loop here could wrongly abort
            raise ValueError(
                f"transaction {self.txn_id} is already decided committed; "
                f"interrupted flips finish via heal_table_txns / the next "
                f"Table.load")
        with contextlib.ExitStack() as st:
            for t, _sid in sorted(self._staged,
                                  key=lambda p: os.path.realpath(p[0].root)):
                st.enter_context(t._commit_lock())
            for t, sid in self._staged:
                head = t.current_snapshot_id()
                parent = t.snapshot(sid).parent_id
                if parent != head:
                    self.abort()
                    raise CommitConflictError(
                        f"transaction {self.txn_id}: table {t.root} moved "
                        f"from {parent} to {head} since staging; re-stage "
                        f"on the current heads",
                        kind="parent-moved",
                    )
            # Decision-finality re-check UNDER the participant locks
            # (ADVICE r5): heal's presumed-abort flip takes the same
            # per-table commit lock, so a stale-txn abort decided while we
            # were acquiring locks is visible here — refuse to resurrect
            # it (its staged snapshots may already be expiring) instead of
            # racing conflicting decisions into the log.
            if self.state() != "pending":
                for t, _sid in self._staged:
                    self._remove_marker(t, self.txn_id)
                self._done = True
                raise CommitConflictError(
                    f"transaction {self.txn_id} was presumed aborted "
                    f"(stale/vacuumed; log state "
                    f"{self.state()!r}) before the decision point; "
                    f"re-stage and retry",
                    kind="txn-presumed-aborted",
                )
            # THE decision point: one atomic rename decides the whole txn
            self._write_log("committed")
            flips = 0
            for t, sid in self._staged:
                if _fail_after_flips is not None and flips >= _fail_after_flips:
                    raise RuntimeError(
                        f"simulated crash after {flips} flips (test hook)")
                t.publish_snapshot(sid)
                self._remove_marker(t, self.txn_id)
                flips += 1
        self._done = True
        return {"txn_id": self.txn_id, "state": "committed",
                "tables": len(self._staged)}

    def abort(self) -> dict:
        """Abandon the transaction: mark the log aborted and drop the
        markers. Staged snapshots stay invisible and age out via the
        ordinary abandoned-stage lifecycle (expire GC). Refuses once the
        decision record says committed — a decided txn can only be
        FINISHED (heal), never rolled back half-applied."""
        self._check_open()
        if self.state() == "committed":
            raise ValueError(
                f"transaction {self.txn_id} is already decided committed "
                f"and cannot be aborted; interrupted flips finish via "
                f"heal_table_txns / the next Table.load")
        for t, _sid in self._staged:
            self._remove_marker(t, self.txn_id)
        if self._staged:
            self._write_log("aborted")
        self._done = True
        return {"txn_id": self.txn_id, "state": "aborted",
                "tables": len(self._staged)}


def heal_table_txns(table: Table, stale_txn_s: float = STALE_TXN_S) -> dict:
    """Finish or clean up transactions this table participated in —
    called automatically by ``Table.load`` when ``metadata/txns/`` is
    non-empty, and safe to call any time (idempotent, takes the commit
    lock per marker).

    - committed txn, flip still missing → publish now (parent check:
      a decided txn's snapshot parents the pre-txn head, and heal runs
      before any new commit can take the lock, so the flip applies);
      already flipped → just drop the marker.
    - aborted txn → drop the marker.
    - pending/absent txn older than ``stale_txn_s`` → presumed aborted:
      mark the log aborted (if pending) and drop the marker.
    """
    if table.branch is not None:
        table = Table(table.root)  # markers/heads are main-level
    mdir = _marker_dir(table)
    if not os.path.isdir(mdir):
        return {"healed": 0, "cleaned": 0, "left": 0, "stuck": 0}
    healed = cleaned = left = stuck = 0
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith(".json"):
            continue
        marker = _read_json(os.path.join(mdir, fn))
        if (marker is None
                or not {"txn_id", "txn_log", "snapshot_id"} <= marker.keys()):
            continue  # malformed/foreign file: never crash a load over it
        txn_id = marker["txn_id"]
        state = txn_state(marker["txn_log"])
        sid = marker["snapshot_id"]
        if state == "committed":
            with table._commit_lock():
                try:
                    snap = table.snapshot(sid)
                except FileNotFoundError:
                    MultiTableTransaction._remove_marker(table, txn_id)
                    cleaned += 1
                    continue
                if _on_published_chain(table, sid):
                    MultiTableTransaction._remove_marker(table, txn_id)
                    cleaned += 1
                elif snap.parent_id == table.current_snapshot_id():
                    table.publish_snapshot(sid)
                    MultiTableTransaction._remove_marker(table, txn_id)
                    healed += 1
                else:
                    # decided txn whose flip can no longer apply — only
                    # reachable if a commit bypassed heal; surfaced, not
                    # silently dropped
                    stuck += 1
        elif state == "aborted":
            MultiTableTransaction._remove_marker(table, txn_id)
            cleaned += 1
        else:  # pending / absent
            age_s = time.time() - marker.get("ts_ms", 0) / 1000
            if age_s > stale_txn_s:
                # presumed-abort flip UNDER the commit lock with a fresh
                # state re-check (ADVICE r5): a coordinator finishing this
                # txn holds every participant's lock at its decision
                # point, so serializing on this table's lock means the
                # 'pending' we act on cannot be a stale read of a log
                # that is flipping to committed mid-write — without this,
                # heal's read-modify-write could overwrite a just-decided
                # 'committed' with 'aborted' (cross-table divergence)
                with table._commit_lock():
                    state2 = txn_state(marker["txn_log"])
                    if state2 == "committed":
                        left += 1  # decided after all: next pass heals it
                        continue
                    if state2 == "pending":
                        log = _read_json(marker["txn_log"]) or {}
                        log["state"] = "aborted"
                        _write_json_atomic(marker["txn_log"], log)
                    MultiTableTransaction._remove_marker(table, txn_id)
                cleaned += 1
            else:
                left += 1
    return {"healed": healed, "cleaned": cleaned, "left": left,
            "stuck": stuck}


def vacuum_txn_logs(txn_dir: str,
                    older_than_s: float = STALE_TXN_S) -> dict:
    """GC decided transaction logs from ``txn_dir``.

    A log is removable only when it is older than ``older_than_s`` AND
    no participant table still holds a marker pointing at it — removing
    a committed log while a marker lingers would read as 'absent' and
    eventually presumed-abort a DECIDED txn (atomicity violation), so
    lingering participants are healed first (the log records their
    roots) and the log is kept if any marker survives (e.g. an
    unreachable root). Idempotent; run it from the same maintenance
    cadence as snapshot expiration."""
    removed = kept = 0
    if not os.path.isdir(txn_dir):
        return {"removed": 0, "kept": 0}
    for fn in sorted(os.listdir(txn_dir)):
        if not (fn.startswith("txn-") and fn.endswith(".json")):
            continue
        path = os.path.join(txn_dir, fn)
        d = _read_json(path)
        if d is None:
            continue
        age_s = time.time() - d.get("ts_ms", 0) / 1000
        if age_s <= older_than_s:
            kept += 1
            continue
        blocked = False
        for tb in d.get("tables", []):
            if not os.path.isdir(os.path.join(tb["root"], "metadata")):
                # UNREACHABLE participant (moved root, absent mount):
                # 'marker unobservable' must not read as 'marker gone' —
                # deleting a committed log here would later presume-abort
                # a DECIDED txn on the returning table (review finding)
                blocked = True
                continue
            marker = os.path.join(tb["root"], "metadata", "txns",
                                  f"{d['txn_id']}.json")
            if os.path.exists(marker):
                with contextlib.suppress(Exception):
                    heal_table_txns(Table.load(tb["root"]),
                                    stale_txn_s=older_than_s)
                if os.path.exists(marker):
                    blocked = True
        if blocked:
            kept += 1
            continue
        with contextlib.suppress(FileNotFoundError):
            os.remove(path)
        removed += 1
    return {"removed": removed, "kept": kept}
