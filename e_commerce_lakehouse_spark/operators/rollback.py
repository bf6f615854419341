"""Snapshot rollback: restore a previous table state as a NEW commit.

Iceberg exposes this as ``rollback_to_snapshot``; the reference stack has
no analog (a bad Glue run is repaired by re-running the ETL, see
/root/reference/src/step_functions/etl_orchestrator.json retry blocks) —
on a lakehouse table the repair is a metadata flip instead of a recompute.

Semantics: a new snapshot whose live file set is EXACTLY the target
snapshot's. History stays linear and append-only — the bad snapshots
remain pinned-readable until ``expire_snapshots`` ages them out, at which
point their now-unreferenced files are GC'd as orphans. Data files are
never copied: the commit references the target's manifests verbatim and
replays its removed set, so rollback is O(metadata) at any table size.

Rollback restores the FILE SET, not the schema (same as Iceberg's
rollback_to_snapshot): if the table's schema evolved after the target,
the current schema still applies — revert it explicitly with
drop_columns/add_columns if the shape change itself was the mistake.
"""

from __future__ import annotations

from ..table.meta import Table


def rollback_to(table: Table, snapshot_id: int) -> dict:
    """Make ``snapshot_id``'s file set current again via a new commit.

    Returns a summary dict (new snapshot id, file/row counts restored).
    Raises FileNotFoundError if the target snapshot is expired/unknown,
    ValueError if it is already current."""
    current = table.current_snapshot_id()
    if snapshot_id == current:
        raise ValueError(f"snapshot {snapshot_id} is already current")
    target = table.snapshot(snapshot_id)  # FileNotFoundError if expired
    restored = table.entries(snapshot_id)
    snap = table.commit_manifests(
        list(target.manifests),
        operation="rollback",
        summary={
            "rolled-back-from": current,
            "rolled-back-to": snapshot_id,
            "restored-files": len(restored),
            "restored-rows": sum(e.rows for e in restored),
        },
        removed_files=list(target.removed_files),
        tombstones=list(target.tombstones),  # restore the target's MoR state too
    )
    return {
        "snapshot": snap.snapshot_id,
        "restored_from": snapshot_id,
        "previous": current,
        "files": len(restored),
        "rows": sum(e.rows for e in restored),
    }
