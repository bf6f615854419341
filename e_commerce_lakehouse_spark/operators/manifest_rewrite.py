"""Op-3: manifest rewrite — collapse metadata debt.

Every append/rewrite commit is O(changed files): it stacks one more
manifest on the snapshot and grows the removed-file delta set
(table/meta.py). After many commits, planning a scan means unioning many
manifests and subtracting a large tombstone set. This op rewrites the
LIVE entry list into few fresh manifests and clears the tombstones —
a pure metadata operation, no data file is touched (analog of Iceberg's
RewriteManifests; the reference's nearest concept is the Glue crawler
re-registering table metadata,
`/root/reference/src/step_functions/etl_orchestrator.json:354-377`).
"""

from __future__ import annotations

from ..table.meta import Snapshot, Table


def rewrite_manifests(
    table: Table,
    target_entries_per_manifest: int = 100_000,
) -> dict:
    base = table.current_snapshot_id()
    if base is None:
        raise ValueError("cannot rewrite manifests of an empty table")
    snap = table.snapshot(base)
    entries = table.entries(base)
    old_manifest_count = len(snap.manifests)
    old_tombstones = len(snap.removed_files)

    chunks = [
        entries[i : i + target_entries_per_manifest]
        for i in range(0, len(entries), target_entries_per_manifest)
    ] or [[]]
    names = [table.write_manifest_for(chunk, k) for k, chunk in enumerate(chunks)]
    new_snap: Snapshot = table.commit_manifests(
        names,
        operation="rewrite-manifests",
        summary={
            "op": "rewrite-manifests",
            "manifests_before": old_manifest_count,
            "manifests_after": len(names),
            "tombstones_cleared": old_tombstones,
            "live_files": len(entries),
        },
    )
    return {
        "base_snapshot": base,
        "committed_snapshot": new_snap.snapshot_id,
        "manifests_before": old_manifest_count,
        "manifests_after": len(names),
        "tombstones_cleared": old_tombstones,
        "live_files": len(entries),
    }
