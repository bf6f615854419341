"""Auto-maintenance: metadata-driven planning + one-call execution of
the five maintenance operators.

The reference schedules its ETL/maintenance stages with a hand-written
Step Functions DAG (/root/reference/src/step_functions/
etl_orchestrator.json:249-353) — a human decides what runs. At 10^12
turns a human cannot: whether a table needs compaction, clustering,
tombstone materialization, manifest rewrite, or snapshot expiry is a
function of its METADATA, and the metadata already holds everything
needed to decide (per-file bytes, sequence numbers, tombstone ledger,
manifest count, snapshot ages). ``maintain()`` is the resulting single
entry point — Delta's OPTIMIZE scheduler / Iceberg's maintenance Spark
actions, re-expressed over the native format:

1. ``table_health``: a pure-metadata report (ZERO data reads — file
   listing comes from manifests, never the filesystem) of small-file
   debt, tombstone debt, unclustered-file debt, manifest count, and
   snapshot count.
2. ``plan_maintenance``: threshold policy -> ordered step list. The
   ordering encodes the operators' interactions, not just priorities:
   a FULL cluster both sorts and bin-packs and clears tombstones, so
   when it runs, purge/compact are redundant and are NOT planned; an
   INCREMENTAL cluster consolidates exactly the post-last-cluster
   files, so compact is planned only for the never-clustered case;
   manifest rewrite runs AFTER any rewrite step (each rewrite adds
   manifests); expire runs LAST so it can GC what the rewrites
   replaced.
3. ``maintain``: executes the plan, returning each operator's own
   metrics dict plus before/after health.

Scale: planning is O(live files) driver-side arithmetic over manifest
entries — the same metadata MERGE/compact already load — and each
executed step is the operator's own 100 TB-shaped plan (manifest-stat
pruning, Arrow task rewrites, partial-progress commits). ``dry_run``
returns the plan without executing, which is what a fleet scheduler
polls across ten thousand tables to decide where to spend its rewrite
budget.
"""

from __future__ import annotations

from time import monotonic

from pyspark.sql import SparkSession

from ..schema import TRANSCRIPTS_STAT_COLUMNS
from ..table.meta import Table
from ..table.writer import DEFAULT_TARGET_FILE_BYTES
from .cluster import _last_cluster_sid, cluster
from .compact import compact
from .expire import expire_snapshots
from .manifest_rewrite import rewrite_manifests
from .rowlevel import materialize_deletes


def table_health(
    table: Table,
    target_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_ratio: float = 0.5,
) -> dict:
    """Pure-metadata health report. No data files are opened: every
    number derives from manifest entries and snapshot summaries, so on
    a 100 TB table this costs one metadata read regardless of data
    size."""
    entries = table.entries()
    sizes = [e.bytes for e in entries]
    small_cut = int(target_bytes * small_file_ratio)
    small = sum(1 for b in sizes if b < small_cut)
    tombs = table.tombstone_entries()
    last_cluster = _last_cluster_sid(table)
    if last_cluster is None:
        unclustered = len(entries)
    else:
        unclustered = sum(1 for e in entries if (e.seq or 0) > last_cluster)
    snap = table.snapshot()
    return {
        "live_files": len(entries),
        "live_bytes": sum(sizes),
        "live_rows": sum(e.rows for e in entries),
        "small_files": small,
        "small_file_cutoff_bytes": small_cut,
        "tombstone_files": len(tombs),
        "clustered": last_cluster is not None,
        "unclustered_files": unclustered,
        "manifests": len(snap.manifests),
        "snapshots": len(table.snapshot_ids()),
    }


def plan_maintenance(
    table: Table,
    target_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_ratio: float = 0.5,
    min_small_files: int = 4,
    curve: str | None = None,
    key_cols: list[str] | None = None,
    cluster_min_new_files: int = 4,
    tombstone_max_files: int = 1,
    manifest_max_count: int = 4,
    keep_last_snapshots: int = 2,
    health: dict | None = None,
) -> list[str]:
    """Threshold policy -> ordered step names. ``curve=None`` disables
    the clustering step (a table with no declared sort policy is only
    compacted). Pure function of ``table_health`` + policy, exposed
    separately so schedulers can rank tables without executing."""
    h = health if health is not None else table_health(
        table, target_bytes, small_file_ratio
    )
    steps: list[str] = []
    wants_cluster = curve is not None and (
        not h["clustered"] or h["unclustered_files"] >= cluster_min_new_files
    )
    full_cluster = wants_cluster and not h["clustered"]
    # a full cluster reads through scan (tombstones applied + cleared)
    # and rewrites everything sorted at target_bytes — purge and compact
    # would rewrite the same bytes twice in one run
    if h["tombstone_files"] >= tombstone_max_files and not full_cluster:
        steps.append("materialize_deletes")
    if h["small_files"] >= min_small_files and not wants_cluster:
        steps.append("compact")
    if wants_cluster:
        steps.append("cluster_full" if full_cluster else "cluster_incremental")
    if h["manifests"] > manifest_max_count:
        steps.append("rewrite_manifests")
    if h["snapshots"] > keep_last_snapshots:
        steps.append("expire_snapshots")
    return steps


def maintain(
    spark: SparkSession,
    table: Table,
    target_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_ratio: float = 0.5,
    min_small_files: int = 4,
    curve: str | None = None,
    key_cols: list[str] | None = None,
    cluster_min_new_files: int = 4,
    tombstone_max_files: int = 1,
    manifest_max_count: int = 4,
    keep_last_snapshots: int = 2,
    expire_older_than_ms: int | None = None,
    schema=None,
    stat_columns=TRANSCRIPTS_STAT_COLUMNS,
    dry_run: bool = False,
) -> dict:
    """Plan from metadata, then execute. Content-preserving by
    construction: every planned step is one of the content-preserving
    maintenance operators (materialize_deletes changes only the
    physical encoding of already-committed deletes). Each step's own
    metrics dict is returned under its name; the plan is recorded in
    order. ``dry_run=True`` returns the plan and the health report
    without touching the table."""
    t0 = monotonic()
    before = table_health(table, target_bytes, small_file_ratio)
    plan = plan_maintenance(
        table,
        target_bytes=target_bytes,
        small_file_ratio=small_file_ratio,
        min_small_files=min_small_files,
        curve=curve,
        key_cols=key_cols,
        cluster_min_new_files=cluster_min_new_files,
        tombstone_max_files=tombstone_max_files,
        manifest_max_count=manifest_max_count,
        keep_last_snapshots=keep_last_snapshots,
        health=before,
    )
    report: dict = {"plan": list(plan), "health_before": before,
                    "dry_run": dry_run}
    if dry_run:
        report["wall_ms"] = int((monotonic() - t0) * 1000)
        return report
    steps: dict[str, dict] = {}
    for step in plan:
        if step == "materialize_deletes":
            steps[step] = materialize_deletes(
                spark, table, target_bytes=target_bytes, schema=schema,
                stat_columns=stat_columns,
            )
        elif step == "compact":
            # preserve an existing sort layout when one exists: FFD on a
            # clustered table would merge distant key ranges and destroy
            # the per-file stats that make skipping work
            steps[step] = compact(
                spark, table, target_bytes=target_bytes,
                small_file_ratio=small_file_ratio, schema=schema,
                stat_columns=stat_columns,
                order_preserving=before["clustered"],
            )
        elif step in ("cluster_full", "cluster_incremental"):
            steps[step] = cluster(
                spark, table, curve=curve, target_bytes=target_bytes,
                schema=schema, stat_columns=stat_columns,
                incremental=(step == "cluster_incremental"),
                key_cols=key_cols,
            )
        elif step == "rewrite_manifests":
            steps[step] = rewrite_manifests(table)
        elif step == "expire_snapshots":
            steps[step] = expire_snapshots(
                table, keep_last=keep_last_snapshots,
                older_than_ms=expire_older_than_ms,
            )
    report["steps"] = steps
    report["health_after"] = table_health(table, target_bytes, small_file_ratio)
    report["wall_ms"] = int((monotonic() - t0) * 1000)
    return report
