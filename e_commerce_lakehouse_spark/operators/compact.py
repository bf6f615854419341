"""Op-1: bin-packing small-file compaction (copy-on-write).

Reference analog: Delta's pre-write repartition small-file mitigation
(`spark.databricks.delta.merge.repartitionBeforeWrite.enabled=true`,
`/root/reference/config/aws_config.py:68`) — there it's a flag; here it is
a first-class, resumable maintenance operator:

1. PLAN driver-side from manifest stats only (plans/binpack.py) — no data
   read to decide what to rewrite;
2. REWRITE each file group as its own Spark job (`coalesce`, shuffle-free:
   inputs are whole small files), groups run concurrently on the FAIR
   scheduler so a 1000-executor cluster stays saturated;
3. CHECKPOINT one JSONL line per finished group (checkpoint.py) — a killed
   run resumes at file-group granularity, already-rewritten groups are
   skipped and their outputs reused;
4. COMMIT one atomic REPLACE snapshot (removed = group inputs, added =
   group outputs). Readers pinned to the pre-compaction snapshot still see
   the old files (snapshot isolation); content is byte-identical.
"""

from __future__ import annotations

import math
import os
import threading
from concurrent.futures import ThreadPoolExecutor, as_completed
from time import monotonic

from pyspark.sql import SparkSession

from ..checkpoint import Checkpoint
from ..plans.binpack import FileGroup, plan_bin_packing
from ..schema import TRANSCRIPTS_SCHEMA, TRANSCRIPTS_STAT_COLUMNS
from ..table.meta import DataFileEntry, Table
from ..table.stats import collect_entries, list_parquet_files
from ..table.writer import DEFAULT_TARGET_FILE_BYTES


class SimulatedCrash(RuntimeError):
    """Raised by fail_after_groups to exercise kill/resume in tests."""


def _rewrite_group(
    spark: SparkSession,
    table: Table,
    group: FileGroup,
    base_snapshot: int,
    target_bytes: int,
    schema,
    stat_columns,
) -> dict:
    t0 = monotonic()
    subdir = f"compact-{base_snapshot:08d}-g{group.group_id:05d}"
    out_dir = os.path.join(table.data_dir, subdir)
    if os.path.exists(out_dir):
        # group died mid-write (no checkpoint line) — partial output is dead
        import shutil

        shutil.rmtree(out_dir)
    in_paths = [os.path.join(table.root, p) for p in group.paths]
    n_out = max(1, math.ceil(group.bytes / target_bytes))
    df = spark.read.schema(schema).parquet(*in_paths)
    # coalesce: no shuffle — small whole files concatenate into n_out files
    df.coalesce(n_out).write.mode("error").parquet(out_dir)
    outs = collect_entries(list_parquet_files(out_dir), table.root, stat_columns)
    return {
        "group_id": group.group_id,
        "status": "done",
        "input_files": group.paths,
        "output_files": [e.path for e in outs],
        "outputs": [e.to_dict() for e in outs],
        "rows": sum(e.rows for e in outs),
        "bytes": sum(e.bytes for e in outs),
        "wall_ms": int((monotonic() - t0) * 1000),
    }


def compact(
    spark: SparkSession,
    table: Table,
    target_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    small_file_ratio: float = 0.75,
    checkpoint_path: str | None = None,
    max_concurrent_groups: int = 4,
    fail_after_groups: int | None = None,
    schema=TRANSCRIPTS_SCHEMA,
    stat_columns=TRANSCRIPTS_STAT_COLUMNS,
) -> dict:
    """Compact small files; returns metrics. Resumable: re-running with the
    same checkpoint path after a crash skips finished groups and commits."""
    base_snapshot = table.current_snapshot_id()
    if base_snapshot is None:
        raise ValueError("cannot compact an empty table")
    entries = table.entries()
    groups, kept = plan_bin_packing(entries, target_bytes, small_file_ratio)
    metrics = {
        "base_snapshot": base_snapshot,
        "planned_groups": len(groups),
        "input_files": sum(len(g.entries) for g in groups),
        "kept_files": len(kept),
    }
    if not groups:
        metrics.update({"committed_snapshot": base_snapshot, "noop": True})
        return metrics

    ckpt = Checkpoint(
        checkpoint_path
        or os.path.join(table.metadata_dir, f"compact-{base_snapshot:08d}.ckpt.jsonl")
    )
    done = ckpt.done()
    completed_this_run = 0
    lock = threading.Lock()

    def run_group(g: FileGroup) -> dict:
        rec = _rewrite_group(
            spark, table, g, base_snapshot, target_bytes, schema, stat_columns
        )
        nonlocal completed_this_run
        with lock:
            ckpt.record(rec)
            completed_this_run += 1
            if fail_after_groups is not None and completed_this_run >= fail_after_groups:
                raise SimulatedCrash(f"simulated crash after {completed_this_run} groups")
        return rec

    todo = [g for g in groups if g.group_id not in done]
    if todo:
        with ThreadPoolExecutor(max_workers=max(1, max_concurrent_groups)) as ex:
            futs = [ex.submit(run_group, g) for g in todo]
            for f in as_completed(futs):
                f.result()  # propagate SimulatedCrash / real failures

    done = ckpt.done()
    removed, added = [], []
    for g in groups:
        rec = done[g.group_id]
        removed.extend(rec["input_files"])
        added.extend(DataFileEntry.from_dict(d) for d in rec["outputs"])
    snap = table.commit_rewrite(
        removed,
        added,
        operation="replace",
        summary={"op": "compact", "groups": len(groups), "removed_files": len(removed)},
    )
    ckpt.clear()
    metrics.update(
        {
            "committed_snapshot": snap.snapshot_id,
            "output_files": len(added),
            "rewritten_bytes": sum(e.bytes for e in added),
            "rewritten_rows": sum(e.rows for e in added),
            "resumed_groups": len(groups) - len(todo),
        }
    )
    return metrics
