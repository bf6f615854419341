"""Multi-op maintenance pipeline: compact → cluster → … as ONE resumable
driver run with per-stage retry/catch and a summary artifact.

Reference analog: the Step Functions orchestrator fans its ETL stages out
with Retry/Catch states and a final summary notification
(`/root/reference/src/step_functions/etl_orchestrator.json:249-353`).
Here control flow is a deterministic driver; durability is layered:

- STAGE checkpoint (this module): one JSONL line per completed stage, so
  a killed pipeline rerun skips finished stages entirely (their recorded
  result is reused) and re-enters the stage that died.
- GROUP checkpoints (the operators' own): the re-entered stage resumes
  at file-group / shard granularity, not from zero.
- RETRY: each stage retries with exponential backoff (the orchestrator's
  IntervalSeconds/BackoffRate shape); because retry = resume, a retried
  compact re-runs only unfinished groups.
- CATCH: a stage that exhausts its retries is recorded as failed in the
  summary artifact (with its error) before the exception propagates —
  the Step Functions Catch→notify path, minus the SNS topic.

The summary artifact (<checkpoint>.summary.json, atomic os.replace) is
rewritten after every stage transition, so an operator watching the file
sees live progress and a crash leaves an accurate last state.
"""

from __future__ import annotations

import json
import os
import time

from .checkpoint import Checkpoint
from .table.meta import Table

DEFAULT_STAGES = ("compact", "cluster", "rewrite-manifests", "expire")


class PipelineCrash(RuntimeError):
    """Raised by fail_after_stages to exercise kill/resume in tests."""


def with_retries(fn, attempts: int = 3, backoff_s: float = 2.0, rate: float = 2.0):
    """Run ``fn`` with exponential-backoff retries; composes with the
    operators' file-group checkpoints (retry = resume, not redo). The one
    shared retry loop — run_maintenance imports this (review finding:
    two near-verbatim copies)."""
    last = None
    for i in range(max(1, attempts)):
        try:
            return fn()
        except (KeyboardInterrupt, PipelineCrash):
            raise
        except Exception as e:  # noqa: BLE001 — orchestrator boundary
            last = e
            if i + 1 < attempts:
                time.sleep(backoff_s * (rate**i))
    raise last


_with_retries = with_retries


def run_pipeline(
    spark,
    table_root: str,
    stages=DEFAULT_STAGES,
    target_bytes: int = 128 << 20,
    curve: str = "zorder",
    keep_last: int = 2,
    checkpoint_path: str | None = None,
    retries: int = 3,
    backoff_s: float = 2.0,
    fail_after_stages: int | None = None,
) -> dict:
    """Run ``stages`` in order over the table at ``table_root``. Returns
    the summary dict (also persisted as <checkpoint>.summary.json).
    Re-running with the same checkpoint resumes after the last completed
    stage. Stage names: compact | cluster | rewrite-manifests | expire |
    materialize-deletes."""
    from .operators import cluster, compact, expire_snapshots, rewrite_manifests
    from .operators.rowlevel import materialize_deletes

    unknown = [s for s in stages if s not in
               ("compact", "cluster", "rewrite-manifests", "expire",
                "materialize-deletes")]
    if unknown:
        raise ValueError(f"unknown pipeline stage(s): {unknown}")
    t = Table.load(table_root)
    ckpt_path = checkpoint_path or os.path.join(
        t.metadata_dir, "pipeline-" + "-".join(stages) + ".ckpt.jsonl"
    )
    ckpt = Checkpoint(ckpt_path)
    summary_path = ckpt_path + ".summary.json"
    done = ckpt.done()

    def _write_summary(obj: dict) -> None:
        tmp = summary_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, summary_path)

    summary: dict = {"stages": list(stages), "results": {}, "status": "running",
                     "checkpoint": ckpt_path}
    completed_this_run = 0
    for i, stage in enumerate(stages):
        if i in done:
            summary["results"][stage] = {"resumed": True, **done[i]["result"]}
            continue
        t0 = time.monotonic()

        def _run(stage=stage):
            # reload per attempt: a CommitConflictError retry must re-plan
            # from the CURRENT head, not a stale Table instance
            tbl = Table.load(table_root)
            if stage == "compact":
                return compact(spark, tbl, target_bytes=target_bytes)
            if stage == "cluster":
                return cluster(spark, tbl, curve=curve, target_bytes=target_bytes)
            if stage == "rewrite-manifests":
                return rewrite_manifests(tbl)
            if stage == "expire":
                return expire_snapshots(tbl, keep_last=keep_last)
            return materialize_deletes(spark, tbl, target_bytes=target_bytes)

        try:
            result = _with_retries(_run, attempts=retries, backoff_s=backoff_s)
        except Exception as e:  # Catch: record, then propagate
            summary["results"][stage] = {"failed": True, "error": f"{type(e).__name__}: {e}"}
            summary["status"] = f"failed at {stage}"
            _write_summary(summary)
            raise
        rec = {"group_id": i, "status": "done", "stage": stage,
               "result": _json_safe(result),
               "wall_ms": int((time.monotonic() - t0) * 1000)}
        ckpt.record(rec)
        summary["results"][stage] = _json_safe(result)
        _write_summary(summary)
        completed_this_run += 1
        if fail_after_stages is not None and completed_this_run >= fail_after_stages:
            raise PipelineCrash(f"simulated crash after {completed_this_run} stages")
    summary["status"] = "done"
    summary["resumed_stages"] = len(stages) - completed_this_run
    _write_summary(summary)
    ckpt.clear()
    return summary


def _json_safe(obj):
    """Operators return metric dicts that are already JSON-ish; coerce the
    odd non-serializable leaf (sets, Paths) to strings."""
    try:
        json.dumps(obj)
        return obj
    except TypeError:
        return json.loads(json.dumps(obj, default=str))


def run_pipeline_many(
    spark,
    table_roots: list[str],
    stages=DEFAULT_STAGES,
    max_concurrent_tables: int = 4,
    **kwargs,
) -> dict:
    """The reference's Parallel state fans all three ETL jobs out at once
    (`etl_orchestrator.json:249-353`); this is that shape for N tables:
    each table's pipeline runs in its own thread (Spark jobs interleave
    on the FAIR scheduler), each with its OWN stage checkpoint and
    summary artifact, and one table's failure does not stop the others —
    per-branch Catch, aggregated at the end like the orchestrator's
    joined Parallel output.

    Returns {"tables": {root: summary-or-error}, "ok": int, "failed":
    int}; raises nothing unless EVERY table failed (all-branches-failed =
    the run itself is broken)."""
    from concurrent.futures import ThreadPoolExecutor, as_completed

    if kwargs.get("checkpoint_path"):
        raise ValueError(
            "run_pipeline_many uses each table's OWN metadata-dir checkpoint; "
            "a shared checkpoint_path would cross-resume between tables"
        )
    results: dict[str, dict] = {}

    def _one(root: str) -> dict:
        return run_pipeline(spark, root, stages=stages, **kwargs)

    with ThreadPoolExecutor(max_workers=max(1, max_concurrent_tables)) as ex:
        futs = {ex.submit(_one, r): r for r in table_roots}
        for f in as_completed(futs):
            root = futs[f]
            try:
                results[root] = f.result()
            except Exception as e:  # noqa: BLE001 — per-branch Catch
                results[root] = {"status": "failed",
                                 "error": f"{type(e).__name__}: {e}"}
    ok = sum(1 for r in results.values() if r.get("status") == "done")
    out = {"tables": results, "ok": ok, "failed": len(results) - ok}
    if table_roots and ok == 0:
        raise RuntimeError(f"all {len(table_roots)} table pipelines failed: "
                           f"{ {r: v.get('error') for r, v in results.items()} }")
    return out
