"""Multi-op pipeline: stage checkpoint/resume, retry/catch, summary
artifact (reference analog: Step Functions Retry/Catch fan-out,
etl_orchestrator.json:249-353)."""

from __future__ import annotations

import json
import os

import pytest

from e_commerce_lakehouse_spark.pipeline import PipelineCrash, run_pipeline
from e_commerce_lakehouse_spark.table import scan
from tests.conftest import N_TURNS, assert_same_rows


def test_pipeline_runs_all_stages_and_writes_summary(spark, tiny_table, tiny_df, tmp_path):
    ck = str(tmp_path / "pipe.ckpt.jsonl")
    s = run_pipeline(spark, tiny_table.root, target_bytes=1 << 20,
                     checkpoint_path=ck)
    assert s["status"] == "done"
    assert set(s["results"]) == {"compact", "cluster", "rewrite-manifests", "expire"}
    assert s["results"]["cluster"]["output_files"] >= 1
    # summary artifact persisted and parseable
    disk = json.load(open(ck + ".summary.json"))
    assert disk["status"] == "done"
    # content byte-identical through the whole pipeline
    assert_same_rows(
        tiny_df.select("conv_id", "turn_idx", "text"),
        scan(spark, tiny_table).select("conv_id", "turn_idx", "text"),
    )
    assert not os.path.exists(ck)  # cleared on success


def test_pipeline_kill_and_resume_across_stage_boundary(spark, tiny_table, tiny_df, tmp_path):
    """Killed after compact: the rerun skips compact (stage checkpoint)
    and completes the remaining stages; final content intact."""
    ck = str(tmp_path / "pipe.ckpt.jsonl")
    with pytest.raises(PipelineCrash):
        run_pipeline(spark, tiny_table.root, target_bytes=1 << 20,
                     checkpoint_path=ck, fail_after_stages=1)
    # crash state visible in the summary artifact
    mid = json.load(open(ck + ".summary.json"))
    assert "compact" in mid["results"] and "cluster" not in mid["results"]
    sid_after_crash = tiny_table.current_snapshot_id()

    s = run_pipeline(spark, tiny_table.root, target_bytes=1 << 20,
                     checkpoint_path=ck)
    assert s["status"] == "done"
    assert s["resumed_stages"] == 1
    assert s["results"]["compact"].get("resumed") is True
    # compact was NOT re-run (no extra snapshot from it)
    assert tiny_table.snapshot(sid_after_crash + 1).operation == "replace"
    assert scan(spark, tiny_table).count() == N_TURNS


def test_pipeline_catch_records_failure(spark, tiny_table, tmp_path):
    ck = str(tmp_path / "pipe.ckpt.jsonl")
    with pytest.raises(ValueError):
        run_pipeline(spark, tiny_table.root, stages=("compact", "nonsense"),
                     checkpoint_path=ck)
    # unknown stage rejected before any work
    assert not os.path.exists(ck + ".summary.json")

    # a stage that genuinely fails (bad curve) is caught + recorded
    with pytest.raises(ValueError, match="unknown curve"):
        run_pipeline(spark, tiny_table.root, stages=("compact", "cluster"),
                     target_bytes=1 << 20, checkpoint_path=ck,
                     curve="bogus", retries=1)
    disk = json.load(open(ck + ".summary.json"))
    assert disk["status"] == "failed at cluster"
    assert disk["results"]["cluster"]["failed"] is True
    assert "unknown curve" in disk["results"]["cluster"]["error"]


def test_pipeline_many_parallel_with_per_branch_catch(spark, tiny_df, tmp_path):
    """N-table Parallel fan-out (the reference's three-ETL Parallel
    state): healthy tables complete even when a sibling branch fails, and
    the aggregate records both."""
    from e_commerce_lakehouse_spark.pipeline import run_pipeline_many
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

    roots = []
    for i in range(2):
        root = str(tmp_path / f"t{i}")
        create_transcripts_table(
            spark, root, tiny_df.limit(400), rows_per_file=50
        )
        roots.append(root)
    bad = str(tmp_path / "not-a-table")  # load fails inside the branch

    out = run_pipeline_many(spark, roots + [bad], target_bytes=1 << 20,
                            retries=1)
    assert out["ok"] == 2 and out["failed"] == 1
    assert out["tables"][bad]["status"] == "failed"
    for r in roots:
        assert out["tables"][r]["status"] == "done"
        assert scan(spark, Table.load(r)).count() == 400

    # all-branches-failed raises
    with pytest.raises(RuntimeError, match="all 1 table pipelines failed"):
        run_pipeline_many(spark, [bad], retries=1)

    # shared checkpoint_path is refused (would cross-resume tables)
    with pytest.raises(ValueError, match="cross-resume"):
        run_pipeline_many(spark, roots, checkpoint_path="/tmp/x.ckpt")
