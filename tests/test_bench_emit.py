"""The bench's printed JSON line must fit the driver's capture window.

The per-round driver keeps only the LAST 2000 characters of bench.py's
stdout and parses the JSON line from that tail. Round 3's line inlined
the full attempts array, overflowed the window, and the round's bench
was recorded as ``"parsed": null`` — a formatting artifact failed the
gate. ``bench._emit`` is the guarantee that can never recur: whatever
the maintenance payload grows to, the printed line stays parseable and
within budget, with full detail diverted to BENCH/DETAIL_last.json.

No SparkSession needed: these tests exercise only the serialization.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

DRIVER_TAIL_CHARS = 2000


def _cycle(cores):
    return {
        "compact_sec": 34.566, "cluster_sec": 56.707, "wall_sec": 91.274,
        "compact_groups": 68,
        "compact_phase": {"wave_sec": 34.49, "task_read_sec": 136.92,
                          "task_write_sec": 106.14, "waves": 1},
        "cluster_files": 36, "cores": cores, "n_turns": 12_000_000,
        "rep": 1, "turns_per_sec": 131472.3, "sentinel_gbps": 20.1,
        "noisy_window": False,
    }


def _attempt():
    return {
        "n": _cycle(2), "4n": _cycle(8), "speedup_n_to_4n": 3.2,
        "scaling_efficiency": 0.81, "target": 0.8, "interleaved_reps": 1,
        "sentinel_tmpfs_gbps": 25.2, "sentinel_quiet_threshold_gbps": 10.0,
        "sentinel_rejected_readings": [0.07, 4.2],
        "sentinel_gate_forced": False, "sentinel_after_gbps": 22.0,
        "page_reporting_suspended": True, "implausible_4n_slower": False,
        "sentinel_balance": 1.2, "task_read_ratio": 1.1, "clean": True,
        "noisy_cycles": 0, "degraded_read_cycles": 0,
        "repaired_cycles": 0, "total_cycles": 2,
    }


def _result(n_attempts=6, n_queries=13):
    att = _attempt()
    maint = dict(att, attempts=[_attempt() for _ in range(n_attempts)],
                 compact_only_efficiency=0.94,
                 pure_arrow_ab={"groups": 68, "n_procs": 2, "4n_procs": 8,
                                "n_wall_sec": 10.0, "4n_wall_sec": 3.1,
                                "efficiency": 0.8},
                 hilbert_4n_sec=25.6)
    return {
        "metric": "compact+zorder wall sec @ local[8], 12000000 turns",
        "value": 91.274, "unit": "sec",
        "queries": {f"q{i:02d}_some_operator_name": round(1.234 + i, 3)
                    for i in range(n_queries)},
        "sf": 0.1, "maintenance": maint,
    }


def test_emit_fits_driver_window_and_parses(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    line = bench._emit(_result())
    assert len(line) <= 1900
    parsed = json.loads(line)
    # driver contract fields survive intact
    assert parsed["unit"] == "sec"
    assert parsed["value"] == 91.274
    assert len(parsed["queries"]) == 13
    assert parsed["maintenance"]["scaling_efficiency"] == 0.81
    assert parsed["maintenance"]["clean"] is True
    # the full payload landed in the detail file
    detail = json.loads((tmp_path / "BENCH" / "DETAIL_last.json").read_text())
    assert len(detail["maintenance"]["attempts"]) == 6


def test_emit_survives_pathological_growth(tmp_path, monkeypatch):
    """Even a payload far beyond anything the bench produces (60 attempts,
    40 queries) must shrink to a parseable line inside the window."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    r = _result(n_attempts=60, n_queries=40)
    line = bench._emit(r)
    assert len(line) < DRIVER_TAIL_CHARS
    parsed = json.loads(line)
    assert parsed["maintenance"]["scaling_efficiency"] == 0.81
    assert parsed["queries"]  # at least a subset retained


def test_emit_simulated_driver_tail_capture(tmp_path, monkeypatch):
    """End-to-end shape of the driver's capture: noise before the line,
    keep the last 2000 chars, parse the final non-empty line."""
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    line = bench._emit(_result())
    stdout = "WARN noisy spark logline\n" * 400 + line + "\n"
    tail = stdout[-DRIVER_TAIL_CHARS:]
    last = [ln for ln in tail.splitlines() if ln.strip()][-1]
    assert json.loads(last)["value"] == 91.274


def test_emit_detail_write_failure_is_nonfatal(tmp_path, monkeypatch):
    """If BENCH/ is unwritable the line still prints (detail=None)."""
    blocker = tmp_path / "BENCH"
    blocker.write_text("not a directory")
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    line = bench._emit(_result())
    parsed = json.loads(line)
    assert parsed["maintenance"]["detail"] is None
