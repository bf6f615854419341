"""North-rule packaging proof: the engine runs via ``spark-submit
--py-files dist/engine.zip run_maintenance.py`` (BASELINE.json: "ships as
a spark-submit --py-files package").

The test builds the zip from the working tree, then drives create →
compact → inspect through REAL ``spark-submit`` subprocesses whose cwd is
a temp dir and whose environment carries no PYTHONPATH — the package can
only come from the ``--py-files`` zip, exactly as on a cluster edge node.
Reference analog: the Glue job submission in
``/root/reference/src/step_functions/etl_orchestrator.json`` (Glue wraps
the same spark-submit contract).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "e_commerce_lakehouse_spark"


def _spark_submit() -> str | None:
    found = shutil.which("spark-submit")
    if found:
        return found
    try:
        import pyspark

        cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
        return cand if os.access(cand, os.X_OK) else None
    except ImportError:
        return None


def _build_zip(path: str) -> None:
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))


def _submit(binary: str, zip_path: str, cwd: str, *cli_args: str) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            binary,
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "run_maintenance.py"),
            *cli_args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"spark-submit {cli_args} failed (rc={proc.returncode}):\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}"
    )
    return proc.stdout


def test_spark_submit_package_lifecycle(tmp_path):
    binary = _spark_submit()
    if binary is None:
        pytest.skip("no spark-submit on PATH or in the pyspark install")
    zip_path = str(tmp_path / "engine.zip")
    _build_zip(zip_path)
    table = str(tmp_path / "tbl")
    workdir = str(tmp_path / "edge-node")
    os.makedirs(workdir)

    _submit(binary, zip_path, workdir,
            "--table", table, "--op", "create",
            "--n-turns", "20000", "--seed", "7")
    assert os.path.isfile(os.path.join(table, "metadata", "VERSION"))

    # 20k synthetic turns land as ~2 sub-MB files; a 16 MB target
    # bin-packs them into one rewrite (a 1 MB target would no-op)
    _submit(binary, zip_path, workdir,
            "--table", table, "--op", "compact", "--target-mb", "16")

    out = _submit(binary, zip_path, workdir,
                  "--table", table, "--op", "inspect")
    # the driver prints one JSON object; Spark may interleave log lines
    payload = None
    for line in out.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                payload = json.loads(line)
            except json.JSONDecodeError:
                continue
    assert payload is not None, f"no JSON in inspect output: {out[-1500:]}"
    assert payload.get("rows") == 20000, payload
    # compaction happened: head snapshot is a rewrite, not the ingest
    assert payload.get("operation") in ("replace", "compact"), payload
    assert len(payload.get("snapshots", [])) >= 2, payload
