"""Metadata plan-time micro-bench: manifest parse + prune vs file count.

Answers the 100 TB metadata question (VERDICT r2): how long does a
planning pass (manifest_entries -> prune_entries -> path list) take at
10k / 100k / 800k files, for the JSON vs parquet manifest codec?

Pure driver-side, no Spark. Prints one JSON line per (codec, n_files)
with write/parse/prune times and manifest size on disk.

Usage: python tools/bench_manifest_plan.py [n_files ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e_commerce_lakehouse_spark.table import meta as M  # noqa: E402
from e_commerce_lakehouse_spark.table.meta import DataFileEntry, Table  # noqa: E402
from e_commerce_lakehouse_spark.table.scan import planned_entries, prune_entries  # noqa: E402

ROOT = "/tmp/spark_graft_manifest_bench"


def synth_entries(n: int) -> list[DataFileEntry]:
    """Realistic entries: clustered conv_id ranges + ts micros ranges,
    shaped like what collect_entries produces for the transcripts table."""
    out = []
    per = 40  # conv ranks per file (post-clustering locality)
    for i in range(n):
        lo = i * per
        stats = {
            "conv_id": [f"conv-{lo:012d}", f"conv-{lo + per - 1:012d}"],
            "turn_idx": [0, 199],
            "ts": [1_700_000_000_000_000 + i * 1_000_000,
                   1_700_000_000_000_000 + (i + 1) * 1_000_000],
        }
        out.append(DataFileEntry(path=f"data/part-{i:07d}.parquet",
                                 rows=20_000, bytes=8 << 20, stats=stats))
    return out


def bench(codec: str, n: int, reps: int = 3) -> dict:
    old = M.MANIFEST_CODEC
    M.MANIFEST_CODEC = codec
    try:
        shutil.rmtree(ROOT, ignore_errors=True)
        t = Table.create(ROOT)
        entries = synth_entries(n)
        t0 = time.monotonic()
        snap = t.commit_append(entries)
        write_s = time.monotonic() - t0
        name = snap.manifests[0]
        size = os.path.getsize(os.path.join(t.metadata_dir, name))
        point = f"conv-{(n // 2) * 40:012d}"

        parse_s, full_plan_s, pruned_plan_s = [], [], []
        for _ in range(reps):
            # (a) full materialization: what compact/merge planning needs
            t0 = time.monotonic()
            got = t.entries()
            t1 = time.monotonic()
            kept = prune_entries(got, conv_id=point)
            t2 = time.monotonic()
            # (b) the SCAN planning path: predicate pushed into the
            # manifest read (vectorized for parquet manifests)
            t3 = time.monotonic()
            planned = planned_entries(t, conv_id=point)
            paths = [os.path.join(t.root, e.path) for e in planned]
            t4 = time.monotonic()
            parse_s.append(t1 - t0)
            full_plan_s.append(t2 - t0)
            pruned_plan_s.append(t4 - t3)
        assert len(got) == n and len(paths) >= 1
        assert {e.path for e in kept} == {e.path for e in planned}
        return {
            "codec": codec,
            "n_files": n,
            "manifest_mb": round(size / 1e6, 2),
            "write_sec": round(write_s, 3),
            "full_parse_sec": round(min(parse_s), 3),
            "full_plan_sec": round(min(full_plan_s), 3),
            "pruned_plan_sec": round(min(pruned_plan_s), 3),
            "pruned_to": len(paths),
        }
    finally:
        M.MANIFEST_CODEC = old
        shutil.rmtree(ROOT, ignore_errors=True)


def main():
    ns = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 800_000]
    for n in ns:
        for codec in ("json", "parquet"):
            print(json.dumps(bench(codec, n)), flush=True)


if __name__ == "__main__":
    main()
