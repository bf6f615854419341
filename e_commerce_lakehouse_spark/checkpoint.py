"""Per-file-group lineage checkpointing: JSONL, resumable.

North rule: "every stage checkpoints per-partition lineage and metrics so
a killed run resumes at file-group granularity". Each completed group
appends ONE fsync'd JSON line {group_id, input_files, output_files, rows,
bytes, wall_ms, status}; resume reads complete lines (a torn final line
from a crash is ignored) and skips finished groups.

Reference analog: move-after-success archival as the completion marker
(`/root/reference/src/lambda/file_archiver.py:26-64`) — ours is
finer-grained and carries metrics.
"""

from __future__ import annotations

import json
import os


class Checkpoint:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def records(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        out = []
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    # torn tail line from a crash — everything after is unreliable
                    break
        return out

    def done(self) -> dict[int, dict]:
        return {r["group_id"]: r for r in self.records() if r.get("status") == "done"}

    def record(self, rec: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def clear(self) -> None:
        if os.path.exists(self.path):
            os.remove(self.path)
