"""Driver-side bin-packing planner for compaction.

Plans file GROUPS from manifest stats only — no data is read to plan
(the reference instead lists + counts every file through Spark:
`/root/reference/src/glue_jobs/orders_etl.py:71-100`). First-fit-decreasing
over file byte sizes; each group rewrites to ≈ target_bytes files.

Planning is O(n log n) in FILE COUNT, which at 100 TB / 128 MB files is
~800k entries — comfortably driver-side; the heavy lifting (the rewrites)
is Spark-distributed per group.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..table.meta import DataFileEntry


@dataclass
class FileGroup:
    group_id: int
    entries: list[DataFileEntry] = field(default_factory=list)

    @property
    def bytes(self) -> int:
        return sum(e.bytes for e in self.entries)

    @property
    def rows(self) -> int:
        return sum(e.rows for e in self.entries)

    @property
    def paths(self) -> list[str]:
        return [e.path for e in self.entries]


def plan_bin_packing(
    entries: list[DataFileEntry],
    target_bytes: int,
    small_file_ratio: float = 0.75,
) -> tuple[list[FileGroup], list[DataFileEntry]]:
    """Return (groups_to_rewrite, entries_kept_as_is).

    Files ≥ small_file_ratio·target are already healthy → kept. The rest
    are first-fit-decreasing packed into bins of ≤ target_bytes. A bin
    containing a single file is pointless to rewrite → kept as-is.
    """
    threshold = int(target_bytes * small_file_ratio)
    small = sorted(
        (e for e in entries if e.bytes < threshold),
        key=lambda e: (-e.bytes, e.path),
    )
    kept = [e for e in entries if e.bytes >= threshold]

    bins: list[list[DataFileEntry]] = []
    bin_free: list[int] = []
    for e in small:
        placed = False
        for i, free in enumerate(bin_free):
            if e.bytes <= free:
                bins[i].append(e)
                bin_free[i] -= e.bytes
                placed = True
                break
        if not placed:
            bins.append([e])
            bin_free.append(target_bytes - e.bytes)

    groups: list[FileGroup] = []
    gid = 0
    for b in bins:
        if len(b) == 1:  # nothing to gain rewriting a lone file
            kept.append(b[0])
            continue
        groups.append(FileGroup(group_id=gid, entries=b))
        gid += 1
    return groups, kept
