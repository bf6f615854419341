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


def plan_bin_packing_ordered(
    entries: list[DataFileEntry],
    target_bytes: int,
    small_file_ratio: float = 0.75,
    stat_key: str = "conv_id",
) -> tuple[list[FileGroup], list[DataFileEntry]]:
    """Locality-preserving variant: pack CONSECUTIVE files in ``stat_key``
    min-order instead of first-fit-decreasing by size.

    Why it exists: after Z-order/Hilbert clustering, files carry narrow
    DISJOINT key ranges — that's what makes stat-based file skipping
    work. Size-ordered FFD merges files from distant key ranges into one
    output, exploding its [min, max] width and silently degrading every
    future point/range scan. Packing adjacent-range files keeps each
    output's stat range the union of NEIGHBORS — still narrow — at the
    cost of slightly less optimal fill (a bin closes when the next
    consecutive file would overflow it). Same O(n log n) plan, stats
    only. Files without the stat sort last (path order, deterministic).
    """
    threshold = int(target_bytes * small_file_ratio)
    kept = [e for e in entries if e.bytes >= threshold]

    # sort in the stat's NATIVE type (stringifying ints would order '10'
    # before '9'); stat-less files go last in deterministic path order
    candidates = [e for e in entries if e.bytes < threshold]
    with_stats = [e for e in candidates if e.stats.get(stat_key) is not None]
    without = sorted((e for e in candidates if e.stats.get(stat_key) is None),
                     key=lambda e: e.path)
    with_stats.sort(key=lambda e: (e.stats[stat_key][0], e.stats[stat_key][1], e.path))
    small = with_stats + without
    bins: list[list[DataFileEntry]] = []
    cur: list[DataFileEntry] = []
    cur_bytes = 0
    for e in small:
        if cur and cur_bytes + e.bytes > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(e)
        cur_bytes += e.bytes
    if cur:
        bins.append(cur)

    groups: list[FileGroup] = []
    gid = 0
    for b in bins:
        if len(b) == 1:
            kept.append(b[0])
            continue
        groups.append(FileGroup(group_id=gid, entries=b))
        gid += 1
    return groups, kept
