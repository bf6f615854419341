"""Per-file min/max stats from Parquet footers.

Replaces object-store LIST + full scans (reference enumerates S3 keys and
counts every file: `/root/reference/src/glue_jobs/orders_etl.py:54-78`).
We read ONLY the Parquet footer metadata — no data pages — and aggregate
row-group stats into file-level [min, max] per stat column. These power
file skipping in table/scan.py and touched-file pruning in MERGE.

At cluster scale footer reads are distributed over executors
(``collect_entries`` with a SparkSession); driver-side is fine for small
file counts.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Iterable

import pyarrow.parquet as pq

from .meta import DataFileEntry

# distribute footer reads above this many files
_DISTRIBUTE_THRESHOLD = 64


def _norm(v):
    """Normalize a parquet stat value to a JSON total-orderable scalar."""
    if isinstance(v, bytes):
        return v.decode("utf-8", errors="replace")
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        epoch = _dt.datetime(1970, 1, 1)
        return int((v - epoch).total_seconds() * 1_000_000)
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def file_entry(abs_path: str, root: str, stat_columns: Iterable[str]) -> DataFileEntry:
    """Build a DataFileEntry from one file's footer."""
    pf = pq.ParquetFile(abs_path)
    md = pf.metadata
    name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    stats: dict[str, list] = {}
    for col in stat_columns:
        ci = name_to_idx.get(col)
        if ci is None:
            continue
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                mins, maxs = [], []
                break
            mins.append(_norm(st.min))
            maxs.append(_norm(st.max))
        if mins:
            stats[col] = [min(mins), max(maxs)]
    return DataFileEntry(
        path=os.path.relpath(abs_path, root),
        rows=md.num_rows,
        bytes=os.path.getsize(abs_path),
        stats=stats,
    )


def collect_entries(
    abs_paths: list[str],
    root: str,
    stat_columns: Iterable[str],
    spark=None,
) -> list[DataFileEntry]:
    """Footer-stat collection; distributed over executors when the file
    count is large and a SparkSession is provided."""
    stat_columns = tuple(stat_columns)
    if spark is not None and len(abs_paths) > _DISTRIBUTE_THRESHOLD:
        sc = spark.sparkContext
        n_slices = min(len(abs_paths), 64)

        def _part(paths):
            import pyarrow.parquet  # noqa: F401  (ensure import on executor)

            return [file_entry(p, root, stat_columns).to_dict() for p in paths]

        dicts = sc.parallelize(abs_paths, n_slices).mapPartitions(_part).collect()
        by_path = {d["path"]: DataFileEntry.from_dict(d) for d in dicts}
        # preserve caller ordering
        return [by_path[os.path.relpath(p, root)] for p in abs_paths]
    return [file_entry(p, root, stat_columns) for p in abs_paths]


def list_parquet_files(directory: str) -> list[str]:
    """Deterministically ordered parquet part files under a directory."""
    out = []
    for dirpath, _dirnames, filenames in os.walk(directory):
        for fn in filenames:
            if fn.endswith(".parquet") and not fn.startswith("."):
                out.append(os.path.join(dirpath, fn))
    return sorted(out)
