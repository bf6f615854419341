"""ANALYZE: distributed table-level column statistics.

Manifest stats (table/stats.py) are PER-FILE min/max for pruning; this
op computes TABLE-level statistics — null counts, approximate NDV
(HyperLogLog++ via approx_count_distinct, mergeable at any scale),
min/max — in ONE single-pass aggregation job (every stat is a partial
agg, so the scan streams once and shuffles one row per partition), and
persists them to ``metadata/analyze-<snapshot>.json``.

Downstream uses: MERGE can bound touched-file estimates, compaction can
detect all-null droppable columns, and operators-of-the-future get
Iceberg/Delta-style NDV hints without a second scan. The reference has
no stats story at all (its Glue jobs re-infer schema per run and never
collect NDV).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..table.meta import Table
from ..table.scan import resolve_schema, scan


def analyze(
    spark: SparkSession,
    table: Table,
    columns: list[str] | None = None,
    rsd: float = 0.05,
) -> dict:
    """Compute + persist column stats for the current snapshot.

    ``rsd``: approx_count_distinct's relative standard deviation (HLL++
    precision/size tradeoff). Returns {"snapshot", "rows", "columns":
    {col: {nulls, ndv_approx, min, max}}}; re-running on the same
    snapshot overwrites (stats are idempotent per snapshot)."""
    sid = table.current_snapshot_id()
    if sid is None:
        raise ValueError("cannot analyze an empty table")
    schema = resolve_schema(table, sid)
    names = [f.name for f in schema.fields]
    if columns is not None:
        unknown = set(columns) - set(names)
        if unknown:
            raise ValueError(f"no such columns: {sorted(unknown)}")
        names = [n for n in names if n in set(columns)]

    df = scan(spark, table, snapshot_id=sid)
    aggs = [F.count("*").alias("__rows")]
    for c in names:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls__{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"ndv__{c}"))
        aggs.append(F.min(c).alias(f"min__{c}"))
        aggs.append(F.max(c).alias(f"max__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    stats = {
        "snapshot": sid,
        "rows": row["__rows"],
        "rsd": rsd,
        "columns": {
            c: {
                "nulls": row[f"nulls__{c}"],
                "ndv_approx": row[f"ndv__{c}"],
                "min": _jsonable(row[f"min__{c}"]),
                "max": _jsonable(row[f"max__{c}"]),
            }
            for c in names
        },
    }
    path = os.path.join(table.metadata_dir, f"analyze-{sid:08d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f, default=str)
    os.replace(tmp, path)
    return stats


def read_stats(table: Table, snapshot_id: int | None = None) -> dict | None:
    """Stored ANALYZE stats for a snapshot (None if never analyzed)."""
    sid = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    path = os.path.join(table.metadata_dir, f"analyze-{sid:08d}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _jsonable(v):
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    return v


def clustering_depth_report(
    table: Table, key_col: str, snapshot_id: int | None = None
) -> dict:
    """Metadata-only clustering-effectiveness audit: how much do the
    data files' [min, max] ranges of ``key_col`` overlap each other?

    For each file carrying stats, depth = number of OTHER files whose
    key range intersects it (two binary searches over the sorted
    lower/upper bounds — O(F log F) driver-side over manifest entries,
    zero data reads; same planning precedent as compact's FFD pass).
    A well-clustered table (post Z-order/Hilbert) has mostly-disjoint
    ranges -> depth ~0; a freshly-appended table has near-total overlap.

    Returns a report dict: n_files, n_with_stats, n_missing_stats,
    max_depth, avg_depth_ppm (exact integer ppm), n_disjoint,
    disjoint_frac_ppm, total_overlap_pairs.
    """
    import bisect

    entries = table.entries(snapshot_id)
    ivals = []
    missing = 0
    for e in entries:
        st = e.stats.get(key_col)
        if not st or st[0] is None or st[1] is None:
            missing += 1
            continue
        ivals.append((st[0], st[1]))
    base = {
        "key": key_col,
        "n_files": len(entries),
        "n_with_stats": len(ivals),
        "n_missing_stats": missing,
    }
    if not ivals:
        base.update(
            max_depth=0, avg_depth_ppm=0, n_disjoint=0,
            disjoint_frac_ppm=0, total_overlap_pairs=0,
        )
        return base
    kinds = {type(v) for pair in ivals for v in pair}
    if len(kinds) > 1:
        raise ValueError(
            f"clustering_depth_report: mixed stat types for {key_col!r}: "
            f"{sorted(k.__name__ for k in kinds)} — manifest bounds must "
            "be uniformly typed to be order-comparable"
        )
    los = sorted(lo for lo, _ in ivals)
    his = sorted(hi for _, hi in ivals)
    n = len(ivals)
    depths = []
    for lo, hi in ivals:
        covers_lo = bisect.bisect_right(los, hi)  # files with lo_j <= hi
        below = bisect.bisect_left(his, lo)  # files with hi_j < lo
        depths.append(covers_lo - below - 1)
    total = sum(depths)
    n_disjoint = sum(1 for d in depths if d == 0)
    base.update(
        max_depth=max(depths),
        avg_depth_ppm=(total * 1_000_000) // n,
        n_disjoint=n_disjoint,
        disjoint_frac_ppm=(n_disjoint * 1_000_000) // n,
        total_overlap_pairs=total // 2,
    )
    return base
