"""Metadata-only aggregation: COUNT(*)/MIN/MAX answered from manifest
stats, reading only predicate-BOUNDARY files.

Iceberg and Delta both answer `SELECT count(*)` from snapshot metadata;
this generalizes that to predicated counts: a live file whose stat range
lies FULLY inside the predicate (and whose recorded null count for every
predicated column is zero — min/max ignore nulls, so containment alone
cannot prove membership) contributes its manifest row count without
being opened; files the planner prunes contribute zero; only files the
predicate RANGE-OVERLAPS are actually scanned, with the row filter
applied. At the 100 TB design point a time-slice count touches a handful
of boundary files instead of the table — cost O(manifest) + O(boundary
bytes).

Exactness rules (never approximate, never wrong):
- merge-on-read tombstones hide rows per KEY, which metadata cannot
  count — any live tombstone falls back to the full logical scan count
  (the caller sees ``fallback`` in the metrics);
- a file with no recorded null count for a predicated column (legacy
  vintage) is demoted to the boundary-read path;
- MIN/MAX over a column are exact from stats alone (SQL MIN/MAX ignore
  nulls, exactly like parquet stats); files lacking the stat are read.

The reference recomputes such counts with full Athena scans
(`/root/reference/src/glue_jobs/orders_etl.py` writes; dashboards
re-aggregate) — here they are metadata reads.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..table.meta import Table
from ..table.scan import (
    _ts_to_micros,
    planned_entries,
    read_entries,
    resolve_schema,
)


def _full_range(e, col: str, lo, hi) -> bool:
    """File PROVABLY lies fully inside [lo, hi] on ``col``: stat range
    contained AND zero nulls recorded (unknown nulls -> not provable)."""
    rng = e.stats.get(col)
    if rng is None:
        return False
    if (e.nulls or {}).get(col) != 0:
        return False
    mn, mx = rng
    if lo is not None and not (mn >= lo):
        return False
    if hi is not None and not (mx <= hi):
        return False
    return True


def metadata_count(
    spark: SparkSession,
    table: Table,
    conv_id: str | None = None,
    conv_id_range: tuple | None = None,
    ts_range: tuple | None = None,
    eq: dict | None = None,
    snapshot_id: int | None = None,
) -> dict:
    """Exact COUNT(*) under the scan predicates, metadata-first.

    Returns ``{"count", "files_total", "files_pruned", "files_metadata",
    "files_scanned", "fallback"}`` — the file attribution is the point:
    on a well-clustered table, files_scanned is the boundary only."""
    entries = table.entries(snapshot_id)
    metrics = {
        "files_total": len(entries),
        "files_pruned": 0,
        "files_metadata": 0,
        "files_scanned": 0,
        "fallback": None,
    }
    if table.tombstone_entries(snapshot_id):
        # MoR tombstones hide rows per key — not countable from stats
        from ..table.scan import scan

        df = scan(spark, table, snapshot_id=snapshot_id, conv_id=conv_id,
                  conv_id_range=conv_id_range, ts_range=ts_range, eq=eq)
        metrics["fallback"] = "tombstones"
        metrics["files_scanned"] = len(entries)
        metrics["count"] = df.count()
        return metrics

    survivors = planned_entries(table, snapshot_id, conv_id, conv_id_range,
                                ts_range, eq=eq)
    metrics["files_pruned"] = len(entries) - len(survivors)

    preds: list[tuple[str, object, object]] = []  # (col, lo, hi)
    if conv_id is not None:
        preds.append(("conv_id", conv_id, conv_id))
    elif conv_id_range is not None:
        preds.append(("conv_id", conv_id_range[0], conv_id_range[1]))
    if ts_range is not None:
        lo, hi = ts_range
        preds.append(("ts",
                      _ts_to_micros(lo) if lo is not None else None,
                      _ts_to_micros(hi) if hi is not None else None))
    for col, v in (eq or {}).items():
        preds.append((col, v, v))

    count = 0
    boundary = []
    for e in survivors:
        if all(_full_range(e, col, lo, hi) for col, lo, hi in preds):
            count += e.rows
            metrics["files_metadata"] += 1
        else:
            boundary.append(e)
    if boundary:
        schema = resolve_schema(table, snapshot_id)
        df = read_entries(spark, table, boundary, schema, snapshot_id)
        if conv_id is not None:
            df = df.where(F.col("conv_id") == conv_id)
        elif conv_id_range is not None:
            lo, hi = conv_id_range
            if lo is not None:
                df = df.where(F.col("conv_id") >= lo)
            if hi is not None:
                df = df.where(F.col("conv_id") <= hi)
        if ts_range is not None:
            lo, hi = ts_range
            if lo is not None:
                df = df.where(F.col("ts") >= lo)
            if hi is not None:
                df = df.where(F.col("ts") <= hi)
        for col, v in (eq or {}).items():
            df = df.where(F.col(col) == v)
        count += df.count()
        metrics["files_scanned"] = len(boundary)
    metrics["count"] = count
    return metrics


def metadata_min_max(
    spark: SparkSession,
    table: Table,
    col: str,
    snapshot_id: int | None = None,
) -> dict:
    """Exact table-wide MIN/MAX of a stat-tracked column from manifest
    stats (SQL MIN/MAX ignore nulls, exactly like parquet stats); files
    without the stat (legacy vintage / all-null files are statless and
    contribute nothing... all-null files ARE statless, which is also
    correct) are read. MoR tombstones force the scan fallback."""
    entries = table.entries(snapshot_id)
    metrics = {"files_total": len(entries), "files_scanned": 0,
               "fallback": None}
    if table.tombstone_entries(snapshot_id):
        from ..table.scan import scan

        df = scan(spark, table, snapshot_id=snapshot_id)
        row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
        metrics.update(fallback="tombstones", files_scanned=len(entries),
                       min=row["mn"], max=row["mx"])
        return metrics
    # files whose footer lacked usable stats for col must be read — but
    # only if their schema VINTAGE can contain the column at all
    have = [e for e in entries if col in e.stats]
    missing = [e for e in entries if col not in e.stats and e.rows > 0]
    mn = min((e.stats[col][0] for e in have), default=None)
    mx = max((e.stats[col][1] for e in have), default=None)
    if missing:
        schema = resolve_schema(table, snapshot_id)
        df = read_entries(spark, table, missing, schema, snapshot_id)
        row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
        vals_mn = [v for v in (mn, _norm_like_stats(row["mn"])) if v is not None]
        vals_mx = [v for v in (mx, _norm_like_stats(row["mx"])) if v is not None]
        mn = min(vals_mn, default=None)
        mx = max(vals_mx, default=None)
        metrics["files_scanned"] = len(missing)
    metrics.update(min=mn, max=mx)
    return metrics


def _norm_like_stats(v):
    """Normalize a scanned value the way manifest stats are stored
    (timestamps -> epoch micros) so min/max comparisons stay typed."""
    from .._footer_stats import norm_stat

    return None if v is None else norm_stat(v)
