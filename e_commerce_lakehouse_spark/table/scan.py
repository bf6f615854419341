"""Snapshot-pinned, stat-pruned table scans.

The reference relies on Delta + Catalyst partition pruning
(`/root/reference/src/glue_jobs/orders_etl.py:191-194`). Our manifest
stores per-file min/max, so we prune the FILE LIST in Python before
``spark.read.parquet`` even sees it — file-level skipping Catalyst cannot
do on plain parquet paths (SURVEY.md §4). Predicates are additionally
passed as DataFrame filters so Catalyst still performs row-group pushdown
inside surviving files.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS_SCHEMA
from .meta import DataFileEntry, Table


def _ts_to_micros(v) -> int:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        # exact integer micros (see _footer_stats.norm_stat): float
        # total_seconds() can truncate 1µs at epoch-scale magnitudes
        return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    return int(v)


def _overlaps(stats: dict, col: str, lo, hi) -> bool:
    """Conservative interval overlap; missing stats -> keep the file."""
    rng = stats.get(col)
    if rng is None:
        return True
    mn, mx = rng
    if lo is not None and mx < lo:
        return False
    if hi is not None and mn > hi:
        return False
    return True


def prune_entries(
    entries: list[DataFileEntry],
    conv_id: str | None = None,
    conv_id_range: tuple[str | None, str | None] | None = None,
    ts_range: tuple | None = None,
) -> list[DataFileEntry]:
    if conv_id is not None:
        conv_id_range = (conv_id, conv_id)
    out = []
    for e in entries:
        keep = True
        if conv_id_range is not None:
            keep = _overlaps(e.stats, "conv_id", conv_id_range[0], conv_id_range[1])
        if keep and ts_range is not None:
            lo = _ts_to_micros(ts_range[0]) if ts_range[0] is not None else None
            hi = _ts_to_micros(ts_range[1]) if ts_range[1] is not None else None
            keep = _overlaps(e.stats, "ts", lo, hi)
        if keep:
            out.append(e)
    return out


def scan(
    spark: SparkSession,
    table: Table,
    snapshot_id: int | None = None,
    conv_id: str | None = None,
    conv_id_range: tuple | None = None,
    ts_range: tuple | None = None,
    columns: list[str] | None = None,
    schema=TRANSCRIPTS_SCHEMA,
) -> DataFrame:
    """Read a pinned snapshot with manifest-level file skipping.

    Returns an empty typed DataFrame when everything prunes away."""
    entries = table.entries(snapshot_id)
    entries = prune_entries(entries, conv_id, conv_id_range, ts_range)
    if not entries:
        df = spark.createDataFrame([], schema)
    else:
        import os

        paths = [os.path.join(table.root, e.path) for e in entries]
        df = spark.read.schema(schema).parquet(*paths)
    # re-apply predicates row-level (files are supersets of the predicate)
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
    if columns:
        df = df.select(*columns)
    return df
