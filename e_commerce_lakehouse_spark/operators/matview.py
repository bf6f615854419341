"""Incrementally-maintained materialized aggregates (gold-layer rollups).

The medallion story's last mile: a grouped COUNT/SUM rollup over a
lakehouse table, stored as its own snapshot-versioned table and kept
current by applying the EXACT change feed
(table/cdc.py ChangeFeedConsumer.poll_changes(exact=True)) instead of
recomputing — per-refresh cost is O(changed rows + |view|), never a
re-scan of the 100 TB source. Delta's equivalent is a streaming
aggregation into a gold table; Materialize/Flink call it incremental
view maintenance. The reference has nothing like it (its "gold" layer
is Athena re-querying silver every time,
/root/reference/src/step_functions/etl_orchestrator.json:354-431).

Correctness model: every supported aggregate (count, sum — avg derives
as sum/count downstream) is ADDITIVE, so applying a balanced delta
(insert rows +1/+x, delete pre-images -1/-x) to the stored groups is
exactly a recompute. min/max are NOT additive under deletes and are
refused at creation. Groups whose maintained row count reaches zero are
dropped.

Exactly-once without a side cursor: the applied source snapshot id
travels IN the view table's own commit summary (``matview_to_sid``), so
view data and cursor advance in ONE atomic commit — a crash between
refreshes re-reads the same summary and re-derives the same delta
(idempotent), never double-applies.

Scale shape: the delta aggregate is one shuffle on the group keys
(partial map-side combine); the combine with the stored view is a
union + one more grouped aggregate — no join, so NULL group keys need
no null-safe equality handling. Refresh rewrites the (aggregate-sized)
view; sources whose rollups are themselves huge would MERGE only
touched groups instead — documented trade, not implemented.
"""

from __future__ import annotations

import json
import math
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table import scan
from ..table.cdc import ChangeFeedConsumer
from ..table.meta import Table

_SPEC_FILE = "matview.json"
_COUNT_COL = "_mv_count"  # maintained row count: liveness + count agg
_SUPPORTED = ("count", "sum")


class _PinnedConsumer(ChangeFeedConsumer):
    """Change-feed consumer whose position is the view's own committed
    cursor — no cursor file, no ack (the view commit IS the ack)."""

    def __init__(self, table: Table, from_sid: int, schema=None):
        super().__init__(table, cursor_path=os.path.join(
            table.metadata_dir, ".matview-unused-cursor"), schema=schema)
        self._from_sid = from_sid

    def position(self) -> int | None:
        return self._from_sid


def _validate(group_by: list[str], aggs: dict) -> None:
    if not group_by:
        raise ValueError("matview needs at least one group-by column")
    for out, (fn, col) in aggs.items():
        if fn not in _SUPPORTED:
            raise ValueError(
                f"aggregate {out}={fn}({col}) is not additively maintainable "
                f"under deletes; supported: {_SUPPORTED} (avg = sum/count "
                f"downstream; min/max need a recompute)"
            )
        if out == _COUNT_COL:
            raise ValueError(f"{_COUNT_COL} is reserved for the maintained row count")


def _agg_exprs(aggs: dict) -> list:
    """Full-compute expressions over base rows."""
    out = [F.count(F.lit(1)).alias(_COUNT_COL)]
    for name, (fn, col) in aggs.items():
        out.append(
            F.count(F.lit(1)).alias(name) if fn == "count" else F.sum(col).alias(name)
        )
    return out


def _delta_exprs(aggs: dict) -> list:
    """Signed-delta expressions over exact change-feed rows."""
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    out = [F.sum(sign).alias(_COUNT_COL)]
    for name, (fn, col) in aggs.items():
        out.append(
            F.sum(sign).alias(name) if fn == "count"
            else F.sum(sign * F.col(col)).alias(name)
        )
    return out


def _spec_path(view: Table) -> str:
    return os.path.join(view.metadata_dir, _SPEC_FILE)


def _write_view(spark, view: Table, df: DataFrame, subdir: str):
    """Persist across the sizing count and the write — the combine
    pipeline upstream (exact change-feed read + two aggregations) must
    evaluate once, not once per action (review finding)."""
    from ..table.writer import write_files

    df = df.persist()
    try:
        n_files = max(1, math.ceil(df.count() / 500_000))
        return write_files(spark, view, df, n_files, subdir, stat_columns=())
    finally:
        df.unpersist()


def create_matview(
    spark: SparkSession,
    source: Table,
    view_root: str,
    group_by: list[str],
    aggs: dict[str, tuple[str, str]],
    source_schema=None,
) -> Table:
    """Create the rollup table at ``view_root``: one full aggregate of the
    source's CURRENT snapshot, plus the maintenance spec. ``aggs`` maps
    output column -> (fn, source_col) with fn in {"count", "sum"}."""
    _validate(group_by, aggs)
    head = source.current_snapshot_id()
    if head is None:
        raise ValueError("cannot materialize over an empty source table")
    base = scan(spark, source, snapshot_id=head, schema=source_schema)
    full = base.groupBy(*group_by).agg(*_agg_exprs(aggs))
    view = Table.create(view_root)
    with open(_spec_path(view) + ".tmp", "w") as f:
        json.dump({"source_root": source.root, "group_by": group_by,
                   "aggs": {k: list(v) for k, v in aggs.items()}}, f)
    os.replace(_spec_path(view) + ".tmp", _spec_path(view))
    entries = _write_view(spark, view, full, f"mv-{head:08d}-{uuid.uuid4().hex[:12]}")
    view.commit_append(entries, {"op": "matview-create", "matview_to_sid": head})
    view.append_schema_version(full.schema.jsonValue(), as_of_snapshot=1)
    return view


def matview_spec(view: Table) -> dict:
    with open(_spec_path(view)) as f:
        return json.load(f)


def _applied_sid(view: Table) -> int:
    """The newest committed source cursor: walk the view's chain for the
    latest summary carrying matview_to_sid — the view is a normal table,
    so maintenance commits (compact, rewrite-manifests) may sit on top
    of the last refresh (review finding: plain head indexing raised
    KeyError after any such commit and bricked the view)."""
    sid = view.current_snapshot_id()
    while sid is not None:
        snap = view.snapshot(sid)
        if "matview_to_sid" in snap.summary:
            return snap.summary["matview_to_sid"]
        sid = snap.parent_id
    raise ValueError(
        f"{view.root}: no snapshot carries matview_to_sid — not a "
        f"materialized view (create_matview first)"
    )


def refresh_matview(
    spark: SparkSession,
    source: Table,
    view: Table,
    source_schema=None,
) -> dict:
    """Apply the exact change delta (view's committed cursor, source head]
    to the stored groups. Idempotent across crashes: the cursor lives in
    the view commit's summary, so data + cursor advance atomically."""
    spec = matview_spec(view)
    if os.path.realpath(spec["source_root"]) != os.path.realpath(source.root):
        raise ValueError(
            f"view was materialized over {spec['source_root']}, not {source.root}"
        )
    group_by = spec["group_by"]
    aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
    last = _applied_sid(view)
    head = source.current_snapshot_id()
    if head == last:
        return {"noop": True, "at_sid": head}
    batch = _PinnedConsumer(source, last, schema=source_schema).poll_changes(
        spark, exact=True
    )
    # the cursor we COMMIT must be the head the consumer actually read —
    # poll_changes re-reads the source head itself, and a concurrent
    # commit landing between our read and its read would otherwise be
    # applied now but recorded as unapplied (double-count on the next
    # refresh; review finding)
    head = batch["to"]
    # persist: the exact feed is the expensive leg and feeds BOTH the
    # isEmpty probe and the delta aggregate (review finding)
    delta_rows = batch["df"].persist()
    out_cols = [*group_by, _COUNT_COL, *aggs.keys()]
    if delta_rows.isEmpty():
        delta_rows.unpersist()
        # physical-only source commits (compact/cluster/expire): advance
        # the cursor metadata-only, keep the view files byte-identical
        snap = view.snapshot()
        view.commit_manifests(
            list(snap.manifests), operation="matview-refresh",
            removed_files=list(snap.removed_files),
            summary={"op": "matview-refresh", "matview_from_sid": last,
                     "matview_to_sid": head, "delta_rows": 0},
        )
        return {"noop": False, "from_sid": last, "to_sid": head, "delta": "empty"}
    delta = delta_rows.groupBy(*group_by).agg(*_delta_exprs(aggs))
    old = scan(spark, view).select(*out_cols)
    # union + re-aggregate (NOT a join): additive combine that groups NULL
    # keys correctly without null-safe join plumbing
    combined = (
        old.unionByName(delta.select(*out_cols))
        .groupBy(*group_by)
        .agg(*[F.sum(c).alias(c) for c in [_COUNT_COL, *aggs.keys()]])
        .where(F.col(_COUNT_COL) > 0)
    )
    # preserve the view's committed dtypes (sum() widens to long/double)
    old_types = dict(old.dtypes)
    combined = combined.select(
        *group_by, *[F.col(c).cast(old_types[c]).alias(c)
                     for c in [_COUNT_COL, *aggs.keys()]]
    )
    try:
        entries = _write_view(
            spark, view, combined, f"mv-{head:08d}-{uuid.uuid4().hex[:12]}"
        )
    finally:
        delta_rows.unpersist()
    live = [e.path for e in view.entries()]
    view.commit_rewrite(
        live, entries, operation="matview-refresh",
        summary={"op": "matview-refresh", "matview_from_sid": last,
                 "matview_to_sid": head},
    )
    return {"noop": False, "from_sid": last, "to_sid": head,
            "view_rows": sum(e.rows for e in entries)}


def read_matview(spark: SparkSession, view: Table) -> DataFrame:
    """The rollup as of the view's current snapshot (snapshot-pinned —
    time travel and tags work like any table)."""
    return scan(spark, view)
