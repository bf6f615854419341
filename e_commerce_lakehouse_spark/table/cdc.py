"""At-least-once incremental consumption of a table (CDC consumer).

The pull side of incremental_scan: a cursor file remembers the last
snapshot a downstream consumer processed; each ``poll`` returns the rows
added since, ``ack`` advances the cursor AFTER the caller has durably
processed the batch — crash between poll and ack re-delivers (classic
at-least-once; transcript consumers re-key on (conv_id, turn_idx)).

Delivery is LOGICAL-change based where the snapshot chain allows it:
walking (cursor, current] and taking only the manifests added by
data-changing operations (append / merge / overwrite) skips compaction
and clustering rewrites entirely — a consumer never re-reads 100 TB
because the table got compacted. If an intermediate snapshot was expired
(the chain is broken), poll degrades to the conservative file-set diff
(incremental_scan), which may re-deliver rewritten rows; the returned
batch records which mode produced it.

The reference's analog is the S3-event → Lambda push pipeline
(/root/reference/src/lambda/file_processor.py) — push on object-created;
here the object-created stream is the snapshot log itself.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .meta import Table
from .scan import resolve_schema

#: snapshot operations that add MANIFESTS but no logical rows.
#: materialize-deletes rewrites files to APPLY tombstones that were
#: already logical at their delete-mor commit — physical-only, skip.
#: (delete-mor itself adds no manifests, so chain mode naturally
#: delivers zero rows for it; row DELETIONS are not pushed downstream —
#: same at-least-once upsert contract as cow delete, documented.)
_NON_DATA_OPS = {"replace", "rewrite-manifests", "expire", "rollback",
                 "evolve-schema", "materialize-deletes", "delete-mor"}


class IncrementalConsumer:
    """A named, durable cursor over a table's snapshot log."""

    def __init__(self, table: Table, cursor_path: str):
        self.table = table
        self.cursor_path = cursor_path
        self._pending: int | None = None  # snapshot captured by last poll

    # ---------- cursor ----------

    def position(self) -> int | None:
        """Last acked snapshot id (None = never consumed)."""
        try:
            with open(self.cursor_path) as f:
                return json.load(f)["snapshot_id"]
        except FileNotFoundError:
            return None

    def ack(self) -> int:
        """Durably advance the cursor to the last polled snapshot."""
        if self._pending is None:
            raise RuntimeError("nothing polled to ack")
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": self._pending, "table": self.table.root}, f)
        os.replace(tmp, self.cursor_path)
        sid, self._pending = self._pending, None
        return sid

    # ---------- consumption ----------

    def poll(self, spark: SparkSession) -> dict | None:
        """Rows added since the cursor, or None when caught up.

        Returns {"df": DataFrame, "from": sid|None, "to": sid, "mode":
        "initial"|"chain"|"fileset-diff"|"reload"}; call ``ack()`` after
        durably processing ``df``. Modes, best to worst: chain = logical
        changes only; fileset-diff = chain broken, adds rewrites;
        reload = the cursor snapshot itself was expired, full re-read."""
        t = self.table
        current = t.current_snapshot_id()
        if current is None:
            return None
        last = self.position()
        if last is None:
            # initial load: the whole current snapshot
            from .scan import scan

            self._pending = current
            return {"df": scan(spark, t), "from": None, "to": current, "mode": "initial"}
        if current == last:
            return None
        if current < last:
            raise ValueError(
                f"cursor at {last} is AHEAD of table ({current}) — wrong "
                f"table or the table was rolled back past the cursor"
            )
        batch = self._chain_batch(spark, last, current)
        if batch is None:  # chain broken by expire: conservative diff
            from .scan import incremental_scan, scan

            try:
                df = incremental_scan(spark, t, last, current)
                batch = {"df": df, "mode": "fileset-diff"}
            except FileNotFoundError:
                # the cursor snapshot itself was expired — no diff basis
                # remains; the only at-least-once-safe batch is a full
                # reload (consumers re-key on (conv_id, turn_idx))
                batch = {"df": scan(spark, t, snapshot_id=current), "mode": "reload"}
        batch.update({"from": last, "to": current})
        self._pending = current
        return batch

    def _chain_batch(self, spark: SparkSession, last: int, current: int) -> dict | None:
        """Logical-change batch: union the manifests ADDED by each
        data-changing snapshot in (last, current]. O(delta manifests).
        Returns None if any snapshot in the chain is expired."""
        t = self.table
        new_manifests: list[str] = []
        sid = current
        chain: list[int] = []
        while sid is not None and sid > last:
            try:
                snap = t.snapshot(sid)
            except FileNotFoundError:
                return None
            chain.append(sid)
            sid = snap.parent_id
        if sid != last and last != 0:
            return None  # chain didn't reach the cursor (diverged history)
        # who removed each path within this window? (chain is newest-first;
        # walk oldest-first so the FIRST remover wins)
        remover_op: dict[str, str] = {}
        try:
            for cid in reversed(chain):
                snap = t.snapshot(cid)
                parent_removed = (
                    set(t.snapshot(snap.parent_id).removed_files)
                    if snap.parent_id else set()
                )
                for p in set(snap.removed_files) - parent_removed:
                    remover_op.setdefault(p, snap.operation)
        except FileNotFoundError:
            return None  # a parent (e.g. the cursor snapshot) expired
        for cid in chain:
            snap = t.snapshot(cid)
            if snap.operation in _NON_DATA_OPS:
                continue
            parent_manifests = (
                set(t.snapshot(snap.parent_id).manifests) if snap.parent_id else set()
            )
            new_manifests.extend(m for m in snap.manifests if m not in parent_manifests)
        entries = []
        seen: set[str] = set()
        for m in new_manifests:
            for e in t.manifest_entries(m):
                op = remover_op.get(e.path)
                if op is not None:
                    if op in _NON_DATA_OPS:
                        # A DATA op's file was rewritten away by a SKIPPED
                        # rewrite within this window (append → cluster →
                        # poll): its rows now live only in the skipped
                        # op's output, so dropping the entry would
                        # silently LOSE them (found by the medallion
                        # pipeline test). No per-row lineage exists to
                        # recover just those rows — degrade to the
                        # conservative file-set diff (at-least-once).
                        return None
                    # removed by a later DATA op (e.g. a second MERGE):
                    # its surviving rows ship in that op's own manifests —
                    # skipping here loses nothing
                    continue
                if e.path not in seen:
                    seen.add(e.path)
                    entries.append(e)
        schema = resolve_schema(t, current)
        if not entries:
            return {"df": spark.createDataFrame([], schema), "mode": "chain"}
        paths = [os.path.join(t.root, e.path) for e in entries]
        df = spark.read.schema(schema).parquet(*paths)
        # match scan-at-`current` semantics for merge-on-read deletes: a row
        # appended and then MoR-deleted inside the polled window must NOT be
        # delivered as a live insert (the cow-delete path already excludes
        # it). Same anti-join scan() uses; tombstone side is delete-sized.
        tombs = t.tombstones(current)
        if tombs:
            tomb_df = spark.read.parquet(*[os.path.join(t.root, p) for p in tombs])
            df = df.join(tomb_df.dropDuplicates(), on=list(tomb_df.columns),
                         how="left_anti")
        return {"df": df, "mode": "chain"}
