"""The lakehouse TABLE as a Structured Streaming SOURCE.

Delta/Iceberg expose committed table changes as a stream
(``spark.readStream.format("delta")``); the reference has no analog (its
"stream" is S3 events). This module gives our table format the same
capability through PySpark 4's Python Data Source API: offsets are
SNAPSHOT IDS, each micro-batch delivers the data files added by the
commits in ``(start, end]``, and planning is metadata-only (manifest
lists, no data scan).

Semantics — identical to ``table/cdc.py``'s chain mode, which this
module shares its op classification with:

- append-class commits (append / stream-append / merge / update …)
  deliver their NEW manifests' rows;
- physical-only commits (compaction ``replace``, manifest rewrite,
  expire, materialize-deletes …, ``cdc._NON_DATA_OPS``) deliver ZERO
  rows — a rewrite never re-feeds downstream;
- for MERGE/UPDATE the new manifests are rewritten files, i.e. the
  batch over-delivers unchanged rows of touched files (at-least-once,
  same contract as the poll consumer); on an APPEND-ONLY table
  (``ingest_append_stream``) delivery is exactly the appended rows,
  exactly once per offset range.

Retention contract (same as Delta's): a consumer lagging across a
compaction reads the ORIGINAL pre-rewrite files (copy-on-write leaves
them on disk until expire GC), so snapshot retention + GC grace must
cover the maximum consumer lag, or the stream fails with a clear
FileNotFoundError and must be restarted from a fresh offset.

Scale shape: ``partitions()`` returns one InputPartition per file group,
so a 1000-executor cluster reads a big catch-up batch in parallel;
``read()`` ships Arrow record batches straight from the parquet files
(no Python row loop). The reader instance is pickled to executors, so
it holds only strings — tables are re-opened lazily on the driver-side
methods only.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: data files per input partition in one micro-batch read
_FILES_PER_PARTITION = 4


class _FilesPartition(InputPartition):
    def __init__(self, root: str, paths: list[str],
                 renames: list | None = None, field_spec: list | None = None,
                 change: str | None = None, sid: int | None = None,
                 anti_tombs: list[str] | None = None,
                 semi_tombs: list[str] | None = None):
        self.root = root
        self.paths = paths
        #: MoR CDF delete basis: key-tombstone parquet paths applied
        #: Arrow-side in read() — anti (parent visibility: drop rows an
        #: OLDER tombstone already killed) then semi (keep only rows the
        #: NEW tombstone kills). Key files are delete-batch-sized; the
        #: data file never shuffles.
        self.anti_tombs = anti_tombs
        self.semi_tombs = semi_tombs
        #: per-path {written name -> current name} (schema evolution);
        #: field_spec = current (name, type) targets for the arrow align.
        #: Both None on never-renamed tables — read() stays zero-copy.
        self.renames = renames
        self.field_spec = field_spec
        #: CDF mode only: every row of this partition's files gets
        #: (_change_type=change, _commit_sid=sid) literal columns
        self.change = change
        self.sid = sid


#: CDF mode: ops with NO logical row change — contribute nothing.
#: materialize-deletes only APPLIES tombstones that were already logical
#: at their delete-mor commit (physical rewrite, like compaction).
_CDF_SKIP = {"replace", "rewrite-manifests", "expire", "evolve-schema",
             "materialize-deletes"}
#: CDF mode: refused — a rollback has no per-row delete basis in the
#: snapshot log (same contract as ChangeFeedConsumer.poll_changes).
_CDF_REFUSE = {"rollback"}
#: CDF mode: merge-on-read commits — delete side planned from the NEW
#: key tombstones against the parent's visible rows (see _cdf_partitions)
_CDF_MOR = {"delete-mor", "update-mor"}


def _read_key_table(root: str, paths: list[str], data_schema):
    """Concat tombstone key files; cast each key column to the data
    table's (post-align) type so a widened column still joins."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    keys = pa.concat_tables(
        [pq.read_table(os.path.join(root, p)) for p in paths]
    )
    arrays, names = [], []
    for name in keys.column_names:
        col = keys.column(name)
        if name in data_schema.names:
            want = data_schema.field(name).type
            if col.type != want:
                col = col.cast(want)
        arrays.append(col)
        names.append(name)
    return pa.table(arrays, names=names)


def _apply_key_tombstones(tbl, root: str, anti, semi):
    """Executor-side MoR pre-image filter: drop rows an older tombstone
    already killed (anti = parent visibility), keep rows the new
    tombstone kills (semi). Vectorized Arrow hash joins against
    delete-batch-sized key tables — no Spark shuffle."""
    if anti:
        k = _read_key_table(root, anti, tbl.schema)
        tbl = tbl.join(k, keys=k.column_names, join_type="left anti")
    if semi:
        k = _read_key_table(root, semi, tbl.schema)
        tbl = tbl.join(k, keys=k.column_names, join_type="left semi")
    return tbl


def _tombstone_key_ranges(root: str, tomb_paths: list[str]) -> dict:
    """Per key column (min, max) across the given tombstone key files.
    Driver-side, but the files are delete-batch-sized by construction.
    Columns whose values don't total-order cleanly are omitted (no
    pruning on them)."""
    import pyarrow.parquet as pq

    ranges: dict[str, list] = {}
    for p in tomb_paths:
        tbl = pq.read_table(os.path.join(root, p))
        for name in tbl.column_names:
            vals = [v for v in tbl.column(name).to_pylist() if v is not None]
            if not vals:
                continue
            try:
                lo, hi = min(vals), max(vals)
            except TypeError:
                continue
            cur = ranges.get(name)
            if cur is None:
                ranges[name] = [lo, hi]
            else:
                try:
                    cur[0], cur[1] = min(cur[0], lo), max(cur[1], hi)
                except TypeError:
                    ranges.pop(name, None)
    return ranges


def _stats_overlap(stats: dict, key_ranges: dict) -> bool:
    """True unless some key column's manifest [min,max] provably misses
    the tombstone key range. Missing/None stats or incomparable types
    keep the file (conservative)."""
    for name, (lo, hi) in key_ranges.items():
        s = stats.get(name)
        if not s or s[0] is None or s[1] is None:
            continue
        try:
            if s[1] < lo or s[0] > hi:
                return False
        except TypeError:
            continue
    return True


class LakehouseStreamReader(DataSourceStreamReader):
    """Snapshot-log stream reader. Offsets: ``{"snapshot": <id>}``."""

    def __init__(self, options: dict):
        self._root = options["path"]
        start = int(options.get("starting_snapshot", 0))
        self._start = start
        # rate limiting (Delta maxFilesPerTrigger/maxBytesPerTrigger
        # analog): commit-granular — latestOffset() admits whole commits
        # oldest-first until the cumulative added_files/added_bytes
        # (snapshot SUMMARY fields, O(1) per commit, no manifest reads)
        # would exceed the cap; always >=1 data commit per trigger so a
        # single over-cap commit still ships. The Python data source API
        # has no admission-control hook, so the cap lives in the offset
        # we report; _floor tracks the last admitted offset and only
        # advances (partitions()/commit() also raise it, so a restarted
        # stream catches its floor up to the checkpoint within a few
        # empty triggers — progress is guaranteed, never deadlocked).
        self._max_files = int(options.get("max_files_per_trigger", 0)) or None
        self._max_bytes = int(options.get("max_bytes_per_trigger", 0)) or None
        self._floor = start
        # pin the STREAM-START schema version: the source already
        # declared schema() to Spark, so every micro-batch must align to
        # THAT shape even if an evolution lands mid-stream (review
        # finding — deriving per batch from the live head would emit
        # arrow batches diverging from the declared schema)
        self._cdf = str(options.get("mode", "")).lower() == "cdf"
        t = self._table()
        self._read_ver = t.schema_version_at() or 1
        from ..table.fieldids import mapping_required

        self._mapped = mapping_required(t.schema_versions())
        if t.schema_versions():
            # align whenever ANY evolution exists — not only mapped
            # (rename/widen): on add-only evolution, files written before
            # the ADD lack the added column and must be null-filled to
            # the declared schema like the batch read path does
            from ..table.scan import resolve_schema

            self._field_spec = [(f.name, f.dataType.simpleString())
                                for f in resolve_schema(t).fields]
        else:
            self._field_spec = None

    # ---- driver-side planning (metadata only) ----

    def _table(self):
        from ..table.meta import Table

        return Table.load(self._root)

    def initialOffset(self) -> dict:
        return {"snapshot": self._start}

    def latestOffset(self) -> dict:
        t = self._table()
        head = int(t.current_snapshot_id() or self._start)
        if self._max_files is None and self._max_bytes is None:
            return {"snapshot": head}
        if head <= self._floor:
            return {"snapshot": self._floor}
        from ..table.cdc import _NON_DATA_OPS

        chain: list = []
        sid: int | None = head
        try:
            while sid is not None and sid > self._floor:
                chain.append(t.snapshot(sid))
                sid = chain[-1].parent_id
        except FileNotFoundError as e:
            raise ValueError(
                f"lakehouse_stream rate limiting needs the snapshot "
                f"chain back to offset {self._floor}, but snapshot "
                f"{sid} is expired — restart the stream with "
                f"starting_snapshot at a retained snapshot (retention "
                f"must cover consumer lag)"
            ) from e
        chain.reverse()  # oldest first — admit in commit order
        admitted = self._floor
        files = bytes_ = 0
        took_data = False
        for snap in chain:
            if snap.operation in _NON_DATA_OPS:
                admitted = snap.snapshot_id  # zero stream rows — free
                continue
            f = int(snap.summary.get("added_files", 1))
            b = int(snap.summary.get("added_bytes", 0))
            over = ((self._max_files is not None
                     and files + f > self._max_files)
                    or (self._max_bytes is not None
                        and bytes_ + b > self._max_bytes))
            if took_data and over:
                break
            files += f
            bytes_ += b
            admitted = snap.snapshot_id
            took_data = True
            if over:  # single commit already over cap: ship it alone
                break
        self._floor = admitted
        return {"snapshot": admitted}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from ..table.cdc import _NON_DATA_OPS

        t = self._table()
        lo, hi = int(start["snapshot"]), int(end["snapshot"])
        self._floor = max(self._floor, hi)
        chain: list = []
        sid = hi
        while sid is not None and sid > lo:
            snap = t.snapshot(sid)
            chain.append(snap)
            sid = snap.parent_id
        chain.reverse()  # oldest first: delivery order = commit order
        if self._cdf:
            return self._cdf_partitions(t, chain)
        # first DATA op (oldest wins) that removed each path in-window:
        # those entries' surviving rows ship in that op's OWN manifests,
        # so the original entry is skipped. Paths removed by NON-data
        # rewrites (compaction) are KEPT — copy-on-write leaves the
        # original bytes on disk until expire GC, and the rewrite's own
        # manifests are skipped, so the original file is exactly the
        # right (and only) copy of those rows.
        data_remover: dict[str, str] = {}
        for snap in chain:
            if snap.operation in _NON_DATA_OPS:
                continue
            parent_removed = (
                set(t.snapshot(snap.parent_id).removed_files)
                if snap.parent_id else set()
            )
            for p in set(snap.removed_files) - parent_removed:
                data_remover.setdefault(p, snap.operation)
        paths: list[str] = []
        svs: list[int | None] = []
        seen: set[str] = set()
        for snap in chain:
            if snap.operation in _NON_DATA_OPS:
                continue
            parent_manifests = (
                set(t.snapshot(snap.parent_id).manifests) if snap.parent_id else set()
            )
            for mf in snap.manifests:
                if mf in parent_manifests:
                    continue
                for e in t.manifest_entries(mf):
                    if e.path in data_remover or e.path in seen:
                        continue
                    seen.add(e.path)
                    paths.append(e.path)
                    svs.append(e.sv)
        # schema evolution (rename/widen): resolve each file's written
        # names DRIVER-side (metadata only); read() applies them as
        # zero-copy arrow renames + a cast-align against the schema the
        # source DECLARED at stream start (self._read_ver — pinned, see
        # __init__)
        renames = None
        field_spec = self._field_spec
        if self._mapped:
            from ..table.fieldids import entry_rename_maps

            class _E:  # adapt (path-less) sv list to entry_rename_maps
                __slots__ = ("path", "sv")

                def __init__(self, i, sv):
                    self.path, self.sv = i, sv

            ents = [_E(i, sv) for i, sv in enumerate(svs)]
            by_idx = entry_rename_maps(t.schema_versions(), ents,
                                       self._read_ver)
            renames = [by_idx.get(i) for i in range(len(svs))]
        groups = []
        for i in range(0, len(paths), _FILES_PER_PARTITION):
            g = paths[i : i + _FILES_PER_PARTITION]
            rg = renames[i : i + _FILES_PER_PARTITION] if renames else None
            groups.append(_FilesPartition(self._root, g, rg, field_spec))
        # an empty list is a valid no-data micro-batch
        return groups

    def _rename_slices(self, t, ents):
        """Per-entry rename maps against the pinned stream-start version
        (None when the table never renamed)."""
        if not self._mapped:
            return None
        from ..table.fieldids import entry_rename_maps

        by_path = entry_rename_maps(t.schema_versions(), ents, self._read_ver)
        return [by_path.get(e.path) for e in ents]

    def _cdf_partitions(self, t, chain) -> list[InputPartition]:
        """CDF (change-data-feed) planning: per DATA snapshot, the new
        manifests' rows are ``insert`` and the newly-removed files' rows
        are ``delete`` — rows a rewrite carried along appear as a
        delete+insert PAIR for the same ``_commit_sid`` (Delta CDF
        without row tracking does the same for updates); a consumer
        applies delete-before-insert per sid. Copy-on-write leaves
        removed files on disk until expire GC, so both sides are plain
        file reads — zero joins, executor-safe. Merge-on-read commits
        (delete-mor / update-mor) stream their deletes as retractions
        via _plan_mor_deletes (Arrow-side key filters, still
        shuffle-free); only rollback is REFUSED (no per-row basis —
        ChangeFeedConsumer.poll_changes has the same contract)."""
        groups: list[InputPartition] = []

        def _emit(ents, change, sid, anti=None, semi=None):
            renames = self._rename_slices(t, ents)
            for i in range(0, len(ents), _FILES_PER_PARTITION):
                g = ents[i : i + _FILES_PER_PARTITION]
                rg = (renames[i : i + _FILES_PER_PARTITION]
                      if renames else None)
                groups.append(_FilesPartition(
                    self._root, [e.path for e in g], rg, self._field_spec,
                    change=change, sid=sid,
                    anti_tombs=anti, semi_tombs=semi))

        for snap in chain:
            op = snap.operation
            if op in _CDF_SKIP:
                continue
            if op in _CDF_REFUSE:
                raise ValueError(
                    f"lakehouse_stream mode=cdf has no exact delete basis "
                    f"for snapshot {snap.snapshot_id} ({op}); re-sync the "
                    f"consumer or use table.cdc.ChangeFeedConsumer."
                    f"poll_changes"
                )
            parent = snap.parent_id
            if op in _CDF_MOR:
                # merge-on-read: post-images (update-mor) ship via the
                # generic insert path below; the delete side is the
                # parent's VISIBLE rows matching the NEW key tombstones,
                # computed join-free: planning groups parent files by
                # their prior-tombstone applicability class (seq
                # semantics, scan.tombstone_classes) and read() applies
                # the anti (visibility) + semi (new keys) filters
                # Arrow-side per file — tombstone key files are
                # delete-batch-sized, the table side never shuffles.
                self._plan_mor_deletes(t, snap, _emit)
            parent_manifests = set(t.snapshot(parent).manifests) if parent else set()
            new_entries = [e for mf in snap.manifests
                           if mf not in parent_manifests
                           for e in t.manifest_entries(mf)]
            if new_entries:
                _emit(new_entries, "insert", snap.snapshot_id)
            parent_removed = (set(t.snapshot(parent).removed_files)
                              if parent else set())
            removed_new = set(snap.removed_files) - parent_removed
            if removed_new:
                from ..table.cdc import ChangeFeedError

                try:
                    rm = [e for e in t.entries(parent)
                          if e.path in removed_new]
                except FileNotFoundError as e:
                    # expired parent: mirror table/cdc.py's translation
                    # instead of letting the raw error escape the stream
                    raise ChangeFeedError(
                        f"snapshot {parent} expired — no exact delete "
                        f"basis for CDF snapshot {snap.snapshot_id}; "
                        f"re-sync the consumer (restart the stream from "
                        f"a fresh starting_snapshot) or use table.cdc."
                        f"ChangeFeedConsumer.poll_changes"
                    ) from e
                # planning-time existence check: expire GC may have
                # deleted the removed files inside the stream window —
                # catch it here, not as an executor-side FileNotFoundError
                gone = [e.path for e in rm
                        if not os.path.exists(os.path.join(self._root, e.path))]
                if gone:
                    raise ChangeFeedError(
                        f"{len(gone)} removed file(s) for CDF snapshot "
                        f"{snap.snapshot_id} already GC'd (e.g. "
                        f"{gone[0]!r}) — delete basis expired; re-sync "
                        f"the consumer or use poll_changes"
                    )
                _emit(rm, "delete", snap.snapshot_id)
        return groups

    def _plan_mor_deletes(self, t, snap, _emit) -> None:
        """Plan the delete side of a merge-on-read commit for CDF mode.

        Pre-images = parent-visible rows matching the commit's NEW key
        tombstones (exactly ``cdc.poll_changes(exact=True)``'s basis,
        ``table/cdc.py`` delete-mor branch) — but planned as per-file
        partitions with Arrow-side key filters instead of Spark joins,
        so the streaming source stays metadata-only on the driver and
        shuffle-free on the executors. Parent entries are pruned by
        manifest min/max stats against the tombstone key ranges before
        any partition is emitted (driver reads only the tiny key files).
        """
        from ..table.cdc import ChangeFeedError
        from ..table.scan import tombstone_classes

        parent = snap.parent_id
        prev = ({d["path"] for d in t.snapshot(parent).tombstones}
                if parent else set())
        new_tombs = [d["path"] for d in snap.tombstones
                     if d["path"] not in prev]
        if not new_tombs:
            return
        try:
            parent_entries = t.entries(parent)
            parent_tomb_entries = (list(t.snapshot(parent).tombstones)
                                   if parent else [])
        except FileNotFoundError as e:
            raise ChangeFeedError(
                f"snapshot {parent} expired — no pre-image basis for the "
                f"merge-on-read commit at {snap.snapshot_id}; re-sync the "
                f"consumer or use table.cdc.ChangeFeedConsumer.poll_changes"
            ) from e
        missing = [p for p in new_tombs
                   if not os.path.exists(os.path.join(self._root, p))]
        if missing:
            raise ChangeFeedError(
                f"tombstone key file(s) for CDF snapshot "
                f"{snap.snapshot_id} already GC'd (e.g. {missing[0]!r}); "
                f"re-sync the consumer"
            )
        key_ranges = _tombstone_key_ranges(self._root, new_tombs)
        parent_entries = [e for e in parent_entries
                          if _stats_overlap(e.stats, key_ranges)]
        # group by prior-tombstone applicability (seq-aware visibility):
        # each class shares ONE anti set, so read() applies it uniformly
        for anti, ents in sorted(
            tombstone_classes(parent_entries, parent_tomb_entries).items()
        ):
            _emit(ents, "delete", snap.snapshot_id,
                  anti=list(anti) or None, semi=new_tombs)

    # ---- executor-side read (Arrow batches, no row loop) ----

    def read(self, partition: _FilesPartition) -> Iterator:
        import pyarrow as pa
        import pyarrow.parquet as pq

        renames = getattr(partition, "renames", None)
        field_spec = getattr(partition, "field_spec", None)
        change = getattr(partition, "change", None)
        for i, rel in enumerate(partition.paths):
            tbl = pq.read_table(os.path.join(partition.root, rel))
            if field_spec is not None:
                m = renames[i] if renames else None
                if m:
                    tbl = tbl.rename_columns(
                        [m.get(c, c) for c in tbl.column_names]
                    )
                from .._arrow_align import align_table

                tbl = align_table(tbl, field_spec)
            anti = getattr(partition, "anti_tombs", None)
            semi = getattr(partition, "semi_tombs", None)
            if anti or semi:  # MoR CDF delete pre-images (see planning)
                tbl = _apply_key_tombstones(tbl, partition.root, anti, semi)
                if len(tbl) == 0:
                    continue
            if change is not None:  # CDF mode: literal change columns
                n = len(tbl)
                tbl = tbl.append_column(
                    "_change_type", pa.array([change] * n, pa.string())
                ).append_column(
                    "_commit_sid",
                    pa.array([partition.sid] * n, pa.int64()),
                )
            yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        # checkpoint-managed; only keep the rate-limit floor monotone
        self._floor = max(self._floor, int(end["snapshot"]))


class LakehouseStreamDataSource(DataSource):
    """``spark.readStream.format("lakehouse_stream").load(table_root)``
    after ``spark.dataSource.register(LakehouseStreamDataSource)``.

    Options: ``path`` (table root, or pass to ``load()``),
    ``starting_snapshot`` (deliver commits AFTER this id; default 0 =
    everything), ``max_files_per_trigger`` / ``max_bytes_per_trigger``
    (rate limiting, Delta's maxFilesPerTrigger analog: each micro-batch
    admits whole commits oldest-first until their summed summary
    added_files/added_bytes would exceed the cap, always >=1 data
    commit; under Trigger.AvailableNow the single run stops at the
    first admitted window — use a processingTime trigger for paced
    catch-up), ``mode`` (default additions-only; ``cdf`` adds
    ``_change_type``/``_commit_sid`` columns and delivers copy-on-write
    AND merge-on-read DELETEs as retractions — see _cdf_partitions for
    semantics; only rollback is refused)."""

    @classmethod
    def name(cls) -> str:
        return "lakehouse_stream"

    def schema(self):
        from ..table.meta import Table
        from ..table.scan import resolve_schema

        s = resolve_schema(Table.load(self.options["path"]))
        if str(self.options.get("mode", "")).lower() == "cdf":
            from pyspark.sql import types as T

            s = T.StructType(list(s.fields) + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_sid", T.LongType(), False),
            ])
        return s

    def streamReader(self, schema) -> LakehouseStreamReader:
        return LakehouseStreamReader(self.options)
