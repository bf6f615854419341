"""Persistent, session-independent catalog of lakehouse tables.

The reference registers its Delta tables in AWS Glue so external SQL
engines can query them by name (crawler step,
`/root/reference/src/step_functions/etl_orchestrator.json:354-377`).
There is no metastore service in this environment (and no Hive jars are
assumed), so — like the table format itself (table/meta.py) — the
catalog is implemented from scratch as a tiny atomic JSON file:

    {"tables": {"name": {"root": ..., "snapshot_id": int|null,
                         "ref": str|null}}}

- ``snapshot_id`` pins the registration to one snapshot (and the
  registration TAGS that snapshot on the table, so ``expire_snapshots``
  cannot age it out from under external readers — Iceberg tag
  semantics).
- ``ref`` registers a named tag instead (resolved at attach time).
- neither → the registration follows the table head.

``attach`` materializes the catalog into ANY SparkSession as temp views
(one ``scan``-backed view per table), after which plain ``spark.sql``
works by name. Cross-session persistence lives in the JSON file, not in
Spark's in-memory session catalog — a second process attaches the same
catalog file and sees the same pinned data.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

from pyspark.sql import SparkSession

from .table.meta import Table
from .table.scan import scan


def _tag_name(name: str) -> str:
    return f"catalog:{name}"


_LOCK_STALE_S = 300.0


@contextlib.contextmanager
def _registry_lock(path: str):
    """O_EXCL lock serializing catalog mutations: register/unregister are
    read-modify-write over one JSON file, so two unserialized writers
    would silently lose one registration (same rule as the table commit
    lock). Stale locks (crashed holder) are broken after _LOCK_STALE_S."""
    lock = path + ".lock"
    os.makedirs(os.path.dirname(lock) or ".", exist_ok=True)
    token = f"{os.getpid()}-{time.time_ns()}"
    for attempt in range(2):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                age = time.time() - os.stat(lock).st_mtime
            except FileNotFoundError:
                continue  # holder just released — retry O_EXCL
            if age > _LOCK_STALE_S and attempt == 0:
                # atomic break: rename first so only ONE racing breaker
                # wins (remove-then-create would let two writers both
                # acquire — same rule as the table commit lock)
                with contextlib.suppress(FileNotFoundError, OSError):
                    os.rename(lock, f"{lock}.broken-{token}")
                    os.remove(f"{lock}.broken-{token}")
                continue
            raise RuntimeError(
                f"{path}: another writer holds the catalog lock (age {age:.0f}s)"
            ) from None
    else:  # pragma: no cover - both attempts collided
        raise RuntimeError(f"{path}: could not acquire catalog lock")
    try:
        os.close(fd)
        yield
    finally:
        with contextlib.suppress(FileNotFoundError):
            os.remove(lock)


class Catalog:
    """A named-table registry persisted at ``path`` (atomic os.replace)."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)

    # ---------- storage ----------

    def entries(self) -> dict[str, dict]:
        try:
            with open(self.path) as f:
                return json.load(f)["tables"]
        except FileNotFoundError:
            return {}

    def _write(self, tables: dict[str, dict]) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"tables": tables}, f, indent=1)
        os.replace(tmp, self.path)

    # ---------- registration ----------

    def register(
        self,
        name: str,
        table: Table | str,
        snapshot_id: int | None = None,
        ref: str | None = None,
        replace: bool = False,
    ) -> dict:
        """Register ``table`` under ``name``. ``snapshot_id`` pins (and
        tags) that snapshot; ``ref`` stores a tag name; neither follows
        the head. Duplicate names raise unless ``replace=True``."""
        if snapshot_id is not None and ref is not None:
            raise ValueError("pass at most one of snapshot_id / ref")
        t = table if isinstance(table, Table) else Table.load(table)
        with _registry_lock(self.path):
            return self._register_locked(name, t, snapshot_id, ref, replace)

    def _register_locked(self, name, t, snapshot_id, ref, replace) -> dict:
        tables = self.entries()
        if name in tables and not replace:
            raise ValueError(f"table already registered: {name!r} -> "
                             f"{tables[name]['root']}")
        if ref is not None:
            t.resolve_ref(ref)  # KeyError if the tag doesn't exist
        if snapshot_id is not None:
            t.snapshot(snapshot_id)  # FileNotFoundError if unknown
        if name in tables:
            # replace: MOVE the protective tag with the registration — the
            # old guard left it on the previous snapshot, so the new pin
            # could be expired out from under readers while the stale
            # snapshot stayed pinned forever (review finding)
            self._drop_tag(name, tables[name])
        if snapshot_id is not None:
            # pin through expire: catalog registrations are external
            # readers; their snapshot must not be GC'd (Iceberg tags)
            t.create_tag(_tag_name(name), snapshot_id)
        entry = {"root": t.root, "snapshot_id": snapshot_id, "ref": ref}
        tables[name] = entry
        self._write(tables)
        return entry

    @staticmethod
    def _drop_tag(name: str, entry: dict) -> None:
        try:
            old_t = Table.load(entry["root"])
            if _tag_name(name) in old_t.tags():
                old_t.delete_tag(_tag_name(name))
        except FileNotFoundError:
            pass  # old table dir gone: nothing to untag

    def unregister(self, name: str) -> dict:
        """Remove a registration; drops the protective catalog tag (the
        snapshot then ages out with normal retention)."""
        with _registry_lock(self.path):
            tables = self.entries()
            if name not in tables:
                raise KeyError(f"no such catalog table: {name}")
            entry = tables.pop(name)
            self._drop_tag(name, entry)
            self._write(tables)
            return entry

    # ---------- resolution / attach ----------

    def resolve(self, name: str) -> tuple[Table, int | None]:
        """(Table, pinned snapshot id or None-for-head) for a name."""
        tables = self.entries()
        if name not in tables:
            raise KeyError(f"no such catalog table: {name}")
        e = tables[name]
        t = Table.load(e["root"])
        if e.get("snapshot_id") is not None:
            return t, e["snapshot_id"]
        if e.get("ref"):
            return t, t.resolve_ref(e["ref"])
        return t, None

    def attach(
        self,
        spark: SparkSession,
        names: list[str] | None = None,
        metadata_views: bool = False,
    ) -> list[str]:
        """Create one temp view per registration in THIS session, after
        which ``spark.sql("SELECT ... FROM <name>")`` works. Head-mode
        views re-resolve per attach (call again to advance); pinned views
        are stable across sessions and table churn.

        ``metadata_views=True`` additionally registers each table's
        Iceberg-style metadata tables (``{name}__files`` /
        ``__snapshots`` / ``__partitions``, table/inspect.py) at the
        same pinned snapshot as the data view."""
        from .table.inspect import register_metadata_views

        out = []
        for name in sorted(names if names is not None else self.entries()):
            t, sid = self.resolve(name)
            scan(spark, t, snapshot_id=sid).createOrReplaceTempView(name)
            out.append(name)
            if metadata_views:
                out.extend(register_metadata_views(spark, t, name, sid))
        return out
