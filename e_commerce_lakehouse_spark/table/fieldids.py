"""Field identities for schema evolution — Iceberg's field-ids, adapted
to name-addressed parquet.

Iceberg writes a field-id into every parquet column and resolves reads by
id, which is what makes RENAME and type WIDENING metadata-only. Plain
parquet files addressed by name can't carry ids — but this table format
controls every write, so the same binding is recoverable from two facts
it already records:

  1. every schema VERSION's column names (table/meta.py schema_versions),
  2. every data file's WRITE-time schema version (DataFileEntry.sv).

A file written under version k has exactly version k's column names in
its footer; version k's ``field_ids`` map then binds each written name to
a stable id, and the CURRENT version's map binds each id to its current
name/type. Rename = same id, new name. Widen = same id, wider type.

Versions recorded before this module existed carry no explicit
``field_ids``; their ids are DERIVED by name continuity — sound because
add_columns has always refused to re-use a name from any earlier version
(operators/schema_evolution.py "ever_used" guard), so pre-rename history
is a name<->id bijection. Versions that rename or widen MUST store
explicit ids (schema_evolution records them for every new version going
forward).

Import-light on purpose (no pyspark): compact's Arrow rewrite tasks use
``rename_map`` on fresh Python workers.
"""

from __future__ import annotations


def version_field_maps(versions: list[dict]) -> list[dict[str, int]]:
    """Per-version {column name -> field id}, index i = version i+1.

    Explicit ``field_ids`` win; versions without them derive ids by name
    continuity from the previous version (fresh ids for fresh names).
    Deterministic: ids are assigned in field order, starting at 1."""
    maps: list[dict[str, int]] = []
    prev: dict[str, int] = {}
    next_id = 1
    for v in versions:
        if "field_ids" in v:
            m = {k: int(i) for k, i in v["field_ids"].items()}
        else:
            m = {}
            for f in v["schema"]["fields"]:
                name = f["name"]
                if name in prev:
                    m[name] = prev[name]
                else:
                    m[name] = next_id
                    next_id += 1
        if m:
            next_id = max(next_id, max(m.values()) + 1)
        maps.append(m)
        prev = m
    return maps


def next_field_id(versions: list[dict]) -> int:
    """Smallest id never used by any version (ids are never recycled —
    a dropped column's id stays burned, like its name)."""
    maps = version_field_maps(versions)
    used = [i for m in maps for i in m.values()]
    return (max(used) + 1) if used else 1


def mapping_required(versions: list[dict]) -> bool:
    """True iff any version needs per-file name/type mapping on read
    (a rename or widen happened). False keeps scan on the single plain
    ``spark.read.schema(...).parquet(paths)`` fast path."""
    return any(v.get("mapped") for v in versions)


def legacy_version_number(versions: list[dict]) -> int:
    """The version number unstamped (sv=None) files were written under:
    the LAST version recorded before this module existed (no explicit
    field_ids). Files can only lack sv if they predate the first
    mapped evolution, and every such file's columns match that version's
    schema (or a null-fillable subset, for pre-ADD vintages). Falls back
    to version 1 (the pinned original shape) when every recorded version
    is feature-era."""
    last = 1
    for v in versions:
        if "field_ids" not in v:
            last = v["version"]
    return last


def rename_map(versions: list[dict], write_version: int,
               read_version: int) -> dict[str, str]:
    """{written name -> current name} for columns whose name CHANGED
    between ``write_version`` and ``read_version`` (matched by field id).
    Empty when nothing renamed — callers use that as a no-op fast path.
    Dropped columns simply don't appear (readers project them away)."""
    maps = version_field_maps(versions)
    wmap = maps[write_version - 1]
    rmap = maps[read_version - 1]
    by_id = {i: n for n, i in rmap.items()}
    return {
        wname: by_id[i]
        for wname, i in wmap.items()
        if i in by_id and by_id[i] != wname
    }


def entry_rename_maps(versions: list[dict], entries,
                      read_version: int) -> dict[str, dict]:
    """{file path -> {written name -> read-version name}} for every entry
    whose written names differ from ``read_version``'s (others omitted).
    The per-write-version map is memoized, so cost is O(versions) map
    builds + O(entries) dict lookups. Shared by compact's arrow rewrite
    and the streaming table source (review finding: keep the legacy-
    fallback logic in exactly one place)."""
    legacy = legacy_version_number(versions)
    by_ver: dict[int, dict] = {}
    out: dict[str, dict] = {}
    for e in entries:
        wv = e.sv if e.sv is not None else legacy
        if wv not in by_ver:
            by_ver[wv] = rename_map(versions, wv, read_version)
        if by_ver[wv]:
            out[e.path] = by_ver[wv]
    return out
