"""Schema evolution: add/drop nullable columns as metadata-only commits.

Iceberg evolves schemas by field-id without rewriting data; the same
shape here, restricted to the two operations that are safe on plain
parquet files addressed by NAME (no field-ids): ADD a nullable column
(old files simply lack it — Spark's read-with-schema and compact's arrow
align both fill nulls) and DROP a non-core column (files keep the bytes;
every reader projects through the current schema so the column
disappears; the bytes age out as compaction rewrites files). Renames and
type changes are deliberately unsupported — by-name resolution would
corrupt them silently (documented in README "Known gaps").

The reference has no schema evolution at all: a schema change means
editing the Glue job and reprocessing
(/root/reference/src/glue_jobs/orders_etl.py:81-83 re-infers per run).

Each evolution is: (1) a metadata-only snapshot (operation
"evolve-schema", same manifests + removed set as the parent, so history
stays linear and pinned reads work), then (2) a schema version recording
that snapshot id. Pinned reads at snapshot S resolve the schema that was
current AT S (meta.table_schema_json), so time travel sees old shapes.
"""

from __future__ import annotations

from pyspark.sql import types as T

from ..table.meta import Table

#: the primary key + stat-bearing columns the table format itself needs;
#: dropping them would break MERGE keys and manifest pruning
CORE_COLUMNS = ("conv_id", "turn_idx", "ts")

#: column types addable by name (arrow-alignable in compact's rewrite)
_ALLOWED_TYPES = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


def current_schema(table: Table, snapshot_id: int | None = None) -> T.StructType:
    """The StructType current at ``snapshot_id`` (default now); tables
    that never evolved use the default transcripts schema."""
    from ..table.scan import resolve_schema

    return resolve_schema(table, snapshot_id)


def _commit_evolution(table: Table, new_schema: T.StructType, change: dict) -> dict:
    if table.branch is not None:
        # schema versions resolve by `as_of_snapshot <= sid`, and ids are
        # table-global: a branch-committed version would become visible
        # to MAIN the moment main's head id passes it (a dropped column
        # silently hidden from main reads). Evolution is main-line only.
        raise ValueError(
            "schema evolution on a branch is not supported (schema "
            "versions are resolved by snapshot id table-wide); evolve on "
            "main, before or after fast_forward"
        )
    if not table.schema_versions():
        # first evolution: pin the ORIGINAL shape as version 1 so pinned
        # pre-evolution reads resolve explicitly instead of by fallback
        table.append_schema_version(
            current_schema(table).jsonValue(), as_of_snapshot=0
        )
    cur = table.snapshot()
    snap = table.commit_manifests(
        list(cur.manifests),
        operation="evolve-schema",
        summary=change,
        removed_files=list(cur.removed_files),
    )
    version = table.append_schema_version(new_schema.jsonValue(), snap.snapshot_id)
    return {
        "snapshot": snap.snapshot_id,
        "schema_version": version,
        "columns": [f.name for f in new_schema.fields],
        **change,
    }


def add_columns(table: Table, fields: list[tuple[str, str]]) -> dict:
    """Add nullable columns: ``fields`` = [(name, type_str), ...] with
    type_str in {string,int,bigint,float,double,boolean,timestamp,date,
    binary}. Existing rows read as NULL; no data file is touched."""
    schema = current_schema(table)
    existing = {f.name for f in schema.fields}
    # names from ANY prior schema version are burned: data files written
    # before a drop still carry the old column's bytes, and by-name
    # parquet resolution would silently RESURRECT those values into the
    # re-added column (the hazard Iceberg avoids with field-ids)
    ever_used = set(existing)
    for v in table.schema_versions():
        ever_used.update(f["name"] for f in v["schema"]["fields"])
    new_fields = list(schema.fields)
    for name, type_str in fields:
        if name in existing:
            raise ValueError(f"column already exists: {name}")
        if name in ever_used:
            raise ValueError(
                f"column name {name!r} was used by an earlier schema version; "
                f"old data files may still carry its values and by-name reads "
                f"would resurrect them — pick a fresh name"
            )
        if type_str not in _ALLOWED_TYPES:
            raise ValueError(
                f"unsupported type {type_str!r} for {name}; "
                f"allowed: {sorted(_ALLOWED_TYPES)}"
            )
        # added columns MUST be nullable: files written before the
        # evolution have no values for them
        new_fields.append(T.StructField(name, _ALLOWED_TYPES[type_str], True))
        existing.add(name)
    return _commit_evolution(
        table, T.StructType(new_fields), {"added": [f"{n}:{t}" for n, t in fields]}
    )


def drop_columns(table: Table, names: list[str]) -> dict:
    """Drop non-core columns. Metadata-only: readers project through the
    new schema immediately; the bytes in existing files age out as
    compaction rewrites them."""
    import re

    schema = current_schema(table)
    existing = {f.name for f in schema.fields}
    constraints = table.constraints()
    for name in names:
        if name in CORE_COLUMNS:
            raise ValueError(
                f"cannot drop core column {name} (primary key / stats: "
                f"{CORE_COLUMNS})"
            )
        if name not in existing:
            raise ValueError(f"no such column: {name}")
        # a CHECK constraint referencing the column would poison EVERY
        # future write (enforce fails to resolve); refuse up front.
        # Identifier-token match — conservatively flags the name even
        # inside a string literal (err on the safe side).
        offenders = [
            c for c, pred in constraints.items()
            if re.search(rf"\b{re.escape(name)}\b", pred, re.IGNORECASE)
        ]
        if offenders:
            raise ValueError(
                f"cannot drop column {name!r}: referenced by CHECK "
                f"constraint(s) {sorted(offenders)}; drop the constraint(s) first"
            )
    keep = [f for f in schema.fields if f.name not in set(names)]
    return _commit_evolution(table, T.StructType(keep), {"dropped": list(names)})
