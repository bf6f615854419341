"""Align a pyarrow table to the table format's current schema.

Import-light on purpose (no pyspark), like _footer_stats: compact's
rewrite tasks import this on fresh Python workers.

After a schema evolution, one compaction group can mix files written
under different schema versions: pre-ADD files lack the new column,
pre-DROP files still carry the dropped bytes, and a default-config Spark
writer may have emitted timestamps as INT96 (arrow reads them as ns).
``align_table`` maps every part onto the CURRENT schema — missing
columns become nulls, extra columns are projected away, types are cast
to the canonical arrow form — so ``pa.concat_tables`` always sees one
schema and compact output is uniform regardless of input vintage.
"""

from __future__ import annotations


def _arrow_type(type_str: str):
    import pyarrow as pa

    return {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
        "timestamp": pa.timestamp("us"),
        "date": pa.date32(),
        "binary": pa.binary(),
    }[type_str]


def align_table(t, field_spec: list[tuple[str, str]]):
    """Project/pad/cast ``t`` onto ``field_spec`` = [(name,
    spark_simple_type), ...] (order defines output order). No-op (same
    object) when the table already matches."""
    import pyarrow as pa
    import pyarrow.compute as pc

    targets = [(name, _arrow_type(ts)) for name, ts in field_spec]
    if [(f.name, f.type) for f in t.schema] == targets:
        return t
    have = set(t.column_names)
    arrays = []
    for name, typ in targets:
        if name in have:
            col = t.column(name)
            if col.type != typ:
                # safe=False: INT96-sourced ns timestamps truncate to µs
                # (values are µs-precision; sub-µs can only be zero)
                col = pc.cast(col, typ, safe=False)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(len(t), type=typ))
    return pa.table(arrays, names=[n for n, _ in targets])
