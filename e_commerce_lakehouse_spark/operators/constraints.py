"""Table CHECK constraints — Delta-parity data-quality enforcement.

The reference enforces row validity only inside each ETL job's filter
predicates (`/root/reference/src/glue_jobs/orders_etl.py:120-147`): the
rules live in job code, so a second writer can insert rows the first
would have rejected. Here the rules live in TABLE metadata
(`metadata/constraints.json`) and every write path re-reads them —
append, MERGE, UPDATE, streaming ingest — Delta's
`ALTER TABLE ADD CONSTRAINT` model.

Semantics (SQL CHECK): a row VIOLATES a constraint iff the predicate
evaluates to FALSE; NULL passes. Adding a constraint validates all
existing data first (one predicate-pushdown scan), so a live constraint
is an invariant over the whole table, not just future writes.

Scale: enforcement is one extra aggregation over the INCOMING BATCH only
(O(delta), never O(table)); the violation count is a partial-aggregable
`sum(case)` per constraint in a single pass, and example offending rows
are fetched lazily only on failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..table.meta import Table


class ConstraintViolation(ValueError):
    """A write batch (or existing data, on add) violates CHECK constraints."""

    def __init__(self, message: str, counts: dict[str, int], examples: list[dict]):
        super().__init__(message)
        self.counts = counts      # {constraint-name: n_violations}
        self.examples = examples  # a few offending rows (dicts)


def _violation(pred_sql: str):
    # CHECK semantics: FALSE violates, NULL passes
    return ~F.coalesce(F.expr(pred_sql), F.lit(True))


def enforce_constraints(df: DataFrame, table: Table, context: str = "write") -> DataFrame:
    """Raise ConstraintViolation if any row of ``df`` violates any live
    constraint; return ``df`` unchanged otherwise. One single-pass
    aggregation over the batch for ALL constraints together."""
    constraints = table.constraints()
    if not constraints:
        return df
    missing = [
        name for name, pred in constraints.items()
        if _refs_unknown_column(pred, df)
    ]
    if missing:
        raise ConstraintViolation(
            f"{context}: constraint(s) {missing} reference columns absent from the "
            f"batch schema {df.columns} — fix the constraint or the writer",
            {m: -1 for m in missing}, [],
        )
    aggs = [
        F.sum(_violation(pred).cast("long")).alias(name)
        for name, pred in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    counts = {name: int(row[name] or 0) for name in constraints}
    bad = {name: n for name, n in counts.items() if n > 0}
    if not bad:
        return df
    worst = max(bad, key=bad.get)
    examples = [
        r.asDict()
        for r in df.where(_violation(constraints[worst])).limit(3).collect()
    ]
    raise ConstraintViolation(
        f"{context}: {sum(bad.values())} row(s) violate CHECK constraint(s) "
        f"{sorted(bad)} (counts: {bad}); e.g. {examples[:1]}",
        counts, examples,
    )


def _refs_unknown_column(pred_sql: str, df: DataFrame) -> bool:
    """True if the predicate cannot be resolved against df's schema."""
    try:
        df.where(F.expr(pred_sql)).schema  # analysis only, no job
        return False
    except Exception:
        return True


def add_constraint(
    spark: SparkSession,
    table: Table,
    name: str,
    predicate: str,
    validate_existing: bool = True,
    schema=None,
) -> dict:
    """ALTER TABLE ADD CONSTRAINT name CHECK (predicate).

    Validates ALL existing rows first (predicate-pushdown scan) unless
    ``validate_existing=False`` — a live constraint is a table invariant,
    not a future-writes-only filter."""
    constraints = table.constraints()
    if name in constraints:
        raise ValueError(f"constraint already exists: {name} CHECK ({constraints[name]})")
    if validate_existing and table.current_snapshot_id() is not None:
        from ..table.scan import scan

        existing = scan(spark, table, schema=schema)
        n_bad = existing.where(_violation(predicate)).count()
        if n_bad:
            raise ConstraintViolation(
                f"cannot add constraint {name!r}: {n_bad} existing row(s) already "
                f"violate CHECK ({predicate})",
                {name: n_bad},
                [r.asDict() for r in existing.where(_violation(predicate)).limit(3).collect()],
            )
    constraints[name] = predicate
    table._write_constraints(constraints)
    return {"added": name, "predicate": predicate, "constraints": dict(constraints)}


def drop_constraint(table: Table, name: str) -> dict:
    constraints = table.constraints()
    if name not in constraints:
        raise KeyError(f"no such constraint: {name}")
    pred = constraints.pop(name)
    table._write_constraints(constraints)
    return {"dropped": name, "predicate": pred, "constraints": dict(constraints)}
