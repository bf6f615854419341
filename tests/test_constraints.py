"""Table CHECK constraints: live in metadata, enforced on every write
path (append / MERGE / UPDATE / streaming bootstrap), validated against
existing data on add, NULL-passes SQL CHECK semantics."""

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.constraints import (
    ConstraintViolation,
    add_constraint,
    drop_constraint,
)
from e_commerce_lakehouse_spark.operators.merge import merge_into
from e_commerce_lakehouse_spark.operators.rowlevel import update_where
from e_commerce_lakehouse_spark.table.writer import append_dataframe


def test_add_validates_existing_data(spark, tiny_table):
    # tiny synthetic data satisfies turn_idx >= 0
    out = add_constraint(spark, tiny_table, "nonneg_turn", "turn_idx >= 0")
    assert out["constraints"] == {"nonneg_turn": "turn_idx >= 0"}
    # a constraint the existing data violates is rejected
    with pytest.raises(ConstraintViolation, match="existing row"):
        add_constraint(spark, tiny_table, "impossible", "turn_idx > 1000000")
    assert "impossible" not in tiny_table.constraints()


def test_append_enforced_and_null_passes(spark, tiny_df, tiny_table):
    add_constraint(spark, tiny_table, "nonneg_turn", "turn_idx >= 0")
    add_constraint(spark, tiny_table, "tool_known", "tool <> 'forbidden'")
    good = tiny_df.limit(5).withColumn("turn_idx", F.col("turn_idx") + 100000)
    append_dataframe(spark, tiny_table, good)  # passes

    bad = tiny_df.limit(5).withColumn("turn_idx", F.lit(-1))
    with pytest.raises(ConstraintViolation, match="nonneg_turn") as ei:
        append_dataframe(spark, tiny_table, bad)
    assert ei.value.counts["nonneg_turn"] == 5
    assert ei.value.counts["tool_known"] == 0

    # NULL predicate result passes (SQL CHECK semantics)
    nulls = tiny_df.limit(3).withColumn("tool", F.lit(None).cast("string"))
    append_dataframe(spark, tiny_table, nulls)

    # after dropping, the bad batch is accepted
    drop_constraint(tiny_table, "nonneg_turn")
    append_dataframe(spark, tiny_table, bad)


def test_merge_and_update_enforced(spark, tiny_df, tiny_table):
    add_constraint(spark, tiny_table, "text_nonempty", "length(text) > 0")
    bad_src = tiny_df.limit(4).withColumn("text", F.lit(""))
    with pytest.raises(ConstraintViolation, match="text_nonempty"):
        merge_into(spark, tiny_table, bad_src)
    # UPDATE that would break the invariant is refused before any write
    sid = tiny_table.current_snapshot_id()
    with pytest.raises(ConstraintViolation, match="text_nonempty"):
        update_where(spark, tiny_table, "turn_idx = 0", {"text": "''"})
    assert tiny_table.current_snapshot_id() == sid  # nothing committed
    # compliant update passes
    update_where(spark, tiny_table, "turn_idx = 0", {"text": "upper(text)"})


def test_unresolvable_constraint_fails_loud(spark, tiny_df, tiny_table):
    add_constraint(spark, tiny_table, "ghost", "no_such_col > 0",
                   validate_existing=False)
    with pytest.raises(ConstraintViolation, match="ghost"):
        append_dataframe(spark, tiny_table, tiny_df.limit(2))


def test_duplicate_add_rejected(spark, tiny_table):
    add_constraint(spark, tiny_table, "c1", "turn_idx >= 0")
    with pytest.raises(ValueError, match="already exists"):
        add_constraint(spark, tiny_table, "c1", "turn_idx >= 1")
    with pytest.raises(KeyError):
        drop_constraint(tiny_table, "no-such")


def test_drop_column_referenced_by_constraint_refused(spark, tiny_table):
    """Dropping a constraint-referenced column would poison every future
    write (enforce can't resolve) — refused at drop time instead."""
    from e_commerce_lakehouse_spark.operators.schema_evolution import (
        add_columns, drop_columns,
    )

    add_columns(tiny_table, [("quality", "double")])
    add_constraint(spark, tiny_table, "q_range",
                   "quality IS NULL OR quality BETWEEN 0 AND 1")
    with pytest.raises(ValueError, match="q_range"):
        drop_columns(tiny_table, ["quality"])
    # dropping the constraint first unblocks the column drop, and writes
    # against the post-drop schema still work
    drop_constraint(tiny_table, "q_range")
    drop_columns(tiny_table, ["quality"])
    from e_commerce_lakehouse_spark.synth import transcripts_df

    append_dataframe(spark, tiny_table, transcripts_df(spark, 20, seed=3))
