"""ANALYZE: single-pass distributed column stats persisted per snapshot."""

from __future__ import annotations

import pytest

from e_commerce_lakehouse_spark.operators import add_columns, analyze, read_stats
from tests.conftest import N_TURNS


def test_analyze_counts_ndv_minmax(spark, tiny_table):
    t = tiny_table
    res = analyze(spark, t)
    assert res["rows"] == N_TURNS and res["snapshot"] == t.current_snapshot_id()
    cols = res["columns"]
    assert set(cols) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert cols["conv_id"]["nulls"] == 0
    # HLL++ at rsd=0.05: NDV within 15% of truth
    import pyspark.sql.functions as F

    from e_commerce_lakehouse_spark.table import scan

    true_ndv = scan(spark, t).select(F.countDistinct("conv_id")).collect()[0][0]
    assert abs(cols["conv_id"]["ndv_approx"] - true_ndv) / true_ndv < 0.15
    assert cols["turn_idx"]["min"] == 0
    assert cols["ts"]["min"] <= cols["ts"]["max"]  # iso strings, ordered
    # persisted + readable back
    assert read_stats(t) == res
    assert read_stats(t, snapshot_id=1) is None  # never analyzed


def test_analyze_respects_schema_evolution_and_column_subset(spark, tiny_table):
    t = tiny_table
    add_columns(t, [("quality", "double")])
    res = analyze(spark, t, columns=["quality", "role"])
    assert set(res["columns"]) == {"quality", "role"}
    assert res["columns"]["quality"]["nulls"] == N_TURNS  # all-null added col
    with pytest.raises(ValueError, match="no such columns"):
        analyze(spark, t, columns=["nope"])
