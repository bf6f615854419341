"""Persistent catalog: register by name, pin snapshots, attach into a
fresh session, survive expire (reference analog: the Glue crawler step,
etl_orchestrator.json:354-377)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.catalog import Catalog
from e_commerce_lakehouse_spark.operators import expire_snapshots
from e_commerce_lakehouse_spark.table.writer import append_dataframe
from tests.conftest import N_TURNS


def _extra(tiny_df, prefix, n):
    return tiny_df.limit(n).select(
        F.concat(F.lit(prefix), "conv_id").alias("conv_id"),
        "turn_idx", "role", "text", "tool", "ts",
    )


def test_register_attach_and_sql_by_name(spark, tiny_table, tmp_path):
    cat = Catalog(str(tmp_path / "catalog.json"))
    cat.register("transcripts", tiny_table)
    assert cat.attach(spark) == ["transcripts"]
    n = spark.sql("SELECT count(*) AS n FROM transcripts").collect()[0]["n"]
    assert n == N_TURNS
    rows = spark.sql(
        "SELECT role, count(*) AS n FROM transcripts GROUP BY role"
    ).collect()
    assert sum(r["n"] for r in rows) == N_TURNS


def test_pinned_registration_survives_expire(spark, tiny_table, tiny_df, tmp_path):
    """A snapshot-pinned catalog entry tags the snapshot, so retention
    churn cannot expire it out from under external readers."""
    cat = Catalog(str(tmp_path / "catalog.json"))
    pinned = tiny_table.current_snapshot_id()
    cat.register("transcripts_v1", tiny_table, snapshot_id=pinned)
    # churn the table well past retention
    append_dataframe(spark, tiny_table, _extra(tiny_df, "conv-a-", 20))
    append_dataframe(spark, tiny_table, _extra(tiny_df, "conv-b-", 20))
    expire_snapshots(tiny_table, keep_last=1)
    assert pinned in tiny_table.snapshot_ids()  # tag held it

    cat.attach(spark, ["transcripts_v1"])
    n = spark.sql("SELECT count(*) AS n FROM transcripts_v1").collect()[0]["n"]
    assert n == N_TURNS  # the pinned view, not the churned head

    # unregister drops the protective tag; next expire ages it out
    cat.unregister("transcripts_v1")
    expire_snapshots(tiny_table, keep_last=1)
    assert pinned not in tiny_table.snapshot_ids()


def test_external_session_resolves_by_name(spark, tiny_table, tmp_path):
    """Cross-session persistence: a catalog file written here resolves in
    a brand-new Catalog instance (as a separate process would) and the
    attached view reads the pinned data."""
    path = str(tmp_path / "catalog.json")
    Catalog(path).register("t_ext", tiny_table,
                           snapshot_id=tiny_table.current_snapshot_id())
    # fresh instance = what another process constructs from the file
    cat2 = Catalog(path)
    t, sid = cat2.resolve("t_ext")
    assert t.root == tiny_table.root and sid == tiny_table.current_snapshot_id()
    cat2.attach(spark, ["t_ext"])
    assert spark.sql("SELECT count(*) AS n FROM t_ext").collect()[0]["n"] == N_TURNS


def test_catalog_guards(spark, tiny_table, tmp_path):
    cat = Catalog(str(tmp_path / "catalog.json"))
    cat.register("t1", tiny_table)
    with pytest.raises(ValueError, match="already registered"):
        cat.register("t1", tiny_table)
    cat.register("t1", tiny_table, replace=True)
    with pytest.raises(KeyError):
        cat.resolve("missing")
    with pytest.raises(KeyError):
        cat.unregister("missing")
    with pytest.raises(FileNotFoundError):
        cat.register("bad", tiny_table, snapshot_id=9999)
    with pytest.raises(ValueError, match="at most one"):
        cat.register("both", tiny_table, snapshot_id=1, ref="x")


def test_replace_moves_protective_tag(spark, tiny_table, tiny_df, tmp_path):
    """register(replace=True) must MOVE the catalog tag to the new pin:
    the old guard left the new pin expirable and the old snapshot pinned
    forever (review finding)."""
    cat = Catalog(str(tmp_path / "catalog.json"))
    old_pin = tiny_table.current_snapshot_id()
    cat.register("t", tiny_table, snapshot_id=old_pin)
    append_dataframe(spark, tiny_table, _extra(tiny_df, "conv-r1-", 10))
    new_pin = tiny_table.current_snapshot_id()
    cat.register("t", tiny_table, snapshot_id=new_pin, replace=True)
    # churn + expire: the NEW pin must survive, the OLD must age out
    append_dataframe(spark, tiny_table, _extra(tiny_df, "conv-r2-", 10))
    append_dataframe(spark, tiny_table, _extra(tiny_df, "conv-r3-", 10))
    expire_snapshots(tiny_table, keep_last=1)
    assert new_pin in tiny_table.snapshot_ids()
    assert old_pin not in tiny_table.snapshot_ids()
    cat.attach(spark, ["t"])
    assert spark.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == N_TURNS + 10
