"""Branches (table/meta.py): mutable named refs — Iceberg branch +
fast-forward publish semantics over the from-scratch snapshot store.
Tags are immutable pins; a branch is a movable head whose commits main
readers never see until fast_forward. No reference analog (the
reference has a single Delta head per table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.expire import expire_snapshots
from e_commerce_lakehouse_spark.synth import transcripts_df
from e_commerce_lakehouse_spark.table import scan
from e_commerce_lakehouse_spark.table.meta import Table
from e_commerce_lakehouse_spark.table.writer import (
    append_dataframe,
    create_transcripts_table,
)
from tests.conftest import assert_same_rows


@pytest.fixture()
def table(spark, tmp_path):
    df = transcripts_df(spark, 2_000, seed=41).cache()
    df.count()
    t = create_transcripts_table(spark, str(tmp_path / "btbl"), df,
                                 rows_per_file=500)
    return t, df


def test_branch_commits_invisible_to_main_until_fast_forward(spark, table):
    t, df = table
    main_head = t.current_snapshot_id()
    bt = t.create_branch("dev")
    assert bt.branch == "dev" and bt.current_snapshot_id() == main_head

    extra = transcripts_df(spark, 300, seed=42).withColumn(
        "conv_id", F.concat(F.lit("dev-"), F.col("conv_id"))
    ).cache()
    extra.count()
    append_dataframe(spark, bt, extra, rows_per_file=300)

    # main untouched; branch sees the append; ref-name scan resolves it
    assert t.current_snapshot_id() == main_head
    assert_same_rows(scan(spark, t), df)
    both = df.unionByName(extra)
    assert_same_rows(scan(spark, bt), both)
    assert_same_rows(scan(spark, t, ref="dev"), both)

    # maintenance on the branch stays on the branch
    compact(spark, bt, target_bytes=256 << 20)
    assert t.current_snapshot_id() == main_head
    assert_same_rows(scan(spark, bt), both)

    # fast-forward publishes; second call is a no-op
    new_head = t.fast_forward("dev")
    assert t.current_snapshot_id() == new_head == bt.current_snapshot_id()
    assert_same_rows(scan(spark, t), both)
    assert t.fast_forward("dev") == new_head


def test_fast_forward_refuses_diverged(spark, table):
    t, df = table
    bt = t.create_branch("dev")
    append_dataframe(spark, bt, transcripts_df(spark, 100, seed=43))
    # main moves too -> diverged
    append_dataframe(spark, t, transcripts_df(spark, 100, seed=44))
    with pytest.raises(ValueError, match="does not descend"):
        t.fast_forward("dev")
    # the branch can fast-forward FROM main though? no — also diverged
    with pytest.raises(KeyError):
        t.fast_forward("nope")


def test_ref_name_collisions_and_guards(spark, table):
    t, _ = table
    t.create_tag("v1")
    with pytest.raises(ValueError, match="tag named"):
        t.create_branch("v1")
    t.create_branch("dev")
    with pytest.raises(ValueError, match="branch named"):
        t.create_tag("dev")
    with pytest.raises(FileExistsError):
        t.create_branch("dev")
    with pytest.raises(ValueError, match="bad branch name"):
        t.create_branch("-bad/name")
    with pytest.raises(ValueError, match="no such branch"):
        Table.load(t.root, branch="ghost")
    assert t.branches() == {"dev": t.current_snapshot_id()}
    t.delete_branch("dev")
    with pytest.raises(KeyError):
        t.delete_branch("dev")


def test_expire_pins_branch_chain_and_releases_on_delete(spark, table):
    t, df = table
    bt = t.create_branch("dev")
    extra = transcripts_df(spark, 200, seed=45).cache()
    extra.count()
    append_dataframe(spark, bt, extra, rows_per_file=200)
    branch_head = bt.current_snapshot_id()
    fork_point = t.current_snapshot_id()

    # churn main far enough that keep_last would drop the fork point
    for seed in (46, 47, 48):
        append_dataframe(spark, t, transcripts_df(spark, 50, seed=seed))
    expire_snapshots(t, keep_last=1)
    # branch head AND its chain to the fork survive; branch still reads
    assert branch_head in t.snapshot_ids()
    assert fork_point in t.snapshot_ids()
    assert_same_rows(scan(spark, bt), df.unionByName(extra))

    # releasing the branch lets the chain age out and GC its files
    t.delete_branch("dev")
    expire_snapshots(t, keep_last=1)
    assert branch_head not in t.snapshot_ids()
    assert_same_rows(
        scan(spark, t),
        df.unionByName(
            transcripts_df(spark, 50, seed=46)
        ).unionByName(
            transcripts_df(spark, 50, seed=47)
        ).unionByName(
            transcripts_df(spark, 50, seed=48)
        ),
    )


def test_concurrent_main_and_branch_writers(spark, table):
    """Two writers racing on DIFFERENT refs of one table: the global
    commit lock serializes them, but neither conflicts logically — each
    pointer advances with its own commits only, and both final states
    are exactly their own appends."""
    import threading

    from e_commerce_lakehouse_spark.pipeline import with_retries

    t, df = table
    t.create_branch("dev")
    errors = []

    def _writer(branch, seeds, prefix):
        try:
            for s in seeds:
                extra = transcripts_df(spark, 100, seed=s).withColumn(
                    "conv_id", F.concat(F.lit(prefix), F.col("conv_id"))
                )
                with_retries(
                    lambda e=extra: append_dataframe(
                        spark, Table.load(t.root, branch=branch), e,
                        rows_per_file=100,
                    ),
                    attempts=6, backoff_s=0.2,
                )
        except Exception as e:  # noqa: BLE001
            errors.append((branch, e))

    th1 = threading.Thread(target=_writer, args=(None, (61, 62, 63), "m-"))
    th2 = threading.Thread(target=_writer, args=("dev", (64, 65, 66), "d-"))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errors, errors

    main_extra = [transcripts_df(spark, 100, seed=s).withColumn(
        "conv_id", F.concat(F.lit("m-"), F.col("conv_id"))) for s in (61, 62, 63)]
    dev_extra = [transcripts_df(spark, 100, seed=s).withColumn(
        "conv_id", F.concat(F.lit("d-"), F.col("conv_id"))) for s in (64, 65, 66)]
    want_main = df
    for e in main_extra:
        want_main = want_main.unionByName(e)
    want_dev = df
    for e in dev_extra:
        want_dev = want_dev.unionByName(e)
    assert_same_rows(scan(spark, t), want_main)
    assert_same_rows(scan(spark, Table.load(t.root, branch="dev")), want_dev)
    # diverged now: publish must refuse
    with pytest.raises(ValueError, match="does not descend"):
        t.fast_forward("dev")


def test_global_metadata_evolution_refused_on_branch(spark, table):
    """Schema versions and the partition spec are table-global (resolved
    by snapshot id / applied to every ref's future writes): evolving them
    from a branch would leak into main, so both refuse."""
    from e_commerce_lakehouse_spark.operators.schema_evolution import (
        add_columns,
        drop_columns,
    )

    t, _ = table
    bt = t.create_branch("dev")
    with pytest.raises(ValueError, match="main"):
        add_columns(bt, [("quality", "double")])
    with pytest.raises(ValueError, match="main"):
        drop_columns(bt, ["tool"])
    from e_commerce_lakehouse_spark.table.partition import PartitionField

    with pytest.raises(ValueError, match="main"):
        bt.evolve_partition_spec(
            [PartitionField("ts_day", "ts", "day")],
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        )
    # and they still work on the main-loaded handle
    add_columns(t, [("quality", "double")])
    assert "quality" in [
        f.name for f in __import__(
            "e_commerce_lakehouse_spark.table.scan", fromlist=["resolve_schema"]
        ).resolve_schema(t).fields
    ]


def test_branch_snapshots_never_served_by_main_time_travel(spark, table):
    """A branch-exclusive snapshot retained BELOW main's walkable-chain
    floor (its branch pin outlives expired main-exclusive history) must
    not read as published main history: before fast_forward, main's
    time travel must skip it; after fast_forward the adopted snapshot
    is ordinary main history and must be served."""
    import time as _time

    t, df = table
    fork_point = t.current_snapshot_id()
    bt = t.create_branch("slow")
    extra = transcripts_df(spark, 200, seed=61).cache()
    extra.count()
    _time.sleep(0.01)
    append_dataframe(spark, bt, extra, rows_per_file=200)
    branch_sid = bt.current_snapshot_id()
    branch_ts = t.snapshot(branch_sid).timestamp_ms
    assert t.snapshot(branch_sid).summary.get("branch") == "slow"
    _time.sleep(0.01)

    # churn main so keep_last expires the main-exclusive middle commits,
    # breaking main's chain walk above the fork point
    for seed in (62, 63, 64):
        append_dataframe(spark, t, transcripts_df(spark, 50, seed=seed))
    expire_snapshots(t, keep_last=2)
    published = t._published_ids()
    # the scenario is only meaningful if the branch snapshot really is
    # retained below a broken chain floor: walk main's chain to find it
    chain_floor = t.current_snapshot_id()
    while True:
        parent = t.snapshot(chain_floor).parent_id
        if parent is None:
            break
        try:
            t.snapshot(parent)
        except FileNotFoundError:
            break  # chain broken: parent expired
        chain_floor = parent
    assert branch_sid in t.snapshot_ids()
    assert branch_sid < chain_floor
    assert branch_sid not in published
    assert fork_point in published  # real main history stays servable

    # time travel to just after the branch commit: main must resolve to
    # the fork point (its state then), NOT the branch snapshot
    assert t.snapshot_id_as_of(branch_ts) == fork_point

    # publish: fast_forward clears the provenance marker and the adopted
    # snapshot becomes servable main history
    t2 = Table.load(t.root)
    # fast_forward refuses (diverged) — mimic publish by re-branching
    # from main and appending, then fast-forwarding cleanly instead
    bt2 = t2.create_branch("clean")
    _time.sleep(0.01)
    append_dataframe(spark, bt2, transcripts_df(spark, 40, seed=65))
    adopted = bt2.current_snapshot_id()
    assert t2.snapshot(adopted).summary.get("branch") == "clean"
    t2.fast_forward("clean")
    assert "branch" not in t2.snapshot(adopted).summary
    assert adopted in t2._published_ids()
    assert t2.snapshot_id_as_of(t2.snapshot(adopted).timestamp_ms) == adopted


def test_expire_from_branch_handle_preserves_main(spark, table):
    """expire run on a BRANCH handle must pin MAIN's chain too: the
    branch head is `current` there, and main-exclusive snapshots are
    otherwise unprotected — expire could leave VERSION pointing at a
    deleted snapshot (review finding)."""
    t, df = table
    # main advances past the fork
    extra_main = transcripts_df(spark, 60, seed=71)
    append_dataframe(spark, t, extra_main)
    main_head = t.current_snapshot_id()
    # branch churns far enough that keep_last covers only branch ids
    bt = t.create_branch("busy")
    for seed in (72, 73, 74):
        append_dataframe(spark, bt, transcripts_df(spark, 40, seed=seed))

    expire_snapshots(bt, keep_last=1, orphan_grace_ms=0)

    # main is fully intact: head snapshot readable, scan returns its rows
    assert t.current_snapshot_id() == main_head
    assert main_head in t.snapshot_ids()
    assert_same_rows(scan(spark, t), df.unionByName(extra_main))
    # and the branch still reads everything it wrote
    assert scan(spark, bt).count() == df.count() + 60 + 120
