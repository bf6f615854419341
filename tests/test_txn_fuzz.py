"""Model-based fuzz for multi-table transactions: random interleavings
of append / atomic-commit / abort / mid-flip crash / conflict / heal /
compact / expire on two tables, checked after EVERY op against a pure
Python model of which batches must be visible where.

Invariants the model encodes:
- a committed txn's batches appear on BOTH tables (after heal, which
  every Table.load performs);
- an aborted or conflicted txn's batches appear NOWHERE, ever;
- maintenance (compact / expire+GC) never changes visible content;
- batch identity survives everything (checked via distinct marker ids,
  not just counts).
"""

import random

import pytest

from e_commerce_lakehouse_spark.operators.compact import compact
from e_commerce_lakehouse_spark.operators.expire import expire_snapshots
from e_commerce_lakehouse_spark.table.meta import CommitConflictError, Table
from e_commerce_lakehouse_spark.table.scan import scan
from e_commerce_lakehouse_spark.table.txn import MultiTableTransaction
from e_commerce_lakehouse_spark.table.writer import append_dataframe

ROWS_PER_BATCH = 7


def _batch(spark, batch_id: int):
    return spark.range(ROWS_PER_BATCH).selectExpr(
        "id AS row_id", f"{batch_id} AS batch_id"
    )


def _observed(spark, root) -> dict:
    df = scan(spark, Table.load(root))
    rows = df.groupBy("batch_id").count().collect()
    return {int(r[0]): int(r[1]) for r in rows}


@pytest.mark.parametrize("seed", [11, 23])
def test_txn_interleaving_fuzz(spark, tmp_path, seed):
    rng = random.Random(seed)
    roots = [str(tmp_path / f"t{i}") for i in range(2)]
    model: dict[str, set[int]] = {r: set() for r in roots}
    next_id = 0

    def new_batch():
        nonlocal next_id
        next_id += 1
        return next_id, _batch(spark, next_id)

    schema_df = _batch(spark, 0)
    for r in roots:
        t = Table.create(r)
        t.append_schema_version(schema_df.schema.jsonValue(), as_of_snapshot=0)
        bid, df = new_batch()
        append_dataframe(spark, t, df)
        model[r].add(bid)

    txn_dir = str(tmp_path / "_txns")
    for step in range(24):
        op = rng.choice(
            ["append", "txn_ok", "txn_abort", "txn_crash", "txn_conflict",
             "compact", "expire"]
        )
        if op == "append":
            r = rng.choice(roots)
            bid, df = new_batch()
            append_dataframe(spark, Table.load(r), df)
            model[r].add(bid)
        elif op == "txn_ok":
            txn = MultiTableTransaction(txn_dir)
            bids = []
            for r in roots:
                bid, df = new_batch()
                txn.stage_append(spark, Table.load(r), df)
                bids.append(bid)
            txn.commit()
            for r, bid in zip(roots, bids):
                model[r].add(bid)
        elif op == "txn_abort":
            txn = MultiTableTransaction(txn_dir)
            for r in roots:
                _bid, df = new_batch()
                txn.stage_append(spark, Table.load(r), df)
            txn.abort()  # model unchanged, forever
        elif op == "txn_crash":
            txn = MultiTableTransaction(txn_dir)
            bids = []
            for r in roots:
                bid, df = new_batch()
                txn.stage_append(spark, Table.load(r), df)
                bids.append(bid)
            k = rng.randint(0, 1)
            with pytest.raises(RuntimeError, match="simulated crash"):
                txn.commit(_fail_after_flips=k)
            # DECIDED: after the next load (the observation itself heals)
            # both batches are visible
            for r, bid in zip(roots, bids):
                model[r].add(bid)
        elif op == "txn_conflict":
            txn = MultiTableTransaction(txn_dir)
            for r in roots:
                _bid, df = new_batch()
                txn.stage_append(spark, Table.load(r), df)
            loser = rng.choice(roots)
            bid, df = new_batch()  # interleaved writer moves one head
            append_dataframe(spark, Table.load(loser), df)
            model[loser].add(bid)
            with pytest.raises(CommitConflictError):
                txn.commit()
        elif op == "compact":
            r = rng.choice(roots)
            compact(spark, Table.load(r), target_bytes=1 << 20,
                    stat_columns=("batch_id",))
        elif op == "expire":
            r = rng.choice(roots)
            expire_snapshots(Table.load(r), keep_last=2, orphan_grace_ms=0)
        # EVERY op ends with a full observation of both tables
        for r in roots:
            got = _observed(spark, r)
            assert set(got) == model[r], (step, op, r, got, model[r])
            assert all(c == ROWS_PER_BATCH for c in got.values()), (
                step, op, r, got)
