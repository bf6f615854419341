"""APPLY CHANGES INTO — consume a typed change feed into a target table.

Closes the CDC loop: ``table/cdc.ChangeFeedConsumer`` PRODUCES Delta-CDF
shaped batches (``_change_type`` 'insert' | 'delete', ``_commit_sid``);
this operator APPLIES one into another native table, which is all a
downstream replica, reverse-ETL sink, or type-1 SCD needs. Public model:
Delta Live Tables' APPLY CHANGES INTO (SCD1) — end-state semantics, not
event-by-event replay. Reference analog: none (the reference's S3-event
pipeline pushes object-created notifications only,
`/root/reference/src/lambda/file_processor.py`); its consumers had no
delete path at all.

Semantics (per key, over the whole batch):
- the winning row is the one with the greatest ``seq_col``; at equal
  sequence an 'insert' outranks a 'delete' (an exact-mode rewrite emits
  the delete pre-image AND the insert post-image under ONE commit sid —
  the post-image is the end state);
- winner 'insert' → upsert (MERGE); winner 'delete' → merge-on-read key
  tombstone. At-least-once re-emits (a rewrite's carried-along rows) are
  absorbed: upserting an identical row is a no-op by value.

100 TB design: ONE window over the batch keyed by the merge keys picks
winners (the batch is change-sized, never table-sized); upserts flow
through merge_into (touched-file pruning — cost O(files containing
changed keys)); deletes cost O(keys) via a tombstone parquet, no target
read. Nothing collects to the driver.
"""

from __future__ import annotations

from time import monotonic

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..table.meta import Table

CHANGE_COL = "_change_type"
SEQ_COL = "_commit_sid"


def apply_changes(
    spark: SparkSession,
    target: Table,
    changes: DataFrame,
    keys,
    seq_col: str = SEQ_COL,
    change_col: str = CHANGE_COL,
    rows_per_file: int = 100_000,
) -> dict:
    """Apply one change batch to ``target``; returns
    ``{"upserted", "deleted", "snapshot_id"}``. Empty batches (or batches
    that reduce to nothing) commit nothing."""
    keys = list(keys)
    missing = sorted({*keys, seq_col, change_col} - set(changes.columns))
    if missing:
        raise ValueError(f"changes frame is missing columns: {missing}")
    bad = (changes.select(change_col).where(
        ~F.col(change_col).isin("insert", "delete")).limit(1).collect())
    if bad:
        raise ValueError(f"unknown {change_col} value: {bad[0][0]!r}")

    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        # equal sid: the insert post-image is the end state
        F.when(F.col(change_col) == "insert", 0).otherwise(1),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    ).persist()
    try:
        upserts = latest.where(F.col(change_col) == "insert") \
                        .drop(change_col, seq_col)
        deletes = latest.where(F.col(change_col) == "delete").select(*keys)

        n_up = upserts.count()
        n_del = deletes.count()
        snap_id = target.current_snapshot_id()
        if n_up:
            if snap_id is None:
                from ..table.writer import append_dataframe

                snap_id = append_dataframe(
                    spark, target, upserts, rows_per_file=rows_per_file
                ).snapshot_id
            else:
                from .merge import merge_into

                # winners are already one-row-per-key: no order column
                snap_id = merge_into(
                    spark, target, upserts, keys=keys, order_col=None
                )["committed_snapshot"]
        if n_del and target.current_snapshot_id() is not None:
            from .rowlevel import delete_by_keys

            res = delete_by_keys(spark, target, deletes, keys=keys)
            snap_id = res["committed_snapshot"] or snap_id
        return {"upserted": n_up, "deleted": n_del, "snapshot_id": snap_id}
    finally:
        latest.unpersist()


def replicate(
    spark: SparkSession,
    consumer,
    target: Table,
    keys,
    exact: bool = True,
) -> dict | None:
    """One replication tick: poll the source's change feed and apply it
    to ``target``; ack only after the apply committed (at-least-once —
    a crash between apply and ack re-delivers, and apply_changes absorbs
    the replay). Returns the apply metrics, or None when caught up."""
    batch = consumer.poll_changes(spark, exact=exact)
    if batch is None:
        return None
    out = apply_changes(spark, target, batch["df"], keys)
    consumer.ack()
    out["from"] = batch["from"]
    out["to"] = batch["to"]
    return out
