"""Structured-Streaming ingestion into the lakehouse table.

The reference approximates streaming with S3-event → Lambda → Step
Functions → Glue micro-batches, idempotent via MERGE-on-PK +
move-after-success archival (SURVEY.md §2.8,
`/root/reference/src/lambda/s3_event_trigger.py:33-48`,
`orders_etl.py:179-188`). Spark-first, that whole control plane collapses
to: file-source ``readStream`` + ``Trigger.AvailableNow`` +
``foreachBatch(MERGE INTO)``:

- new files under the landing dir are discovered by the source (replaces
  S3 events + Lambda routing);
- each micro-batch upserts by PK via operators/merge.merge_into —
  re-delivery of a file is idempotent, the reference's exactly-once-ish
  contract;
- the streaming checkpoint dir replaces move-after-success archival as
  the processed-file ledger.

``windowed_counts`` is the watermark + event-time tumbling-window
aggregation surface (usable in batch mode too — same function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_into
from ..schema import TRANSCRIPTS_SCHEMA
from ..table.meta import Table


def ingest_available_now(
    spark: SparkSession,
    table: Table,
    landing_dir: str,
    checkpoint_dir: str,
    schema=TRANSCRIPTS_SCHEMA,
    source_format: str = "csv",
    keys=("conv_id", "turn_idx"),
) -> dict:
    """Drain all currently-available files from ``landing_dir`` into the
    table via MERGE, then stop (Trigger.AvailableNow). Returns metrics.

    Explicit schema (never inferSchema — SURVEY.md §1.4); CSV files carry
    a header row like the reference's inputs."""
    reader = spark.readStream.schema(schema)
    if source_format == "csv":
        stream = reader.option("header", "true").csv(landing_dir)
    elif source_format == "parquet":
        stream = reader.parquet(landing_dir)
    else:
        raise ValueError(f"unsupported streaming source: {source_format}")

    batches: list[dict] = []

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.current_snapshot_id() is None:
            # first batch bootstraps the table (Delta initial write analog,
            # orders_etl.py:191-194)
            from ..operators.constraints import enforce_constraints
            from ..table.writer import write_files

            batch_df = enforce_constraints(batch_df, table, context="stream-bootstrap")
            entries = write_files(
                spark, table, batch_df, n_files=max(1, batch_df.rdd.getNumPartitions()),
                subdir=f"stream-{epoch_id:08d}",
            )
            table.commit_append(entries, {"op": "stream-bootstrap", "epoch": epoch_id})
            batches.append({"epoch": epoch_id, "op": "bootstrap"})
            return
        m = merge_into(spark, table, batch_df, keys=keys, schema=schema)
        batches.append({"epoch": epoch_id, "op": "merge", **m})

    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"batches": batches, "snapshot": table.current_snapshot_id()}


def windowed_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("role",),
) -> DataFrame:
    """Event-time tumbling-window counts. On a streaming DataFrame the
    watermark bounds state and drops late rows (the late-data policy the
    reference lacks — its only handling is MERGE-overwrites, SURVEY §2.8);
    on a batch DataFrame the same code is a plain windowed aggregation."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    return src.groupBy(
        F.window(F.col(ts_col), window).getField("start").alias("window_start"),
        *group_cols,
    ).agg(F.count("*").alias("n"))


def stream_dedup(
    df: DataFrame,
    keys: tuple[str, ...] = ("conv_id", "turn_idx"),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming key-dedup with BOUNDED state: keep the first arrival of
    each key, dropping redeliveries that land within the watermark
    horizon (``dropDuplicatesWithinWatermark`` — state for a key is
    evicted once the watermark passes it, so the operator never
    accumulates unbounded key state the way plain ``dropDuplicates``
    does on a stream). This is the at-source half of exactly-once for a
    redelivering transport; the foreachBatch MERGE sink
    (ingest_available_now) is the idempotent other half — together
    duplicate deliveries can't double-append.

    On a batch DataFrame the same call degrades to plain dropDuplicates
    (watermarks are a streaming concept)."""
    if not df.isStreaming:
        return df.dropDuplicates(list(keys))
    return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
