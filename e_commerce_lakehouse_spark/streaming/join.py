"""Stream-stream event-time join.

The reference has no streaming joins at all — its closest analog is the
batch MERGE reconciliation between landing files and the table
(`/root/reference/src/glue_jobs/orders_etl.py:179-188`). A web-scale
event pipeline needs the real thing: correlate two live event streams
(e.g. click → purchase attribution) by key within an event-time window,
with bounded state.

Spark-first shape (Structured Streaming's canonical pattern):

- both sides carry a watermark, so the join state for a key is evicted
  once event time passes ``left_ts + within + watermark`` — state is
  O(events inside the horizon), never O(stream);
- the join condition is key equality AND an event-time RANGE
  (``right_ts`` in ``(left_ts, left_ts + within]``) — the range is what
  lets Spark bound state at all (a bare equi-join on two streams would
  have to retain everything);
- inner matches emit as soon as both sides arrive; nothing waits for
  window close, so latency is one micro-batch.

The same function works on BATCH DataFrames (watermarks skipped, same
join condition) — bounded-replay parity is the correctness oracle: on a
finite input the streaming result must equal the batch join, which is
plain SQL a second engine can verify (q72).

At 100 TB scale: the join shuffles both streams by ``key`` once; state
lives in the state store partitioned the same way, so a hot key is the
only skew concern — the ``within`` horizon caps how much of it can
accumulate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "6 hours",
    watermark: str = "6 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``(left_ts, left_ts + within]`` — strict ">" so an event never joins
    itself when both sides derive from one stream.

    Every non-key column is prefixed (``l_``/``r_``) so self-joins and
    same-named columns are unambiguous; ``key`` keeps its name. Output
    columns: ``key``, then prefixed left columns, then prefixed right
    columns.

    Watermarks: applied only when the side is actually streaming. NTZ
    timestamp columns are cast to TIMESTAMP for the watermark/join
    column (Spark watermarks require an instant type); the original NTZ
    columns pass through untouched, so downstream values never depend on
    the session timezone.

    ``how``: "inner" (the bounded-state default), or "leftOuter" — outer
    results emit only after the watermark closes the match window, and
    both sides MUST carry watermarks (enforced by Spark itself).
    """
    lt, rt = "__l_evt_ts", "__r_evt_ts"
    lside = left.withColumn(lt, F.col(left_ts).cast("timestamp"))
    rside = right.withColumn(rt, F.col(right_ts).cast("timestamp"))
    if lside.isStreaming:
        lside = lside.withWatermark(lt, watermark)
    if rside.isStreaming:
        rside = rside.withWatermark(rt, watermark)

    lcols = [c for c in left.columns if c != key]
    rcols = [c for c in right.columns if c != key]
    lside = lside.select(
        F.col(key), F.col(lt), *[F.col(c).alias(left_prefix + c) for c in lcols]
    )
    rside = rside.select(
        F.col(key).alias("__r_key"), F.col(rt),
        *[F.col(c).alias(right_prefix + c) for c in rcols],
    )

    cond = (
        (F.col(key) == F.col("__r_key"))
        & (F.col(rt) > F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {within}"))
    )
    joined = lside.join(rside, cond, how)
    return joined.drop("__r_key", lt, rt)
