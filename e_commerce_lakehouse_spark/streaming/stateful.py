"""Custom stateful streaming operator: per-conversation running stats.

The reference has NO stateful streaming (SURVEY.md §2.8) — its only state
is "MERGE overwrites matched keys". This operator shows the engine's
Spark-first answer for stateful per-key processing:
``applyInPandasWithState`` keeps (n_turns, max_turn_idx, last_ts) per
conv_id across micro-batches, emitting one updated row per key per batch.
State is Arrow-batched pandas — no per-row Python.

Works under Trigger.AvailableNow for bounded backfills and continuously
for live streams; a processing-time timeout finalizes idle conversations.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, n_turns long, max_turn_idx int, last_ts timestamp, finalized boolean"
STATE_SCHEMA = "n_turns long, max_turn_idx int, last_ts_us long"


def _make_update(idle_timeout_ms: int | None):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            n, mx, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [(conv_id, n, mx, pd.Timestamp(last_us, unit="us"), True)],
                columns=["conv_id", "n_turns", "max_turn_idx", "last_ts", "finalized"],
            )
            return
        n, mx, last_us = state.get if state.exists else (0, -1, 0)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
                last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
        state.update((n, mx, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [(conv_id, n, mx, pd.Timestamp(last_us, unit="us"), False)],
            columns=["conv_id", "n_turns", "max_turn_idx", "last_ts", "finalized"],
        )

    return _update


def conversation_stats_stream(
    stream_df: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Stateful per-conv aggregation over a streaming transcripts frame.

    ``idle_timeout_ms=None`` (default) uses NoTimeout — required for
    bounded Trigger.AvailableNow drains, where a processing-time timeout
    keeps the query alive in a state-cleanup loop after the data is done.
    Pass a timeout for LIVE streams to emit a finalized=true row when a
    conversation goes idle."""
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
