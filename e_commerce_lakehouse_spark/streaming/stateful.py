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


BUDGET_OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, total_chars long, "
    "n_turns_within_budget long, first_overflow_turn int, overflowed boolean"
)
BUDGET_STATE_SCHEMA = (
    "n_turns long, total_chars long, within long, overflow_turn int"
)


def _make_budget_update(budget_chars: int):
    def _update(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        n, total, within, ovf = (
            state.get if state.exists else (0, 0, 0, None)
        )
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames) if len(frames) > 1 else frames[0]
            # arrival order inside the batch = event time with id
            # tiebreak (the as_transcripts turn-order contract); state
            # carries the cumulative position across batches
            pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
            lens = (
                pdf["text"].fillna("").astype(str).str.len().to_numpy("int64")
            )
            cum = total + lens.cumsum()
            within += int((cum <= budget_chars).sum())
            if ovf is None:
                over = (cum > budget_chars).nonzero()[0]
                if len(over):
                    ovf = n + int(over[0])
            n += len(lens)
            total = int(cum[-1])
        state.update((n, total, within, ovf))
        yield pd.DataFrame(
            [
                (
                    conv_id,
                    n,
                    total,
                    within,
                    ovf,
                    ovf is not None,
                )
            ],
            columns=[
                "conv_id",
                "n_turns",
                "total_chars",
                "n_turns_within_budget",
                "first_overflow_turn",
                "overflowed",
            ],
        )

    return _update


def context_budget_stream(
    stream_df: DataFrame, budget_chars: int = 2000
) -> DataFrame:
    """Stateful streaming twin of transcripts.context_budget_audit: a
    running per-conversation character budget maintained across
    micro-batches in ``applyInPandasWithState`` — state is (n_turns,
    total_chars, n_within, first_overflow_turn); each batch sorts its
    slice by (ts, event_id) and extends the cumulative sum, so on an
    in-order (or single-batch AvailableNow) replay the final update row
    per conversation equals the batch operator exactly (q178's oracle).

    Input: raw event rows with (conv_id, ts, event_id, text). Arrow-
    batched pandas; numpy cumsum — no per-row Python.
    """
    return stream_df.groupBy("conv_id").applyInPandasWithState(
        _make_budget_update(int(budget_chars)),
        outputStructType=BUDGET_OUTPUT_SCHEMA,
        stateStructType=BUDGET_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
