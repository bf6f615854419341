"""Transcript-shaped analytics: canonical projection + integrity audit.

BASELINE.json's ``input_hint`` fixes the engine's primary input shape:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp) — multi-turn conversation / agent transcripts. The
maintenance engine (compact/cluster/merge) treats rows opaquely; this
module is the ANALYTICS layer a transcript lakehouse needs on top:

- ``as_transcripts`` projects any event-log-shaped fact table into the
  canonical transcript schema (conv = actor, turn order = event time
  with id tiebreak) — the adapter that lets every transcript operator
  run over a generic event stream;
- ``conversation_shape_audit`` computes the per-conversation integrity
  profile that guards the north rule's "per-turn text equality under
  stable (conv_id, turn_idx) ordering" invariant: turn-index
  contiguity, timestamp monotonicity, consecutive-same-role repeats,
  tool-call density, inter-turn gaps.

Scale shape: ONE hash shuffle on conv_id; row_number, lag(role) and
lag(ts) share the same window partitioning and sort, and the final
group-by reuses the partitioning — Catalyst plans a single Exchange.
State per task is one conversation's turns (transcripts are bounded:
hot-conversation skew is a compaction/cluster concern, handled there
with salting; an audit aggregate over even a 10^6-turn conversation is
one sort buffer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["as_transcripts", "conversation_shape_audit"]


def as_transcripts(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    kind_col: str = "event_type",
    text_col: str = "props",
) -> DataFrame:
    """Project an event log into the canonical transcript schema.

    Deterministic: turn order is (ts, id) per actor; the role cycle is
    a pure function of (turn_idx, id) so any engine derives the same
    transcript from the same events.
    """
    w = Window.partitionBy(actor_col).orderBy(ts_col, id_col)
    base = events.where(
        F.col(actor_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(F.col(id_col) % 17 == 5, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    return base.select(
        F.format_string("conv-%09d", F.col(actor_col)).alias("conv_id"),
        "turn_idx",
        role.alias("role"),
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("text"),
        F.when(role == "tool", F.col(kind_col)).alias("tool"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    )


def conversation_shape_audit(tr: DataFrame) -> DataFrame:
    """Per-conversation integrity + shape profile over the canonical
    transcript schema.

    Columns:
    - n_turns, n_roles, n_tool_turns, n_chars (BIGINT, exact);
    - idx_contiguous — max(turn_idx) == n_turns - 1 AND min == 0 (the
      stable-ordering precondition of the north rule's byte-equality
      check; a false here means a maintenance rewrite dropped or
      duplicated a turn);
    - ts_monotone — no turn's ts precedes its predecessor's (ties
      allowed: the synth plants them deliberately);
    - n_role_repeats — consecutive turns with the same role (agent loop
      detector);
    - duration_sec / max_gap_sec — exact integer-microsecond intervals
      floored to seconds (q121 precision contract).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        tr.select(
            "conv_id",
            "turn_idx",
            "role",
            "tool",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            F.length("text").cast("long").alias("len"),
        )
        .withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts", F.lag("ts_us").over(w))
    )
    return (
        t.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.countDistinct("role").cast("long").alias("n_roles"),
            F.sum((F.col("role") == "tool").cast("int")).cast("long").alias("n_tool_turns"),
            F.sum("len").cast("long").alias("n_chars"),
            (
                (F.max("turn_idx") == F.count(F.lit(1)) - 1)
                & (F.min("turn_idx") == 0)
            ).alias("idx_contiguous"),
            (
                F.sum(
                    F.when(F.col("prev_ts").isNotNull()
                           & (F.col("ts_us") < F.col("prev_ts")), 1).otherwise(0)
                ) == 0
            ).alias("ts_monotone"),
            F.sum(
                F.when(F.col("role") == F.col("prev_role"), 1).otherwise(0)
            ).cast("long").alias("n_role_repeats"),
            F.floor((F.max("ts_us") - F.min("ts_us")) / F.lit(1_000_000))
            .cast("long").alias("duration_sec"),
            F.coalesce(
                F.floor(
                    F.max(F.col("ts_us") - F.col("prev_ts")) / F.lit(1_000_000)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("max_gap_sec"),
        )
    )
