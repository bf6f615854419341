"""Closed-form invariants for the transcript serving-analytics batch
(q178-q180): context-budget overflow, response latency, and
conversation-granularity exact dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.transcripts import (
    context_budget_audit,
    conversation_dedup,
    response_latency,
)


def _tr(spark, rows):
    """rows: (conv_id, turn_idx, role, text, ts_sec)."""
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, sec long"
    )
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )


def test_context_budget_overflow_turn_exact(spark):
    # cum lengths: 3, 7, 12 → with budget 7 the overflow turn is 2,
    # two turns fit; with budget 12 nothing overflows.
    tr = _tr(
        spark,
        [
            ("c1", 0, "system", "abc", 0),
            ("c1", 1, "assistant", "defg", 60),
            ("c1", 2, "user", "hijkl", 120),
        ],
    )
    row = context_budget_audit(tr, budget_chars=7).collect()[0]
    assert row.n_turns == 3
    assert row.total_chars == 12
    assert row.n_turns_within_budget == 2
    assert row.first_overflow_turn == 2
    assert row.overflowed is True

    row = context_budget_audit(tr, budget_chars=12).collect()[0]
    assert row.first_overflow_turn is None
    assert row.overflowed is False
    assert row.n_turns_within_budget == 3


def test_response_latency_pairs_only_user_then_assistant(spark):
    # c1: user@0 -> assistant@90 (90s), assistant@90 -> user@100 (not a
    # pair), user@100 -> user@160 (not a pair), user@160 -> assistant@190
    # (30s). Exactly 2 exchanges; min 30, max 90, avg 60.
    tr = _tr(
        spark,
        [
            ("c1", 0, "user", "a", 0),
            ("c1", 1, "assistant", "b", 90),
            ("c1", 2, "user", "c", 100),
            ("c1", 3, "user", "d", 160),
            ("c1", 4, "assistant", "e", 190),
        ],
    )
    row = response_latency(tr).collect()[0]
    assert row.n_exchanges == 2
    assert row.min_latency_sec == 30
    assert row.max_latency_sec == 90
    assert row.avg_latency_sec == pytest.approx(60.0)


def test_conversation_dedup_groups_and_boundary_forgery(spark):
    # c1 and c2 are turn-for-turn identical -> one group, min conv_id
    # canonical. c3 splits the same characters differently ("ab","c" vs
    # "a","bc") -> the length-prefixed fingerprint must NOT collide.
    tr = _tr(
        spark,
        [
            ("c1", 0, "user", "ab", 0),
            ("c1", 1, "assistant", "c", 60),
            ("c2", 0, "user", "ab", 0),
            ("c2", 1, "assistant", "c", 60),
            ("c3", 0, "user", "a", 0),
            ("c3", 1, "assistant", "bc", 60),
        ],
    )
    out = {r.conv_id: r for r in conversation_dedup(tr).collect()}
    assert out["c1"].fingerprint == out["c2"].fingerprint
    assert out["c3"].fingerprint != out["c1"].fingerprint
    assert out["c1"].group_size == 2 and out["c3"].group_size == 1
    assert out["c1"].is_canonical is True
    assert out["c2"].is_canonical is False
    assert out["c3"].is_canonical is True
