"""Skew handling: salted repartitioning + AQE.

Hot conversations (FIXTURES.md: ~1-3% of turns in one conv_id) make a
plain ``repartition("conv_id")`` produce one giant partition. The north
rule requires "salted repartitioning plus AQE skew-split". AQE skew-join
splitting is enabled in session.py; this module provides the salting side
for non-join shuffles (the reference has no skew handling at all —
SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    key: str,
    n_partitions: int,
    salt_buckets: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Hash-repartition on (key, salt) so a hot key spreads over up to
    ``salt_buckets`` partitions. The salt derives deterministically from
    other row content (here: a stable hash of all columns), so output
    content is unchanged — only placement.
    """
    salted = df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), salt_buckets)
    )
    return salted.repartition(n_partitions, F.col(key), F.col(salt_col)).drop(salt_col)


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe aggregation: partial agg on (key, salt), final agg on
    key. A hot key's partial state spreads over ``salt_buckets`` reducers
    instead of hammering one; semantics are identical to a plain
    ``groupBy(key)`` (count/min/max compose exactly), so a plain GROUP BY
    oracle verifies it. This is the non-join complement of AQE's
    skew-join split (session.py) for the north rule's hot-conversation
    skew."""
    salt = F.pmod(F.xxhash64(F.col(key), F.col(value_col)), salt_buckets)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(
            F.count("*").alias("__n"),
            F.min(value_col).alias("__mn"),
            F.max(value_col).alias("__mx"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("__n").alias("n"),
        F.min("__mn").alias("min_value"),
        F.max("__mx").alias("max_value"),
    )


def skew_report(df: DataFrame, key: str, top_n: int = 5) -> dict:
    """Diagnostic: share of rows held by the hottest keys."""
    total = df.count()
    top = (
        df.groupBy(key)
        .count()
        .orderBy(F.desc("count"), key)
        .limit(top_n)
        .collect()
    )
    return {
        "total_rows": total,
        "top_keys": [{key: r[0], "rows": r[1], "share": r[1] / max(1, total)} for r in top],
    }
