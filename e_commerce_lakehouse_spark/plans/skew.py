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
