"""Bucketized interval (range) join — the scale-safe theta-join idiom.

``point BETWEEN start AND end`` expressed naively is a cross join with
a filter (BroadcastNestedLoopJoin when one side is small, a cartesian
otherwise) — O(|points| x |intervals|) comparisons, the plan that dies
first at 100 TB. The bin join makes it an EQUI join Catalyst can
shuffle- or broadcast-hash: pick a bucket width w, explode each
interval into the buckets it covers (``sequence(floor(start/w),
floor(end/w))``), tag each point with its single bucket, equi-join on
the bucket, then apply the exact range predicate. A point belongs to
exactly one bucket, so every qualifying (interval, point) pair is
produced EXACTLY once — no post-join dedup.

Cost model: shuffle volume is |points| + sum(interval_len/w + 1); per
bucket the exact filter touches only co-bucketed pairs. Pick w near the
median interval length: w too small explodes long intervals into many
bucket rows, w too large degrades toward the cartesian within each
bucket. Skewed (very long) intervals cost (len/w + 1) rows — bounded
and visible, unlike a nested-loop plan. This is the same shape
Databricks' range-join bin optimization and the as-of union idiom
(queries.q28) use.

Columns must be NUMERIC (int/long/double); callers join on dates by
converting to epoch days first (F.datediff vs a literal epoch).
Reference has no analog (its only join is equi MERGE matching).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__rj_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them
    (inclusive bounds). Output columns = points' ++ intervals'
    (names must not collide, like any Spark join)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(bucket_width)
    pb = points.withColumn(_B, F.floor(F.col(point_col) / w))
    ib = intervals.withColumn(
        _B,
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    return (
        pb.join(ib, _B)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop(_B)
    )
