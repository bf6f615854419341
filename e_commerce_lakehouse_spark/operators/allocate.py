"""Exact proportional allocation (largest-remainder proration).

Finance/settlement warehouses constantly need to split an order-level
amount across its lines so the integer-cent parts sum back EXACTLY to
the header amount — naive ``round(total * share)`` drifts by ±1 cent
per line and reconciliation breaks. The reference pipeline carries both
the header total (`orders.total_amount`,
`/root/reference/src/glue_jobs/orders_etl.py`) and line amounts
(`order_items_etl.py`) but never reconciles them; this operator is that
missing reconciliation step, built so every arithmetic step is exact
integer math and therefore bit-identical across engines:

- amounts enter as ``round(x * 100)`` → BIGINT cents (one double
  rounding, deterministic);
- the base share is integer floor division ``(total_c * price_c) div
  S`` (products bounded: 1e8-cent totals × 1e8-cent lines = 1e16 <
  int64 max);
- the leftover ``total_c - Σ base`` is < n_lines by construction
  (sum of floors vs exact sum), and is handed out one cent at a time to
  the largest integer remainders, ties broken on the line number —
  fully deterministic, no doubles anywhere after the initial cent cast.

Scale shape: everything is windowed over ``PARTITION BY order`` — ONE
hash shuffle on the order key; the two windows (sum + rank) share the
exchange and sort. No driver state, no collect, no join back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prorate_largest_remainder(
    lines: DataFrame,
    *,
    key_col: str = "l_orderkey",
    weight_col: str = "l_extendedprice",
    total_col: str = "total_c",
    tiebreak_col: str = "l_linenumber",
) -> DataFrame:
    """Allocate ``total_col`` (BIGINT cents, constant per key) across
    each key's lines proportional to ``weight_col`` so the allocations
    sum exactly to the total.

    ``lines`` must already carry the per-key total in ``total_col``
    (e.g. joined from the orders header). Output: one row per line —
    (key, tiebreak, weight_c BIGINT, alloc_c BIGINT). Keys whose weight
    sum is 0 are excluded (nothing to prorate against); negative
    weights and NULL/negative totals are rejected rows (integer div/mod
    semantics for negatives differ across engines, and a negative
    settlement amount is a refund header — out of scope). The remainder
    rank tiebreaks on (line, weight) so duplicate line numbers stay
    deterministic.
    """
    w_c = F.round(F.col(weight_col) * 100).cast("long")
    df = lines.select(
        F.col(key_col).alias("key"),
        F.col(tiebreak_col).alias("line"),
        w_c.alias("weight_c"),
        F.col(total_col).cast("long").alias("total_c"),
    ).where(
        F.col(key_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
        & w_c.isNotNull()
        & (w_c >= 0)
        & (F.col(total_col).cast("long") >= 0)
    )

    by_key = Window.partitionBy("key")
    df = df.withColumn("_s", F.sum("weight_c").over(by_key)).where(
        F.col("_s") > 0
    )

    prod = F.col("total_c") * F.col("weight_c")
    df = df.withColumn("_base", F.expr("(total_c * weight_c) div _s")).withColumn(
        "_rem", prod % F.col("_s")
    )

    # leftover cents per key = total - Σ floor  (0 <= leftover < n)
    df = df.withColumn("_leftover", F.col("total_c") - F.sum("_base").over(by_key))

    rank_w = Window.partitionBy("key").orderBy(
        F.col("_rem").desc(), F.col("line").asc(), F.col("weight_c").desc()
    )
    df = df.withColumn("_rk", F.row_number().over(rank_w))

    return df.select(
        F.col("key").alias(key_col),
        F.col("line").alias(tiebreak_col),
        F.col("weight_c"),
        (
            F.col("_base")
            + F.when(F.col("_rk") <= F.col("_leftover"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).cast("long").alias("alloc_c"),
    )


def greedy_allocation(
    demand: DataFrame,
    budgets: DataFrame,
    *,
    key_col: str = "key",
    qty_col: str = "qty",
    order_col: str = "prio",
    tiebreak_col: str = "line_id",
    budget_col: str = "budget",
) -> DataFrame:
    """First-come-first-served supply allocation: each key's integer
    ``budget`` is handed out to its demand lines in ``(order_col,
    tiebreak_col)`` order; a line receives ``clamp(budget - demand
    already granted, 0, qty)``.

    This is the classic inventory/quota waterfall (ATP allocation,
    rate-limit ledgers, GPU-hour quotas): a running sum per key decides
    how much of the budget is left when each line arrives. All integer
    arithmetic — exact on any engine.

    Scale shape: ONE hash shuffle on ``key_col``; the exclusive running
    sum is a window inside that partitioning (state per task = one
    key's lines, never global). Budgets join on the same key — map-side
    after AQE notices the shared partitioning, broadcast when the
    budget dim is small.

    Output per key: n_lines, total demand, budget, total filled,
    n_filled_full / n_partial / n_starved, fill_rate (6 dp).
    """
    w = (
        Window.partitionBy("_k")
        .orderBy(order_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = demand.select(
        F.col(key_col).alias("_k"),
        F.col(order_col).alias(order_col),
        F.col(tiebreak_col).alias(tiebreak_col),
        F.col(qty_col).cast("long").alias("_q"),
    ).where(F.col("_k").isNotNull() & F.col("_q").isNotNull())
    b = budgets.select(
        F.col(key_col).alias("_k"), F.col(budget_col).cast("long").alias("_b")
    )
    granted_before = F.coalesce(F.sum("_q").over(w), F.lit(0).cast("long"))
    lines = (
        d.withColumn("_before", granted_before)
        .join(b, "_k")
        .withColumn(
            "_fill",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("_q"), F.col("_b") - F.col("_before")),
            ),
        )
    )
    return (
        lines.groupBy("_k", "_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("_q").cast("long").alias("demand_qty"),
            F.sum("_fill").cast("long").alias("filled_qty"),
            F.sum((F.col("_fill") == F.col("_q")).cast("int")).cast("long").alias("n_filled_full"),
            F.sum(
                ((F.col("_fill") > 0) & (F.col("_fill") < F.col("_q"))).cast("int")
            ).cast("long").alias("n_partial"),
            F.sum((F.col("_fill") == 0).cast("int")).cast("long").alias("n_starved"),
        )
        .select(
            F.col("_k").alias(key_col),
            F.col("_b").alias(budget_col),
            "n_lines",
            "demand_qty",
            "filled_qty",
            "n_filled_full",
            "n_partial",
            "n_starved",
            F.round(
                F.col("filled_qty").cast("double") / F.col("demand_qty").cast("double"),
                6,
            ).alias("fill_rate"),
        )
    )
