"""FIFO lot matching — cumulative-interval overlap, no iteration.

The classic warehouse/costing problem: supply arrives in ordered lots,
demand consumes in FIFO order, and accounting needs the exact
(lot, demand-line, quantity) decomposition (FIFO COGS layers, ATP
consumption, queue-draining ledgers). The naive formulation is a
sequential scan per key; the scale formulation is the cumulative-
interval trick, which is fully declarative:

- each supply lot occupies the half-open interval
  [cumsum_before, cumsum_before + qty) on its key's supply axis;
- each demand line occupies the same kind of interval on the demand
  axis;
- FIFO matches lot L to line D for exactly
  ``max(0, min(hi_L, hi_D) - max(lo_L, lo_D))`` units — interval
  overlap. No loop, no state: two window cumsums and one equi-join.

All integer arithmetic (quantities enter as BIGINT), so any engine
reproduces it bit-for-bit.

Scale shape: one hash shuffle per side on the key for the exclusive
running sums, then an equi-join on the SAME key (AQE reuses the
partitioning). Pair fan-out per key is |lots_k| x |lines_k| ONLY in the
worst case of total mutual overlap; real FIFO overlap is near-linear
(each line touches 1-2 lots) and the filter runs join-side. Lots per
key are bounded in practice (receipts), never web-scale per key.

Reference analog: none — the reference's ETL has no allocation logic;
this extends the allocate.py family (largest-remainder proration,
greedy budgets) with the order-preserving matching variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["fifo_match", "fifo_lot_summary"]


def _with_interval(
    df: DataFrame, key: str, qty: str, order_cols: list[str], lo: str, hi: str
) -> DataFrame:
    w = (
        Window.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    q = F.col(qty).cast("long")
    return (
        df.where(F.col(key).isNotNull() & q.isNotNull() & (q > 0))
        .withColumn(lo, F.coalesce(F.sum(q).over(w), F.lit(0).cast("long")))
        .withColumn(hi, F.col(lo) + q)
    )


def fifo_match(
    demand: DataFrame,
    supply: DataFrame,
    *,
    key_col: str = "key",
    demand_qty_col: str = "qty",
    demand_order_cols: list[str] | None = None,
    demand_id_col: str = "line_id",
    supply_qty_col: str = "lot_qty",
    supply_order_cols: list[str] | None = None,
    supply_id_col: str = "lot_id",
) -> DataFrame:
    """Exact FIFO decomposition: one row per (key, lot, line) pair with
    ``matched_qty`` > 0.

    ``demand_order_cols`` / ``supply_order_cols`` must be a
    deterministic total order within each key (include the id column
    as the final tiebreak). Output columns: key, lot id, line id,
    matched_qty (BIGINT).
    """
    def _prep(df, qty_col, id_col, order_cols):
        """Normalize to (_k, _q, _id, _o*) and return the order names —
        id always the final tiebreak."""
        order_cols = order_cols or [id_col]
        sel = [
            F.col(key_col).alias("_k"),
            F.col(qty_col).alias("_q"),
            F.col(id_col).alias("_id"),
        ]
        onames = []
        for i, c in enumerate(order_cols):
            if c == id_col:
                onames.append("_id")
            else:
                sel.append(F.col(c).alias(f"_o{i}"))
                onames.append(f"_o{i}")
        if "_id" not in onames:
            onames.append("_id")
        return df.select(*sel), onames

    dp, d_order = _prep(demand, demand_qty_col, demand_id_col, demand_order_cols)
    d = _with_interval(dp, "_k", "_q", d_order, "_dlo", "_dhi").select(
        "_k", F.col("_id").alias("_did"), "_dlo", "_dhi"
    )
    sp, s_order = _prep(supply, supply_qty_col, supply_id_col, supply_order_cols)
    s = _with_interval(sp, "_k", "_q", s_order, "_slo", "_shi").select(
        "_k", F.col("_id").alias("_sid"), "_slo", "_shi"
    )
    overlap = F.least("_dhi", "_shi") - F.greatest("_dlo", "_slo")
    return (
        d.join(s, "_k")
        .where(overlap > 0)
        .select(
            F.col("_k").alias(key_col),
            F.col("_sid").alias(supply_id_col),
            F.col("_did").alias(demand_id_col),
            overlap.cast("long").alias("matched_qty"),
        )
    )


def fifo_lot_summary(matches: DataFrame, lots: DataFrame, *,
                     key_col: str = "key", lot_id_col: str = "lot_id",
                     lot_qty_col: str = "lot_qty") -> DataFrame:
    """Per-lot consumption report from a ``fifo_match`` output: lines
    served, units consumed, leftover, exhausted flag. Lots that matched
    nothing still appear (left join) with zero consumption."""
    agg = matches.groupBy(key_col, lot_id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum("matched_qty").cast("long").alias("consumed_qty"),
    )
    base = lots.select(
        key_col, lot_id_col, F.col(lot_qty_col).cast("long").alias("lot_qty")
    )
    return (
        base.join(agg, [key_col, lot_id_col], "left")
        .select(
            key_col,
            lot_id_col,
            "lot_qty",
            F.coalesce("n_lines", F.lit(0).cast("long")).alias("n_lines"),
            F.coalesce("consumed_qty", F.lit(0).cast("long")).alias("consumed_qty"),
            (F.col("lot_qty") - F.coalesce("consumed_qty", F.lit(0).cast("long")))
            .alias("leftover_qty"),
            (F.coalesce("consumed_qty", F.lit(0).cast("long")) == F.col("lot_qty"))
            .alias("exhausted"),
        )
    )
