"""Cross-engine-exact statistical profiling aggregates.

``corr`` / ``covar_samp`` / ``regr_slope`` computed naively as floating
aggregates are NOT reproducible across engines (or even across runs on
a cluster): double summation is order-dependent, and Spark's partial
aggregation order is nondeterministic, so a value-hash oracle would
flicker. This module computes the same statistics from EXACT integer
moments instead:

- inputs are rescaled to integers (quantities are integral; currency
  has two decimals -> cents), asserted cheap at plan time by contract;
- the five moments Σx, Σy, Σx², Σy², Σxy are summed as DECIMAL(38,0)
  — exact, overflow-free to ~1e38, order-independent, and identical in
  any engine;
- the closed forms then run in a FIXED, explicitly-parenthesised double
  expression tree, so IEEE-754 gives bit-identical results everywhere.

This is also the 100 TB-correct shape: one map-side-combinable
aggregate per group, no second pass, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_linear_stats"]

_DEC = "decimal(38,0)"


def exact_linear_stats(
    df: DataFrame, group_col: str, x_int, y_int
) -> DataFrame:
    """Per-group n / mean_x / mean_y / covar_samp / corr / regr_slope
    from exact integer moments.

    ``x_int`` / ``y_int`` are integer-valued Columns (pre-scale currency
    to cents etc. at the call site; results are in those scaled units).
    Only PAIRWISE-COMPLETE rows count (standard SQL corr/covar
    semantics): a row with a NULL on either side is excluded from n and
    every moment, so the moments can never disagree with the count.
    Outputs are rounded to 6 dp AFTER the fixed-shape closed forms —
    the rounding is cosmetic, the determinism comes from the exact
    moments.
    """
    x = x_int.cast(_DEC)
    y = y_int.cast(_DEC)
    df = df.where(x_int.isNotNull() & y_int.isNotNull())
    m = df.groupBy(group_col).agg(
        F.count("*").cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # Fixed expression shapes — keep these in exact sync with the
    # oracle SQL so both engines execute the identical IEEE op sequence.
    cov = (sxy - sx * sy / n) / (n - F.lit(1.0))
    var_x = (sxx - sx * sx / n) / (n - F.lit(1.0))
    var_y = (syy - sy * sy / n) / (n - F.lit(1.0))
    corr = cov / F.sqrt(var_x * var_y)
    slope = cov / var_x
    return m.select(
        F.col(group_col),
        n.cast("long").alias("n"),
        F.round(sx / n, 6).alias("mean_x"),
        F.round(sy / n, 6).alias("mean_y"),
        F.round(cov, 6).alias("covar_xy"),
        F.round(corr, 6).alias("corr_xy"),
        F.round(slope, 6).alias("slope_yx"),
    )
