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


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Deequ-style column profile: one row per column with exact
    null count, exact distinct count, completeness, and type-bucketed
    min/max (numeric → double, string → varchar, timestamp/date →
    timestamp) — the data-quality summary a lakehouse ingest gate
    records next to ANALYZE's per-table stats.

    Scale shape: ONE aggregate over the input computes every counter
    (the multi-COUNT(DISTINCT) expands via Spark's Expand operator —
    one scan, map-side partial aggregation per distinct key); the
    per-column reshape explodes the single 1-row aggregate, so the
    pivot costs nothing. No collect, no per-column re-scan.
    """
    from pyspark.sql.types import (
        DateType,
        NumericType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"nn_{f.name}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{f.name}"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).cast("double").alias(f"mn_{f.name}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{f.name}"))
        elif isinstance(f.dataType, StringType):
            aggs.append(F.min(c).alias(f"mn_{f.name}"))
            aggs.append(F.max(c).alias(f"mx_{f.name}"))
        elif isinstance(f.dataType, (TimestampType, TimestampNTZType, DateType)):
            aggs.append(F.min(c).cast("timestamp").alias(f"mn_{f.name}"))
            aggs.append(F.max(c).cast("timestamp").alias(f"mx_{f.name}"))
    one = df.agg(*aggs)

    def _typed(f, which):
        from pyspark.sql.types import (
            DateType as _D,
            NumericType as _N,
            StringType as _S,
            TimestampNTZType as _TN,
            TimestampType as _T,
        )

        num = F.lit(None).cast("double")
        s = F.lit(None).cast("string")
        ts = F.lit(None).cast("timestamp")
        col = F.col(f"{which}_{f.name}")
        if isinstance(f.dataType, _N):
            num = col
        elif isinstance(f.dataType, _S):
            s = col
        elif isinstance(f.dataType, (_T, _TN, _D)):
            ts = col
        return (
            num.alias(f"{which}_num"),
            s.alias(f"{which}_str"),
            ts.alias(f"{which}_ts"),
        )

    structs = [
        F.struct(
            F.lit(f.name).alias("col_name"),
            F.col("_n").alias("n_rows"),
            F.col(f"nn_{f.name}").alias("n_nulls"),
            F.col(f"nd_{f.name}").alias("n_distinct"),
            F.round(
                F.lit(1.0) - F.col(f"nn_{f.name}") / F.col("_n"), 6
            ).alias("completeness"),
            *_typed(f, "mn"),
            *_typed(f, "mx"),
        )
        for f in fields
    ]
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def referential_integrity_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Foreign-key orphan audit across table pairs: for each
    ``(name, child_df, fk_col, parent_df, pk_col)`` report the child
    row count, NULL-FK count (not orphans — SQL FK semantics), orphan
    count (non-NULL FK with no parent), and the orphan rate. The
    referential-integrity leg of the data-quality family next to CHECK
    constraints (`operators/constraints.py`) and `profile_columns`.

    Scale shape: per relation, one anti-join on the key (the parent
    side collapses to DISTINCT keys first — broadcastable for dims) and
    one pass of counters; relations are unioned as 1-row aggregates.
    """
    parts = []
    for name, child, fk, parent, pk in relations:
        keys = parent.select(F.col(pk).alias(fk)).distinct()
        counters = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.sum(F.col(fk).isNull().cast("long")).alias("n_null_fk"),
        )
        orphans = (
            child.where(F.col(fk).isNotNull())
            .join(keys, fk, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        parts.append(
            counters.crossJoin(orphans).select(
                F.lit(name).alias("relation"),
                "n_child",
                "n_null_fk",
                "n_orphans",
                F.round(F.col("n_orphans") / F.col("n_child"), 6).alias(
                    "orphan_rate"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def winsorized_mean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    lo: float = 0.1,
    hi: float = 0.9,
) -> DataFrame:
    """Per-group winsorized (clamped) robust mean: values below the
    lo-quantile are replaced by it, above the hi-quantile by it, then
    averaged — the outlier-robust location estimate reporting pipelines
    use when a handful of fat-finger rows would swamp a plain mean.

    EXACT everywhere: quantiles are nearest-rank (k = ceil(q·n) over a
    (value, tiebreak) total order — the q110 definition), values run as
    integer cents, the clamped sum accumulates as DECIMAL(38,0), and the
    single final division is one IEEE op. No percentile_approx, no float
    summation order.

    One shuffle on the group key; both windows and the final aggregate
    share the partitioning.
    """
    from pyspark.sql import Window

    if not (0.0 < lo <= hi <= 1.0):
        # lo=0 would look up rank ceil(0)=0, which no row has — the clamp
        # would silently go NULL; refuse loudly instead
        raise ValueError(f"need 0 < lo <= hi <= 1, got lo={lo} hi={hi}")
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
        F.col(tiebreak_col).alias("tb"),
    )
    w_ord = Window.partitionBy("grp").orderBy("v_c", "tb")
    w_all = Window.partitionBy("grp")
    ranked = base.select(
        "grp",
        "v_c",
        F.row_number().over(w_ord).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    k_lo = F.ceil(F.lit(lo) * F.col("n"))
    k_hi = F.ceil(F.lit(hi) * F.col("n"))
    marked = ranked.select(
        "grp",
        "v_c",
        "n",
        F.max(F.when(F.col("rn") == k_lo, F.col("v_c"))).over(w_all).alias("v_lo"),
        F.max(F.when(F.col("rn") == k_hi, F.col("v_c"))).over(w_all).alias("v_hi"),
    )
    clamped = F.greatest(F.least(F.col("v_c"), F.col("v_hi")), F.col("v_lo"))
    return (
        marked.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("v_lo").alias("_lo"),
            F.min("v_hi").alias("_hi"),
            F.sum(clamped.cast("decimal(38,0)")).alias("_s"),
            F.sum(F.col("v_c").cast("decimal(38,0)")).alias("_sr"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.round(F.col("_lo") / 100.0, 6).alias("p_lo"),
            F.round(F.col("_hi") / 100.0, 6).alias("p_hi"),
            F.round(
                F.col("_s").cast("double") / F.col("n") / 100.0, 6
            ).alias("winsorized_mean"),
            F.round(
                F.col("_sr").cast("double") / F.col("n") / 100.0, 6
            ).alias("raw_mean"),
        )
    )
