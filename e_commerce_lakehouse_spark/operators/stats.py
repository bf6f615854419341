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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "exact_linear_stats",
    "profile_columns",
    "referential_integrity_audit",
    "winsorized_mean",
    "quantile_transform",
    "robust_outliers",
    "gini_concentration",
    "welch_t_stats",
    "benford_audit",
]

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


def quantile_transform(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group quantile (rank) normalization: each value maps to its
    empirical quantile q = (rank − 1)/(n − 1) within its group under the
    (value, tiebreak) total order — the scale-free feature transform
    that makes scores comparable across groups with different
    distributions (cross-source quality calibration). Singleton groups
    map to 0.5 by convention (both engines, stated not NaN'd).

    Exact: the rank is an integer under a total order (ties broken by
    ``tiebreak_col``), so the single division per row is the only float
    op. One shuffle on the group key; the two windows share it.
    """
    from pyspark.sql import Window

    w_ord = Window.partitionBy("grp").orderBy("v_c", "tb")
    w_all = Window.partitionBy("grp")
    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
        F.col(tiebreak_col).alias("tb"),
    )
    ranked = base.select(
        "grp",
        "tb",
        "v_c",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return ranked.select(
        F.col("grp").alias(group_col),
        F.col("tb").alias(tiebreak_col),
        F.round(F.col("v_c") / 100.0, 6).alias(value_col),
        F.when(F.col("n") > 1,
               F.round((F.col("rn") - 1) / (F.col("n") - 1), 6))
        .otherwise(F.lit(0.5))
        .alias("qnorm"),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    k: int = 3,
) -> DataFrame:
    """Median/MAD robust outlier summary per group: median and MAD by
    EXACT nearest-rank (rank ceil(n/2) under the (value, tiebreak)
    order — the lower median), outliers = rows with |v − median| >
    k·MAD. All comparisons run in integer cents (k integer), so the
    flag is exact; only the reported medians divide. The
    mean/stddev-free outlier gate that fat tails can't corrupt
    (z-scores mask outliers exactly when outliers inflate the stddev).

    Output: (group, n, median, mad, n_outliers). MAD = 0 groups (over
    half the values identical) report n_outliers over the strict
    |v − med| > 0 rule — stated, not NaN'd. Two window passes, both on
    the same group-key shuffle.
    """
    from pyspark.sql import Window

    base = df.where(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
        F.col(tiebreak_col).alias("tb"),
    )
    w_ord = Window.partitionBy("grp").orderBy("v_c", "tb")
    w_all = Window.partitionBy("grp")
    med_rank = F.ceil(F.col("n") / 2)
    with_med = base.select(
        "grp",
        "v_c",
        "tb",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    ).select(
        "grp",
        "v_c",
        "tb",
        "n",
        F.max(F.when(F.col("rn") == med_rank, F.col("v_c")))
        .over(w_all)
        .alias("med"),
    )
    dev = with_med.select(
        "grp", "v_c", "n", "med", F.abs(F.col("v_c") - F.col("med")).alias("d"),
        "tb",
    )
    w_dev = Window.partitionBy("grp").orderBy("d", "tb")
    with_mad = dev.select(
        "grp",
        "v_c",
        "med",
        "d",
        F.row_number().over(w_dev).alias("dr"),
        F.col("n"),
    ).select(
        "grp",
        "v_c",
        "med",
        "d",
        F.max(F.when(F.col("dr") == med_rank, F.col("d")))
        .over(w_all)
        .alias("mad"),
    )
    return (
        with_mad.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("med").alias("_med"),
            F.min("mad").alias("_mad"),
            F.sum((F.col("d") > F.lit(k) * F.col("mad")).cast("long")).alias(
                "n_outliers"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            F.round(F.col("_med") / 100.0, 6).alias("median"),
            F.round(F.col("_mad") / 100.0, 6).alias("mad"),
            "n_outliers",
        )
    )


def gini_concentration(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group Gini coefficient over non-negative values by the exact
    rank formula  G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)  — revenue /
    token-budget concentration ("do 1% of customers carry 80% of
    spend?"). Every term is integer (cents × integer ranks summed as
    DECIMAL(38,0)); the single division happens once per group.
    Zero-sum groups report NULL (concentration undefined).

    One shuffle on the group key: the rank window and the aggregate
    share it; the rank-weighted sum is map-side combinable after the
    window.
    """
    from pyspark.sql import Window

    base = df.where(
        F.col(value_col).isNotNull() & (F.col(value_col) >= 0)
    ).select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
        F.col(tiebreak_col).alias("tb"),
    )
    w_ord = Window.partitionBy("grp").orderBy("v_c", "tb")
    ranked = base.select(
        "grp", "v_c", F.row_number().over(w_ord).alias("i")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    g = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(dec(F.col("v_c"))).alias("sx"),
        F.sum(dec(F.col("i")) * dec(F.col("v_c"))).alias("six"),
    )
    num = F.lit(2) * F.col("six") - (F.col("n") + 1) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return g.select(
        F.col("grp").alias(group_col),
        "n",
        F.when(
            F.col("sx") > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("gini"),
    )


def welch_t_stats(
    df: DataFrame,
    group_col: str,
    variant_col,
    value_int,
) -> DataFrame:
    """Two-sample Welch t statistic per group — the A/B experimentation
    readout. ``variant_col`` is a boolean Column (True = treatment);
    ``value_int`` an integer-valued Column (pre-scale at the call
    site). Moments per arm accumulate as DECIMAL(38,0) (conditional
    sums in ONE aggregate — no second scan, no join of arms), then
    t = (m̄_a − m̄_b) / sqrt(s²_a/n_a + s²_b/n_b) from fixed-shape
    closed forms on the exact operands (q115's recipe). Groups where
    either arm has n < 2 report NULL t.
    """
    v = value_int.cast("decimal(38,0)")
    a = variant_col
    df = df.where(value_int.isNotNull() & variant_col.isNotNull())
    m = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(a.cast("long")).cast("double").alias("na"),
        F.sum((~a).cast("long")).cast("double").alias("nb"),
        F.sum(F.when(a, v).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("sa"),
        F.sum(F.when(~a, v).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("sb"),
        F.sum(F.when(a, v * v).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("qa"),
        F.sum(F.when(~a, v * v).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("double")
        .alias("qb"),
    )
    na, nb = F.col("na"), F.col("nb")
    sa, sb, qa, qb = F.col("sa"), F.col("sb"), F.col("qa"), F.col("qb")
    # fixed expression shapes — keep in exact sync with the oracle SQL
    va = (qa - sa * sa / na) / (na - F.lit(1.0))
    vb = (qb - sb * sb / nb) / (nb - F.lit(1.0))
    t = (sa / na - sb / nb) / F.sqrt(va / na + vb / nb)
    return m.select(
        F.col("grp").alias(group_col),
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        # empty arms report NULL means (ANSI divide-by-zero guard — an
        # all-one-arm group is a real shape, e.g. NULL-typed events)
        F.when(na > 0, F.round(sa / na, 6)).alias("mean_a"),
        F.when(nb > 0, F.round(sb / nb, 6)).alias("mean_b"),
        F.when((na >= 2) & (nb >= 2), F.round(t, 6)).alias("welch_t"),
    )


def skew_profile(df: DataFrame, key_col: str, top_k: int = 5) -> DataFrame:
    """Join-key skew profiler — the pre-join diagnostic that decides
    between a plain shuffle join, broadcast, and salting (q36's
    machinery): exact per-key counts, distinct-key count, the heaviest
    key's share, and the skew factor max/mean (mean = rows/ndv; a
    factor ≫ 1 means one reducer owns the join). Top-k heavy keys are
    listed (stringified, count-desc, key-asc tiebreak) so the salt list
    can be generated directly from the output.

    One map-side-combinable aggregate on the key, then tiny rollups
    over the per-key table; NULL keys are profiled as the 'NULL' entry
    (they hash to one reducer too).
    """
    from pyspark.sql import Window

    per = df.groupBy(
        F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")).alias("k")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").desc(), F.col("k").asc())
    ranked = per.select("k", "c", F.row_number().over(w).alias("rn"))
    return ranked.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.round(
            F.max("c").cast("double")
            / (F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")),
            6,
        ).alias("skew_factor"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("rn") <= top_k, F.struct("rn", "k"))
                    )
                ),
                lambda s: s["k"],
            ),
            ",",
        ).alias("top_keys"),
    )


def privacy_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k_threshold: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit — the data-governance gate run
    before a table is shared: rows grouped by the quasi-identifier
    combination form equivalence classes; k-anonymity is the SMALLEST
    class (an attacker knowing the quasi-identifiers can narrow any
    individual to >= k rows), l-diversity the smallest number of
    DISTINCT sensitive values within a class (k alone fails when a
    class is homogeneous in the sensitive attribute). Also reported:
    the share of rows in classes below ``k_threshold`` — the
    re-identification-exposed fraction that a suppression pass would
    remove.

    Exact integer counts end-to-end (one groupBy on the quasi keys,
    then a 1-row rollup); the one division is the exposed-share. NULL
    quasi values form real classes (NULL is an attacker-visible value);
    NULL sensitive values count as one distinct value.
    """
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("cls_n"),
        F.countDistinct(*[F.coalesce(F.col(sensitive_col).cast("string"),
                                     F.lit("NULL"))]).alias("cls_l"),
    )
    return classes.agg(
        F.sum("cls_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("cls_n").cast("long").alias("k_anonymity"),
        F.min("cls_l").cast("long").alias("l_diversity"),
        F.max("cls_n").cast("long").alias("largest_class"),
        F.round(
            F.sum(
                F.when(F.col("cls_n") < k_threshold, F.col("cls_n")).otherwise(
                    F.lit(0)
                )
            ).cast("double")
            / F.sum("cls_n").cast("double"),
            6,
        ).alias("exposed_share"),
    )


def order_reconciliation(
    orders: DataFrame,
    lines: DataFrame,
    *,
    order_key: str = "o_orderkey",
    line_key: str = "l_orderkey",
    header_col: str = "o_totalprice",
    line_col: str = "l_extendedprice",
    tolerance_c: int = 0,
) -> DataFrame:
    """Header-vs-lines financial reconciliation — the warehouse audit
    the reference domain (orders + order_items ETL) needs nightly: per
    order, the header total against the sum of its lines in integer
    cents; report matched / drifted / lineless / headerless counts, the
    worst absolute drift, and total absolute drift. ``tolerance_c``
    cents of slack counts as matched (rounding-policy differences).

    Exact: all comparisons in integer cents (header and line sums never
    meet a float); one shuffle on the order key (line aggregate +
    full-outer join share it), then a 1-row rollup.
    """
    h = orders.where(F.col(order_key).isNotNull()).select(
        F.col(order_key).alias("k"),
        F.round(F.col(header_col) * 100).cast("long").alias("hdr_c"),
    )
    l = (
        lines.where(F.col(line_key).isNotNull())
        .groupBy(F.col(line_key).alias("k"))
        .agg(
            F.sum(F.round(F.col(line_col) * 100).cast("long").cast(
                "decimal(38,0)"
            ))
            .cast("long")
            .alias("lin_c")
        )
    )
    j = h.join(l, "k", "full_outer").select(
        "k",
        "hdr_c",
        "lin_c",
        F.abs(F.col("hdr_c") - F.col("lin_c")).alias("drift_c"),
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum((F.col("hdr_c").isNull()).cast("long")).alias("n_headerless"),
        F.sum((F.col("lin_c").isNull()).cast("long")).alias("n_lineless"),
        F.sum(
            (F.col("drift_c") <= tolerance_c).cast("long")
        ).alias("n_matched"),
        F.sum((F.col("drift_c") > tolerance_c).cast("long")).alias(
            "n_drifted"
        ),
        F.max("drift_c").cast("long").alias("max_drift_c"),
        F.sum(F.col("drift_c").cast("decimal(38,0)"))
        .cast("long")
        .alias("total_drift_c"),
    )


def duplicate_payments(
    orders: DataFrame,
    *,
    key_col: str = "o_custkey",
    amount_col: str = "o_totalprice",
    ts_col: str = "o_orderdate",
    id_col: str = "o_orderkey",
    window_days: int = 7,
) -> DataFrame:
    """Duplicate-payment candidates — the finance-audit double-charge
    sweep: pairs of orders by the SAME customer for the SAME amount
    (integer cents) within ``window_days``. The join key is (customer,
    amount_cents) — an equi-join, so the quadratic stage is bounded by
    per-(customer, amount) multiplicity, never customer×customer; the
    day window is a residual filter on the joined pair.

    Output: (key, amount, id_a, id_b, days_apart) with id_a < id_b —
    exact integers end-to-end (amount reported via one /100 division).
    """
    base = orders.where(
        F.col(key_col).isNotNull()
        & F.col(amount_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(id_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.round(F.col(amount_col) * 100).cast("long").alias("amt_c"),
        F.col(ts_col).cast("date").alias("d"),
        F.col(id_col).alias("oid"),
    )
    a = base.select("key", "amt_c", F.col("d").alias("da"), F.col("oid").alias("id_a"))
    b = base.select("key", "amt_c", F.col("d").alias("db"), F.col("oid").alias("id_b"))
    return (
        a.join(b, ["key", "amt_c"])
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.datediff(F.col("db"), F.col("da"))) <= window_days)
        )
        .select(
            "key",
            F.round(F.col("amt_c") / 100.0, 6).alias("amount"),
            "id_a",
            "id_b",
            F.abs(F.datediff(F.col("db"), F.col("da")))
            .cast("long")
            .alias("days_apart"),
        )
    )


def benford_audit(
    df: DataFrame,
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Benford first-digit audit of a money column: observed counts per
    leading digit vs the Benford expectation log10(1 + 1/d), with the
    digit's chi-square contribution — the standard forensic screen for
    fabricated or duplicated financial figures.

    The digit is extracted from EXACT integer cents (round(x*100) →
    BIGINT → first character of the decimal string), so engines can't
    disagree on float formatting. The only doubles are the expectation
    and the chi-square term, both fixed-shape expressions on exact
    integer operands, rounded 6 dp (libm ulp differences in log10
    cannot move a 6-dp value; q86 precedent).

    Scale shape: one map-side-combinable 9-group aggregate; the scalar
    total joins back by broadcast. No window, no second pass over data.
    """
    cents = F.round(F.col(amount_col) * 100).cast("long")
    base = df.where(F.col(amount_col).isNotNull() & (cents > 0)).select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = base.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    total = base.agg(F.count(F.lit(1)).cast("long").alias("_total"))
    expected_p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    return (
        obs.crossJoin(F.broadcast(total))  # 1-row scalar side
        .withColumn("_exp", F.col("_total").cast("double") * expected_p)
        .select(
            "digit",
            "n_obs",
            F.round(F.col("_exp"), 6).alias("expected_n"),
            F.round(
                (F.col("n_obs").cast("double") - F.col("_exp"))
                * (F.col("n_obs").cast("double") - F.col("_exp"))
                / F.col("_exp"),
                6,
            ).alias("chi2_term"),
        )
    )


# Poisson(1) CDF thresholds for the deterministic bootstrap: weight k
# is chosen when the row's md5-uniform lands in [cdf[k-1], cdf[k]).
# Embedded as literals on BOTH engine sides (oracles.py interpolates
# the same Python floats), so the resample weights are identical
# everywhere. Truncated at w=6 (residual mass ~6e-4 — a property of
# the estimator's definition here, not an approximation drift).
POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)
_U52 = 4503599627370496.0  # 2^52


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    n_resamples: int = 200,
    seed: int = 42,
    alpha: float = 0.05,
) -> DataFrame:
    """Deterministic Poisson bootstrap CI for the mean of a money
    column — ONE row: (n, n_resamples, mean, ci_lo, ci_hi).

    The classic multinomial bootstrap needs coordinated sampling; the
    Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", Google 2012) replaces it with an iid
    Poisson(1) weight per (resample, row) — embarrassingly parallel,
    the standard bootstrap at web scale. Here the weight is DERIVED,
    not sampled: an md5-uniform of (seed, resample, row id) inverted
    through the Poisson(1) CDF, so every engine computes the identical
    resample and the CI is value-hash reproducible.

    Exactness: values enter as integer cents; per-resample sums are
    DECIMAL(38,0); each resample mean is one fixed-shape double
    division; the CI bounds are nearest-rank order statistics of those
    means (no interpolation). Rounding to 6 dp happens only on output.

    Scale shape: the (row x resample) expansion is |df| x B with B
    bounded (default 200) and map-side partial aggregation — one
    shuffle keyed on the resample index, B groups. The rank selection
    runs over B rows only (explicitly tiny window). The input takes the
    small-input parallelism guard: the |df| x B md5 expansion happens
    BEFORE the first shuffle, so a single-file scan would run all of it
    on one core (measured 34 s -> 3 s on sf0.1 orders by widening
    1 -> 32 partitions; a no-op on multi-split inputs at scale).
    """
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if n_resamples < 2:
        raise ValueError(f"n_resamples must be >= 2, got {n_resamples}")
    from ..plans.parallelism import ensure_min_parallelism

    spark = df.sparkSession
    base = ensure_min_parallelism(
        df.where(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
    ).select(
        F.col(id_col).cast("string").alias("id"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
    )
    bs = spark.range(n_resamples).select(F.col("id").alias("b"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(str(seed)), F.col("b").cast("string"), F.col("id")
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(_U52)
    )
    w = F.when(u < POISSON1_CDF[0], 0)
    for k in range(1, len(POISSON1_CDF)):
        w = w.when(u < POISSON1_CDF[k], k)
    w = w.otherwise(len(POISSON1_CDF))
    per_b = (
        base.crossJoin(F.broadcast(bs))  # bounded B side, broadcast
        .withColumn("w", w)
        .groupBy("b")
        .agg(
            F.sum("w").cast("long").alias("nw"),
            F.sum(F.col("w").cast(_DEC) * F.col("v_c").cast(_DEC)).alias("sv"),
        )
        .where(F.col("nw") > 0)
        .select(
            "b",
            (F.col("sv").cast("double") / (F.col("nw").cast("double") * F.lit(100.0)))
            .alias("mean_b"),
        )
    )
    # rank selection over B rows only — the single-partition window is
    # over the bounded resample count, never the data
    wm = Window.orderBy("mean_b", "b")
    nb_df = per_b.agg(F.count(F.lit(1)).cast("long").alias("nb"))
    ranked = (
        per_b.withColumn("rk", F.row_number().over(wm))
        .crossJoin(F.broadcast(nb_df))
    )
    lo = ranked.where(
        F.col("rk")
        == F.greatest(F.lit(1).cast("long"),
                      F.ceil(F.lit(alpha / 2.0) * F.col("nb")))
    ).select(F.col("mean_b").alias("ci_lo"))
    hi = ranked.where(
        F.col("rk")
        == F.greatest(F.lit(1).cast("long"),
                      F.ceil(F.lit(1.0 - alpha / 2.0) * F.col("nb")))
    ).select(F.col("mean_b").alias("ci_hi"))
    point = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v_c").cast(_DEC)).alias("_sv"),
    )
    return (
        point.crossJoin(F.broadcast(nb_df))
        .crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .select(
            "n",
            F.col("nb").alias("n_resamples"),
            F.round(
                F.col("_sv").cast("double") / (F.col("n").cast("double") * F.lit(100.0)),
                6,
            ).alias("mean"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
        )
    )


def target_encode_loo(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    id_col: str,
    scale: int = 100,
) -> DataFrame:
    """Leave-one-out target encoding — the leakage-safe categorical
    feature every tabular-ML pipeline derives: for each row, the mean
    of ``value_col`` over the OTHER rows of the same category
    ((sum_g - v_i) / (n_g - 1)); singleton categories encode NULL
    rather than leaking their own target.

    Exactness: values are scaled to integers (``scale``=100 = cents),
    the group sum is one window aggregate (no second scan, no join),
    and the quotient is an integer DIV at micro precision before the
    single 6-dp double division (the q179 contract) — no double
    accumulation anywhere.

    Scale: ONE hash shuffle on the category key; state per task is one
    category's rows (a whole-corpus category is a skew concern — salt
    upstream if one key approaches corpus size).
    """
    v = F.round(F.col(value_col).cast("double") * scale, 0).cast("long")
    w = Window.partitionBy("_k")
    t = df.select(
        F.col(id_col).alias("_id"),
        F.col(key_col).alias("_k"),
        v.alias("_v"),
    ).where(F.col("_k").isNotNull() & F.col("_v").isNotNull())
    enc = (
        t.withColumn("_sum", F.sum("_v").over(w))
        .withColumn("_n", F.count(F.lit(1)).over(w))
        .select(
            F.col("_id").alias(id_col),
            F.col("_k").alias(key_col),
            F.when(
                F.col("_n") > 1,
                F.round(
                    F.expr(
                        f"((_sum - _v) * 1000000) DIV ((_n - 1) * {int(scale)})"
                    ).cast("double")
                    / F.lit(1_000_000.0),
                    6,
                ),
            ).alias("loo_enc"),
        )
    )
    return enc


def equidepth_drift(
    df: DataFrame,
    *,
    value_col: str,
    ts_col: str,
    id_col: str,
    n_buckets: int = 10,
    scale: int = 100,
) -> DataFrame:
    """Distribution-drift audit without a single transcendental: split
    the rows at the exact median timestamp into a reference half and a
    current half, derive equi-depth bucket boundaries from the
    REFERENCE half (exact nearest-rank quantiles, id tiebreak), then
    compare per-bucket population shares between the halves in exact
    ppm. The PSI-style drift readout with none of PSI's ln() —
    share_ref_ppm / share_cur_ppm / abs_diff_ppm are all integers, so
    the result is cross-engine value-hash stable.

    Both nearest-rank passes go through curation.exact_quantiles
    (distributed rank — range shuffle + Arrow partition-local cumsum,
    NO single-partition global sort); driver traffic is the median
    scalar plus n_buckets-1 boundary scalars, then buckets are a
    literal comparison chain folded into the final bounded-key
    aggregate. Integral id column required (the rank tiebreak).
    """
    from .curation import exact_quantiles

    if n_buckets < 2:
        raise ValueError("equidepth_drift needs n_buckets >= 2")
    v = F.round(F.col(value_col).cast("double") * scale, 0).cast("long")
    t = df.select(
        F.col(id_col).cast("long").alias("_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t"),
        v.alias("_v"),
    ).where(
        F.col("_t").isNotNull() & F.col("_v").isNotNull()
        & F.col("_id").isNotNull()
    )
    t = t.persist()
    if t.count() < 2:
        t.unpersist()
        raise ValueError("equidepth_drift needs at least 2 rows")
    med_t = exact_quantiles(
        t, value_col="_t", id_col="_id", qs=(0.5,)
    ).collect()[0]["value"]
    ref = t.where(F.col("_t") <= med_t)
    qs = tuple(i / n_buckets for i in range(1, n_buckets))
    bounds = [
        r["value"]
        for r in exact_quantiles(
            ref, value_col="_v", id_col="_id", qs=qs
        ).collect()
    ]
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col("_v") > F.lit(int(b))).cast("int")
    g = (
        t.select(
            bucket.alias("bucket"),
            (F.col("_t") <= med_t).cast("int").alias("_is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("_is_ref").cast("long").alias("n_ref"),
            F.sum(1 - F.col("_is_ref")).cast("long").alias("n_cur"),
        )
    )
    tot = g.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    out = g.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        F.expr("(n_ref * 1000000) DIV _tr").cast("long")
        .alias("share_ref_ppm"),
        F.expr(
            "CASE WHEN _tc > 0 THEN (n_cur * 1000000) DIV _tc ELSE 0 END"
        ).cast("long").alias("share_cur_ppm"),
        F.abs(
            F.expr("(n_ref * 1000000) DIV _tr")
            - F.expr(
                "CASE WHEN _tc > 0 THEN (n_cur * 1000000) DIV _tc ELSE 0 END"
            )
        ).cast("long").alias("abs_diff_ppm"),
    )
    try:
        return out.localCheckpoint(eager=True)
    finally:
        t.unpersist()
