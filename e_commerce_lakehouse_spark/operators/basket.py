"""Market-basket co-occurrence: frequent item-pair mining over order
lines.

The reference warehouse lands order_items fact rows
(`/root/reference/src/glue_jobs/order_items_etl.py`) and reports only
per-item aggregates; pair-level co-purchase ("customers who bought X
also bought Y") is the canonical next query every retail warehouse
adds. The naive plan is a quadratic self-join of the fact table with
itself — a scale-killer on a 100 TB lineitem. This operator keeps the
quadratic stage bounded the same way the dedup family does:

1. **Distinct first** — collapse to one (basket, item) row per pair so
   duplicate lines never multiply the join.
2. **Support-prune before the self-join** — items appearing in fewer
   than ``min_item_support`` baskets cannot participate in a pair with
   support ≥ ``min_pair_support`` when ``min_item_support >=
   min_pair_support``; they are dropped *before* the join, so the
   self-join fan-out is bounded by the frequent-item basket sizes only
   (the A-priori downward-closure argument).
3. **Equi-join on the basket key** — the pair generation is a plain
   shuffle hash join on ``basket_col`` with an ``item_a < item_b``
   predicate; never a cartesian. Both sides share one exchange.
4. **Lift from exact integer counts** — the pair/item/basket counts
   are int64; lift is a single double division of exact integers
   (deterministic IEEE), rounded to 6 dp so both engines hash alike.

At 100 TB the remaining risk is a pathological mega-basket (one order
with 10^5 items → 10^10 pairs); ``max_basket_items`` drops baskets
above the cap and reports them honestly via the ``oversize_baskets``
accessor pattern used elsewhere — here it simply filters, because a
basket that large is data corruption in a retail schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_pairs(
    lines: DataFrame,
    *,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_item_support: int = 2,
    min_pair_support: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Frequent co-purchased item pairs with exact support counts and
    lift.

    Output: (item_a, item_b, n_baskets BIGINT, support_a BIGINT,
    support_b BIGINT, lift DOUBLE) with ``item_a < item_b``, one row
    per surviving pair. ``lift = n_baskets * total_baskets /
    (support_a * support_b)`` rounded to 6 dp.
    """
    if min_item_support < min_pair_support:
        # the prune below is only sound when item support dominates
        min_item_support = min_pair_support

    pairs_src = lines.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
    basket_item = pairs_src.distinct()

    # Bound the quadratic stage: drop corrupt mega-baskets first, then
    # infrequent items (downward closure). Both are plain aggregates on
    # the keys the join will shuffle on anyway.
    sized = basket_item.groupBy("basket").agg(
        F.count(F.lit(1)).alias("_bsz")
    ).where(F.col("_bsz") <= max_basket_items)
    bounded = basket_item.join(sized.select("basket"), "basket")

    item_support = bounded.groupBy("item").agg(
        F.count(F.lit(1)).alias("support")
    ).where(F.col("support") >= min_item_support)
    frequent = bounded.join(item_support.select("item"), "item")

    # 1-row total, broadcast-crossed into the pair table (lazy, no
    # driver action — same shape as curation.py's domain-mix total)
    total = bounded.agg(
        F.countDistinct("basket").cast("double").alias("_total_baskets")
    )

    a = frequent.select(F.col("basket"), F.col("item").alias("item_a"))
    b = frequent.select(F.col("basket"), F.col("item").alias("item_b"))
    pair_counts = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .where(F.col("n_baskets") >= min_pair_support)
    )

    sup = item_support.select(
        F.col("item"), F.col("support").cast("long").alias("support")
    )
    out = (
        pair_counts.join(
            sup.select(F.col("item").alias("item_a"),
                       F.col("support").alias("support_a")),
            "item_a",
        )
        .join(
            sup.select(F.col("item").alias("item_b"),
                       F.col("support").alias("support_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            F.col("n_baskets").cast("long").alias("n_baskets"),
            "support_a",
            "support_b",
            F.round(
                (F.col("n_baskets").cast("double") * F.col("_total_baskets"))
                / (F.col("support_a").cast("double")
                   * F.col("support_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out


def pareto_abc(
    lines: DataFrame,
    *,
    group_col: str = "l_returnflag",
    item_col: str = "l_partkey",
    value_col: str = "l_extendedprice",
    a_pct: int = 80,
    b_pct: int = 95,
) -> DataFrame:
    """Pareto / ABC classification per group: items ranked by revenue
    descending; class A = items while the running cumulative (including
    the current item) stays within ``a_pct``% of the group total, B
    within ``b_pct``%, else C — the "do 20% of parts carry 80% of
    spend" inventory readout.

    Exact: revenue accumulates as integer cents; the class boundaries
    are pure integer comparisons (cum·100 ≤ total·pct — no float share
    anywhere until the reported rounding). Rank ties (equal revenue)
    break on the item id, so the running sum is engine-stable.

    Scale: one shuffle on (group, item) for per-item revenue, then
    windows partitioned by group over the AGGREGATED item table
    (bounded by catalog size, not line count).

    Output: (group, abc_class, n_items, revenue, share) — share of the
    group total, 6 dp.
    """
    from pyspark.sql import Window

    per_item = (
        lines.where(
            F.col(item_col).isNotNull() & F.col(value_col).isNotNull()
        )
        .groupBy(F.col(group_col).alias("grp"), F.col(item_col).alias("item"))
        .agg(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("rev_c")
        )
    )
    w_ord = Window.partitionBy("grp").orderBy(
        F.col("rev_c").desc(), F.col("item").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("grp")
    dec = F.col("rev_c").cast("decimal(38,0)")
    cum = per_item.select(
        "grp",
        "rev_c",
        F.sum(dec).over(w_ord).alias("cum_c"),
        F.sum(dec).over(w_all).alias("tot_c"),
    )
    cls = F.when(
        F.col("cum_c") * 100 <= F.col("tot_c") * F.lit(a_pct), "A"
    ).when(
        F.col("cum_c") * 100 <= F.col("tot_c") * F.lit(b_pct), "B"
    ).otherwise("C")
    return (
        cum.select("grp", "rev_c", "tot_c", cls.alias("abc_class"))
        .groupBy("grp", "abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.sum(F.col("rev_c").cast("decimal(38,0)")).alias("_rev"),
            F.min("tot_c").alias("_tot"),
        )
        .select(
            F.col("grp").alias(group_col),
            "abc_class",
            "n_items",
            F.round(F.col("_rev").cast("double") / 100.0, 6).alias("revenue"),
            F.round(
                F.col("_rev").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("share"),
        )
    )


def rfm_segments(
    df: DataFrame,
    *,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
    value_col: str = "o_totalprice",
    anchor: str | None = None,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation — the
    classic customer-base map. Per key: days since last activity,
    activity count, and total spend in integer cents; each dimension
    quartiled with exact ntile over a (metric, key) total order (the
    q43 ntile-parity contract), scores 1–4 with 4 best; segments
    reported as the (r, f, m) cell with size and average spend.

    ``anchor`` (date string) pins recency; default = the corpus max
    date (computed once, broadcast). One shuffle on the key for the
    profile; the ntile windows run over the per-key AGGREGATE (one row
    per key), not the raw orders. At billion-customer scale swap the
    global ntiles for exact quartile BOUNDARIES (q110's
    ``exact_quantiles``) joined back — same scores, no single-partition
    window.
    """
    from pyspark.sql import Window

    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).cast("date").alias("d"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
    )
    prof = base.groupBy("key").agg(
        F.max("d").alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.col("v_c").cast("decimal(38,0)")).alias("mon_c"),
    )
    if anchor is None:
        anch = base.agg(F.max("d").alias("anchor_d"))
        prof = prof.crossJoin(F.broadcast(anch))
    else:
        prof = prof.withColumn("anchor_d", F.to_date(F.lit(anchor)))
    prof = prof.withColumn(
        "recency_days", F.datediff(F.col("anchor_d"), F.col("last_d"))
    )
    w_r = Window.orderBy(F.col("recency_days").asc(), F.col("key").asc())
    w_f = Window.orderBy(F.col("freq").asc(), F.col("key").asc())
    w_m = Window.orderBy(F.col("mon_c").asc(), F.col("key").asc())
    scored = prof.select(
        "key",
        "mon_c",
        (F.lit(5) - F.ntile(4).over(w_r)).alias("r_score"),
        F.ntile(4).over(w_f).alias("f_score"),
        F.ntile(4).over(w_m).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("mon_c").alias("_m"),
        )
        .select(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
            "n_customers",
            F.round(
                F.col("_m").cast("double")
                / F.col("n_customers").cast("double")
                / 100.0,
                6,
            ).alias("avg_monetary"),
        )
    )


def frequent_triples(
    lines: DataFrame,
    *,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_item_support: int = 2,
    min_pair_support: int = 2,
    min_triple_support: int = 2,
    max_basket_items: int = 1000,
) -> DataFrame:
    """Level-3 A-priori: frequent item TRIPLES (a < b < c) with exact
    basket support. Downward closure prunes twice before the 3-way
    stage — items below ``min_item_support`` leave first, then the
    basket-item table is semi-joined to the FREQUENT PAIR list on BOTH
    (a,b) and (a,c) edges, so the triple join only extends wedges whose
    legs are already frequent (the classic candidate-generation bound;
    never |basket|³).

    Output: (item_a, item_b, item_c, n_baskets) — exact counts, no
    floats anywhere.
    """
    if min_pair_support > min_triple_support:
        # closure is only lossless when every leg of a qualifying triple
        # is itself a frequent pair
        min_pair_support = min_triple_support
    # EAGER checkpoint: the pair table is referenced four times below
    # (both closure legs + the frequent-item union); without the cut the
    # whole copurchase self-join pipeline inlines into the triple plan
    # four times — measured 8.7 s of driver-side analysis against 7.0 s
    # of actual job wall, and concurrent AQE stage jobs can race the
    # cold upstream (the signature-table finding). Bounded: the frequent
    # pair list is support-pruned, far smaller than the basket table.
    pairs = copurchase_pairs(
        lines,
        basket_col=basket_col,
        item_col=item_col,
        min_item_support=min_item_support,
        min_pair_support=min_pair_support,
        max_basket_items=max_basket_items,
    ).select(
        F.col("item_a").alias("pa"), F.col("item_b").alias("pb")
    ).localCheckpoint(eager=True)
    bi = (
        lines.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .where(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    # same mega-basket cap as the pair stage, so pair and triple counts
    # describe the same basket universe
    sized = (
        bi.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .where(F.col("_bsz") <= max_basket_items)
        .select("basket")
    )
    bi = bi.join(sized, "basket")
    # keep only items that appear in some frequent pair (closure)
    freq_items = (
        pairs.select(F.col("pa").alias("item"))
        .unionByName(pairs.select(F.col("pb").alias("item")))
        .distinct()
    )
    # same cut for the pruned basket-item table: it is the probe side of
    # all three triple-join legs
    b = bi.join(freq_items, "item").localCheckpoint(eager=True)
    t = (
        b.select("basket", F.col("item").alias("a"))
        .join(b.select("basket", F.col("item").alias("b")), "basket")
        .where(F.col("a") < F.col("b"))
        # (a,b) must be a frequent pair before extending
        .join(
            pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b")),
            ["a", "b"],
        )
        .join(b.select("basket", F.col("item").alias("c")), "basket")
        .where(F.col("b") < F.col("c"))
        # (a,c) frequent too (the (b,c) leg is checked by the final
        # support floor; pruning two of three legs is the standard
        # candidate bound)
        .join(
            pairs.select(F.col("pa").alias("a"), F.col("pb").alias("c")),
            ["a", "c"],
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
        .where(F.col("n_baskets") >= min_triple_support)
    )
    return t.select(
        F.col("a").alias("item_a"),
        F.col("b").alias("item_b"),
        F.col("c").alias("item_c"),
        "n_baskets",
    )


def association_rules(
    lines: DataFrame,
    *,
    min_confidence_ppm: int = 200_000,
    **pair_kwargs,
) -> DataFrame:
    """Directional association rules over the frequent co-purchase
    pairs: each undirected pair yields antecedent→consequent and
    consequent→antecedent candidates; confidence is EXACT integer ppm
    (n_both * 1e6 DIV support_antecedent), lift carries over from the
    pair table. Rules below ``min_confidence_ppm`` are dropped.

    Scale: pure projection + union over ``copurchase_pairs`` output —
    no additional shuffle beyond the pair mining itself.
    """
    pairs = copurchase_pairs(lines, **pair_kwargs)
    a2b = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        F.col("n_baskets").alias("n_both"),
        F.col("support_a").alias("support_ante"),
        F.col("support_b").alias("support_cons"),
        "lift",
    )
    b2a = pairs.select(
        F.col("item_b").alias("antecedent"),
        F.col("item_a").alias("consequent"),
        F.col("n_baskets").alias("n_both"),
        F.col("support_b").alias("support_ante"),
        F.col("support_a").alias("support_cons"),
        "lift",
    )
    rules = a2b.unionByName(b2a).withColumn(
        "confidence_ppm",
        F.expr("(n_both * 1000000) DIV support_ante").cast("long"),
    )
    return rules.where(F.col("confidence_ppm") >= int(min_confidence_ppm))
