"""Event-sequence analytics: sessionization, funnels, retention cohorts.

The reference pipeline lands click-stream-shaped fact rows (orders /
events) and reports on them with plain grouped aggregates
(`/root/reference/src/glue_jobs/orders_etl.py` summary queries); the
three operators here are the next analytics layer every event warehouse
adds on top — all expressed as single declarative DataFrame plans so
Catalyst owns the physical strategy.

Scale shapes (the 100 TB contract):

- ``sessionize`` — ONE shuffle, hash-partitioned on ``user_id``; the
  gap detection is a lag window and the session index a running sum
  inside the same partitioning, so both window functions share the one
  exchange. State per task is a sort buffer over one user's events —
  no global window, no driver collect.
- ``funnel`` — one grouped min-timestamp aggregate per stage, each
  shuffled on ``user_id``; stage k+1 joins stage k's per-user frontier
  (strictly-after semantics) on the same key, so AQE coalesces the
  exchanges. Stage frontiers shrink monotonically; the final counts are
  partial-aggregable.
- ``retention_cohorts`` — two aggregates keyed on ``user_id`` then
  (cohort_week, week_offset): the cohort dimension (one row per user)
  joins the distinct user-week activity on the shared ``user_id``
  partitioning — no broadcast hint, because a per-user dim is NOT small
  at web scale (AQE may still choose broadcast when it measures small);
  both aggregates are map-side combinable.

Every output column is deterministic (ties broken on ``event_id``) and
value-hash oracled against DuckDB twins (q95–q97, oracles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    strictly greater than ``gap_seconds``; return per-session rollups.

    Output: (user_id, session_idx, session_start, session_end,
    n_events, n_event_types, sum_value) — session_idx is 1-based in
    time order per user.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # epoch diff via tz-cast: both rows shift identically, so the gap is
    # timezone-independent even on TIMESTAMP_NTZ inputs
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(int(gap_seconds))), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessioned = events.withColumn(
        "session_idx", F.sum(new_session).over(run).cast("long")
    )
    return (
        sessioned.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: a user reaches stage k when they have
    an event of type ``steps[k]`` STRICTLY AFTER their earliest arrival
    at stage k-1 (earliest-arrival semantics, the standard warehouse
    funnel definition — each stage uses the user's first qualifying
    timestamp as the next stage's lower bound).

    Output: one row per stage — (stage, step, n_users,
    pct_of_first) — stage 1-based, pct relative to stage-1 reach.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    # each stage's per-user frontier feeds the next stage AND a count —
    # persist it so stage k never recomputes the k-1 chain (k passes
    # over events total, not k^2)
    frontier = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
        .persist()
    )
    counts = [frontier.count()]
    pinned = [frontier]
    try:
        for step in steps[1:]:
            frontier = (
                events.where(F.col(type_col) == step)
                .join(frontier, user_col)
                .where(F.col(ts_col) > F.col("_t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("_t"))
                .persist()
            )
            pinned.append(frontier)
            counts.append(frontier.count())
    finally:
        for f in pinned:
            f.unpersist()
    spark = events.sparkSession
    first = counts[0]
    # raw IEEE division (no rounding): both engines divide the same two
    # ints, so the doubles are bit-identical under the value-hash gate
    rows = [
        (i + 1, steps[i], int(counts[i]),
         counts[i] / first if first else 0.0)
        for i in range(len(steps))
    ]
    return spark.createDataFrame(
        rows, "stage bigint, step string, n_users bigint, pct_of_first double"
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly retention triangle: cohort = ISO week (date_trunc 'week',
    Monday-start in both Spark and DuckDB) of each user's FIRST event;
    a user is retained in offset k if they have any event in cohort
    week + k weeks.

    Output: (cohort_week, week_offset, n_users) — distinct users per
    cell; week_offset 0 row is the cohort size.
    """
    # DATE-typed weeks (DuckDB's date_trunc('week') is a DATE; Spark's
    # is a timestamp — cast so both engines emit the same type)
    cohorts = (
        events.groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).cast("date")
             .alias("cohort_week"))
    )
    activity = events.select(
        user_col,
        F.date_trunc("week", F.col(ts_col)).cast("date")
        .alias("activity_week"),
    ).distinct()
    return (
        activity.join(cohorts, user_col)
        .select(
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            ).cast("long").alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    lookback: int = 10,
    min_periods: int = 5,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Rolling z-score anomaly detection per key: each value is scored
    against the mean/stddev of its own trailing window (the PRECEDING
    ``lookback`` rows, excluding itself — no lookahead, no
    self-contamination), flagged when |z| exceeds the threshold. Rows
    with fewer than ``min_periods`` non-null trailing values (floored
    at 2 — a 1-row frame has NaN sample stddev, and Spark orders NaN
    above every number, so an unfloored guard would flag NaN
    z-scores), or a zero/NaN trailing stddev, are not scored (NULL z
    never flags).

    Scale: one shuffle on the key; both frame aggregates share the one
    sort. Frames are <= ``lookback`` rows, so per-row cost is bounded
    and the 4-dp rounding sits far above any <=10-term float
    accumulation ulp."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-lookback, -1)
    )
    mean = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    n_prev = F.count(value_col).over(w)
    z = F.round((F.col(value_col) - mean) / sd, 4)
    ok = (
        (n_prev >= max(int(min_periods), 2))
        & sd.isNotNull()
        & ~F.isnan(sd)
        & (sd > 0)
    )
    scored = df.select(
        key_col,
        ts_col,
        tiebreak_col,
        value_col,
        F.when(ok, z).alias("z"),
    )
    return scored.where(F.abs(F.col("z")) > z_threshold)


def cumulative_distinct_users(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily actives, daily NEW users, and the cumulative distinct-user
    curve — without any cumulative COUNT(DISTINCT) (quadratic state):
    each user contributes a "new" mark only on their FIRST day (one
    min-aggregate per user), so the running total of news IS the
    cumulative distinct count. NULL keys are excluded throughout
    (matching COUNT(DISTINCT)'s convention) and so are NULL timestamps
    (a NULL day has no place on the curve — and engines disagree on
    NULL ordering in the running-sum window, Spark NULLS FIRST vs
    DuckDB NULLS LAST). The running sum windows over the aggregated
    per-day table (days, not events), which is tiny at any corpus
    scale."""
    day = F.to_date(F.col(ts_col)).alias("day")
    keyed = df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
    active = (
        keyed.select(day, F.col(key_col).alias("k"))
        .groupBy("day")
        .agg(F.count_distinct(F.col("k")).alias("n_active"))
    )
    firsts = (
        keyed.select(F.col(key_col).alias("k"), day)
        .groupBy("k")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_new"))
    )
    per_day = active.join(firsts, "day", "left").select(
        "day", "n_active", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "n_active", "n_new",
        F.sum("n_new").over(w).cast("long").alias("cum_users"),
    )


def activity_streaks(
    df: DataFrame,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
) -> DataFrame:
    """Longest run of CONSECUTIVE calendar days with activity, per key
    (gaps-and-islands). The island id is the classic ``day -
    row_number`` trick: within a key, consecutive days share a constant
    difference, so a single window + one group-by finds every streak —
    no self-join, no iteration.

    Scale shape: distinct-first collapses the fact table to one row per
    (key, day) — bounded by keys x horizon-days regardless of event
    volume — then ONE shuffle on the key serves both the row_number
    window and the two stacked aggregates (AQE keeps them co-
    partitioned). Output: (key, active_days, n_streaks, longest_streak,
    longest_start) with the tie on equal-length streaks broken to the
    EARLIEST start.
    """
    days = (
        df.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), F.to_date(ts_col).alias("day"))
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("day")
    islands = days.withColumn(
        "_grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = islands.groupBy("key", "_grp").agg(
        F.count(F.lit(1)).alias("_len"), F.min("day").alias("_start")
    )
    return streaks.groupBy("key").agg(
        F.sum("_len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("_len").cast("long").alias("longest_streak"),
        # max of (length, -start_days) = longest streak, earliest start
        F.max_by(
            "_start",
            F.struct(F.col("_len"), (-F.unix_date(F.col("_start"))).alias("_neg")),
        ).alias("longest_start"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average of a step series: each observation holds
    until the key's NEXT observation (last one contributes nothing —
    no horizon assumption). The weighted sum runs in EXACT integer
    space — value fixed to micro-units (``round(v*1e6)`` BIGINT), hold
    durations in microseconds (``unix_micros``, the q121 precision
    contract), products in DECIMAL(38,0) (a long x long here can
    exceed int64) — so engines can't disagree on double summation
    order; the single final division is one IEEE op on exact operands.

    One shuffle on the key: the lead() window and the group-by share
    the partitioning. Output: (key, n_obs, held_us BIGINT, twa DOUBLE
    rounded 6 dp).
    """
    w = Window.partitionBy("key").orderBy("ts_us", "tb")
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(tiebreak_col).alias("tb"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("v_u"),
    )
    held = base.withColumn(
        "dur_us", F.lead("ts_us").over(w) - F.col("ts_us")
    ).where(F.col("dur_us").isNotNull())
    return (
        held.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_obs"),
            F.sum("dur_us").cast("long").alias("held_us"),
            F.sum(
                F.col("v_u").cast("decimal(38,0)")
                * F.col("dur_us").cast("decimal(38,0)")
            ).alias("_vw"),
        )
        .where(F.col("held_us") > 0)
        .select(
            "key",
            "n_obs",
            "held_us",
            F.round(
                F.col("_vw").cast("double")
                / (F.col("held_us").cast("double") * 1e6),
                6,
            ).alias("twa"),
        )
    )


def event_transitions(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts + probabilities over each
    key's event sequence (ts order, tiebreak on the id — the repo-wide
    determinism contract). ONE shuffle on the key for the lag window;
    the (prev, next) count is map-side combinable and the probability
    normalization windows over the aggregated transition matrix
    (|states|^2 rows — tiny at any fact-table scale, state cardinality
    is a dimension). Probabilities are exact-integer divisions rounded
    6 dp. NULL states participate as real states (a NULL event_type is
    a distinct symbol); NULL keys/timestamps are excluded.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    seq = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn("_prev", F.lag(state_col).over(w)).withColumn(
        "_has_prev", F.lag(F.lit(1)).over(w)
    )
    trans = (
        seq.where(F.col("_has_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("prev_state"),
            F.col(state_col).alias("next_state"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    norm = Window.partitionBy("prev_state")
    return trans.select(
        "prev_state",
        "next_state",
        "n_transitions",
        F.round(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double"),
            6,
        ).alias("prob"),
    )


def interarrival_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Per-key inter-arrival statistics with the Goh-Barabási
    burstiness coefficient B = (σ − μ)/(σ + μ): B → −1 is a periodic
    (clock-like) source, B ≈ 0 Poisson, B → +1 bursty. The standard
    traffic-shape diagnostic for event streams — bot/scraper detection,
    feed-health monitoring, sessionization-parameter tuning.

    Gaps are exact integer microseconds (lag over the repo-wide
    (ts, tiebreak) determinism contract); moments are summed as
    DECIMAL(38,0) so no engine can disagree on double summation order,
    then μ/σ/B come from FIXED-SHAPE closed forms on the exact operands
    (the q115 ``exact_linear_stats`` recipe), rounded 6 dp after.
    Zero-spread keys (σ + μ = 0: all gaps zero) report B = 0 explicitly
    rather than NaN. Keys with fewer than ``min_gaps`` gaps are dropped
    (sample variance needs n ≥ 2).

    One shuffle on the key: the lag window and the group-by share the
    partitioning; both aggregates are map-side combinable.
    """
    w = Window.partitionBy("key").orderBy("ts_us", "tb")
    base = df.where(
        F.col(key_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(tiebreak_col).alias("tb"),
    )
    gaps = base.select(
        "key", (F.col("ts_us") - F.lag("ts_us").over(w)).alias("gap_us")
    ).where(F.col("gap_us").isNotNull())
    g = F.col("gap_us").cast("decimal(38,0)")
    m = (
        gaps.groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            # exact int64: per-key gaps telescope to (max ts - min ts),
            # so the sum is bounded by the key's time span in micros
            F.sum("gap_us").cast("long").alias("s1i"),
            F.sum(g).cast("double").alias("s1"),
            F.sum(g * g).cast("double").alias("s2"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .where(F.col("n") >= min_gaps)
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    # fixed expression shapes — keep in exact sync with the oracle SQL.
    # the REPORTED mean floors to integer micros before the one double
    # division (q179 contract): round(s1/n, 6) sat exactly on a 6-dp
    # half boundary at sf0.1 where Spark's HALF_UP and DuckDB's round
    # disagree (key 1124) — an integer-micro value divided by 1e6 can
    # never sit on one. μ inside σ/B stays the raw double quotient
    # (identical bits in any IEEE engine; no rounding applied to it).
    mu = s1 / n
    sd = F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))
    burst = F.when(sd + mu == F.lit(0.0), F.lit(0.0)).otherwise(
        F.round((sd - mu) / (sd + mu), 6)
    )
    return m.select(
        F.col("key"),
        n.cast("long").alias("n_gaps"),
        F.round(
            F.expr("s1i DIV CAST(n AS BIGINT)").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("mean_gap_s"),
        F.round(
            F.floor(sd).cast("double") / F.lit(1000000.0), 6
        ).alias("sd_gap_s"),
        F.col("max_gap_us").cast("long").alias("max_gap_us"),
        burst.alias("burstiness"),
    )


def recency_decay_scores(
    df: DataFrame,
    anchor: str = "2024-03-01",
    half_life_days: int = 7,
    max_age_days: int = 28,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Recency-decayed engagement score per key — the rec-sys/curation
    freshness signal: score = Σ value · 0.5^(age_days // half_life),
    over events no older than ``max_age_days`` relative to ``anchor``.

    EXACT across engines by construction: the decay exponent is an
    INTEGER (floor-divided age bucket), so every weight is a power of
    two; value is fixed to integer micro-units; each term is then
    value_u · 2^(E−e) — a pure integer — summed as DECIMAL(38,0)
    (HUGEINT in the oracle), with ONE double division by the constant
    2^E·1e6 at the end. No float summation order anywhere, no libm.

    One shuffle on the key; the aggregate is map-side combinable.
    """
    e_max = max_age_days // half_life_days
    anchor_d = F.to_date(F.lit(anchor))
    age = F.datediff(anchor_d, F.col(ts_col).cast("date"))
    ex = F.floor(age / F.lit(half_life_days)).cast("int")
    # 2^(E-e) via a literal lookup table (shiftleft needs a static count);
    # every weight is an exact integer power of two
    pow2 = F.array(*[F.lit(1 << i).cast("long") for i in range(e_max + 1)])
    term = (
        F.round(F.col(value_col) * 1e6).cast("long").cast("decimal(38,0)")
        * F.element_at(pow2, F.lit(e_max + 1) - ex).cast("decimal(38,0)")
    )
    scale = float((1 << e_max) * 1_000_000)
    return (
        df.where(
            F.col(key_col).isNotNull()
            & F.col(value_col).isNotNull()
            & age.between(0, max_age_days)
        )
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(term).alias("_s"),
            F.max(F.col(ts_col).cast("date")).alias("last_day"),
        )
        .select(
            "key",
            "n_events",
            "last_day",
            F.round(F.col("_s").cast("double") / F.lit(scale), 6).alias(
                "decay_score"
            ),
        )
    )


def session_paths(
    df: DataFrame,
    gap_seconds: int = 1800,
    max_steps: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Clickstream path mining: the first ``max_steps`` event types of
    every session (q95's inactivity-gap session rule), joined with
    '>' into a path string, counted across sessions and distinct
    users — the "what do journeys look like" rollup product analytics
    runs daily. NULL event types become the literal 'NULL' step (a real
    state, q129's convention).

    Scale shape: one shuffle on the user key (session assignment,
    per-session row numbers, and the per-session fold all share it);
    the path table is then a plain map-side-combinable count. The
    per-session fold is array_sort over ≤ max_steps structs — bounded,
    no token-stream window.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(int(gap_seconds))), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_sid", F.sum(new_session).over(run).cast("long"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(user_col, "_sid").orderBy(
                    ts_col, tiebreak_col
                )
            ),
        )
        .where(F.col("_rn") <= max_steps)
        .select(
            user_col,
            "_sid",
            "_rn",
            F.coalesce(F.col("event_type"), F.lit("NULL")).alias("_et"),
        )
    )
    paths = s.groupBy(user_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rn", "_et"))),
                lambda x: x["_et"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct(user_col).alias("n_users"),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Change-point detection per group via the cumulative-deviation
    (Page/CUSUM-type) statistic on the daily count series: with daily
    counts x_1..x_N and mean x̄, D_t = Σ_{i<=t}(x_i − x̄) peaks at the
    day the level shifts — the drift monitor an ingest pipeline runs
    per source/type to catch "this feed changed volume on day k".

    EXACT by clearing denominators: D_t·N = N·cumsum_t − t·total is a
    pure integer, so the argmax (tie → earliest day) is engine-stable;
    the reported statistic max|D_t|/N is one final division. Only days
    PRESENT in the data form the series (gap days are not zero-filled;
    compose with the q48 date spine if needed).

    Scale shape: daily aggregation is map-side combinable; the per-group
    series windows (cumsum, day index, argmax rank) all share one
    shuffle on the group key, and the series length is bounded by
    days×groups — tiny relative to the input.
    """
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"),
            F.col(ts_col).cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w_ord = Window.partitionBy("grp").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = Window.partitionBy("grp")
    series = daily.select(
        "grp",
        "day",
        F.sum("x").over(w_cum).alias("cum"),
        F.row_number().over(w_ord).alias("t"),
        F.sum("x").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_days"),
    ).select(
        "grp",
        "day",
        "n_days",
        "total",
        (F.col("n_days") * F.col("cum") - F.col("t") * F.col("total")).alias(
            "d_scaled"
        ),
    )
    ranked = series.select(
        "grp",
        "day",
        "n_days",
        "total",
        "d_scaled",
        F.row_number()
        .over(
            Window.partitionBy("grp").orderBy(
                F.abs(F.col("d_scaled")).desc(), F.col("day").asc()
            )
        )
        .alias("rk"),
    )
    return (
        ranked.where((F.col("rk") == 1) & (F.col("n_days") >= 2))
        .select(
            F.col("grp").alias(group_col),
            F.col("n_days").cast("long").alias("n_days"),
            F.col("total").cast("long").alias("n_events"),
            F.col("day").alias("change_day"),
            F.round(
                F.abs(F.col("d_scaled")).cast("double")
                / F.col("n_days").cast("double"),
                6,
            ).alias("cusum_stat"),
        )
    )


def rolling_distinct_users(
    df: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """EXACT rolling n-day distinct users per day (the WAU/MAU family)
    WITHOUT sketches: each distinct (user, activity day) contributes to
    the ``window_days`` report days it falls inside, so the rolling
    distinct is a plain count-distinct per report day — the standard
    exact formulation (a windowed COUNT(DISTINCT) over raw events is
    unsupported/quadratic; HLL would be approximate).

    Scale: the expansion is bounded at window_days × |distinct
    user-days| — map-side, no self-join; the count-distinct shuffles on
    (day, user). Report days cover the full observed [min, max] spine
    (gap days report 0, not absent).

    Output: (day, active_today, rolling_users) for every spine day.
    """
    ud = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), F.col(ts_col).cast("date").alias("day"))
        .distinct()
    )
    bounds = ud.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day")
    )
    expanded = ud.select(
        "u",
        F.explode(
            F.sequence("day", F.date_add("day", window_days - 1),
                       F.expr("interval 1 day"))
        ).alias("day"),
    )
    rolled = expanded.groupBy("day").agg(
        F.countDistinct("u").alias("rolling_users")
    )
    today = ud.groupBy("day").agg(F.countDistinct("u").alias("active_today"))
    return (
        spine.join(today, "day", "left")
        .join(rolled, "day", "left")
        .select(
            "day",
            F.coalesce("active_today", F.lit(0)).cast("long").alias("active_today"),
            F.coalesce("rolling_users", F.lit(0)).cast("long").alias("rolling_users"),
        )
    )


def cohort_ltv(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cohort lifetime-value triangle: cohort = calendar month of each
    key's FIRST activity; for every (cohort, month_offset) report the
    active keys, the period revenue, and the CUMULATIVE revenue per
    cohort member (the LTV curve finance teams read off retention
    triangles).

    Exact: month offsets are pure integer arithmetic
    ((Δyear)·12 + Δmonth — no fractional months_between), revenue runs
    in integer cents, and the cumulative sum is a running DECIMAL(38,0)
    window over the (cohort, offset) AGGREGATE (bounded rows, exact at
    any scale); the per-member division is one IEEE op per output row.

    Scale: one shuffle on the key (first-activity aggregate), one on
    (cohort, offset); the cumulative window runs over cohorts×offsets
    rows only.
    """
    base = df.where(
        F.col(key_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(key_col).alias("key"),
        F.date_trunc("month", F.col(ts_col)).cast("date").alias("am"),
        F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
    )
    firsts = base.groupBy("key").agg(F.min("am").alias("cohort_month"))
    sized = firsts.groupBy("cohort_month").agg(
        F.countDistinct("key").alias("cohort_size")
    )
    offset = (
        (F.year("am") - F.year("cohort_month")) * 12
        + (F.month("am") - F.month("cohort_month"))
    ).cast("long")
    cells = (
        base.join(firsts, "key")
        .select("cohort_month", offset.alias("month_offset"), "key", "v_c")
        .groupBy("cohort_month", "month_offset")
        .agg(
            F.countDistinct("key").alias("n_active"),
            F.sum(F.col("v_c").cast("decimal(38,0)")).alias("rev_c"),
        )
    )
    w = Window.partitionBy("cohort_month").orderBy("month_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.withColumn("cum_c", F.sum("rev_c").over(w))
        .join(sized, "cohort_month")
        .select(
            "cohort_month",
            "month_offset",
            F.col("n_active").cast("long").alias("n_active"),
            F.round(F.col("rev_c").cast("double") / 100.0, 6).alias("revenue"),
            F.round(
                F.col("cum_c").cast("double")
                / F.col("cohort_size").cast("double")
                / 100.0,
                6,
            ).alias("cum_ltv_per_user"),
        )
    )


def conversion_lag(
    df: DataFrame,
    from_step: str = "signup",
    to_step: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Time-to-convert distribution: for users whose FIRST ``to_step``
    event falls strictly after their FIRST ``from_step`` event, the lag
    between the two — with the mean from exact integer-microsecond sums
    (DECIMAL(38,0)) and the median by exact nearest-rank over the
    (lag, user) order. One row out: (n_from, n_converted, mean_lag_s,
    median_lag_s, conversion_rate).

    Scale: two per-user min aggregates joined on the user key, then one
    global aggregate over the converts (the median window runs over the
    converts only — at web scale swap in grouped nearest-rank per
    cohort, q111's shape, to avoid the single-partition window).
    """
    base = df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    f = (
        base.where(F.col(type_col) == from_step)
        .groupBy(user_col)
        .agg(F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("t0"))
    )
    t = (
        base.where(F.col(type_col) == to_step)
        .groupBy(user_col)
        .agg(F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("t1"))
    )
    lags = (
        f.join(t, user_col)
        .where(F.col("t1") > F.col("t0"))
        .select(F.col(user_col).alias("u"), (F.col("t1") - F.col("t0")).alias("lag_us"))
    )
    w_ord = Window.orderBy("lag_us", "u")
    ranked = lags.select(
        "lag_us",
        F.row_number().over(w_ord).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    med = F.max(
        F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("lag_us"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.sum(F.col("lag_us").cast("decimal(38,0)")).alias("_s"),
        med.alias("_med"),
    )
    n_from = f.agg(F.count(F.lit(1)).cast("long").alias("n_from"))
    nc = F.col("n_converted")
    return agg.crossJoin(n_from).select(
        "n_from",
        "n_converted",
        F.when(
            nc > 0,
            F.round(
                F.col("_s").cast("double") / nc.cast("double") / 1000000.0, 6
            ),
        ).alias("mean_lag_s"),
        F.when(nc > 0, F.round(F.col("_med") / 1000000.0, 6)).alias(
            "median_lag_s"
        ),
        F.when(
            F.col("n_from") > 0,
            F.round(nc.cast("double") / F.col("n_from").cast("double"), 6),
        ).alias("conversion_rate"),
    )


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch revenue attribution: every conversion event credits
    the user's most recent PRECEDING non-conversion event type (the
    touch channel); conversions with no prior touch credit
    '(direct)'. NULL event types are the literal 'NULL' channel (the
    q129 convention). The marketing-analytics readout every events
    warehouse ships.

    Deterministic: the touch lookup is last-ignore-nulls over the
    (ts, tiebreak) total order with an UNBOUNDED..1 PRECEDING frame —
    a pure function of the sort, tie-stable in any engine. Revenue
    sums as integer cents; one division at the end.

    One shuffle on the user key: the frame walk and nothing else; the
    channel rollup is map-side combinable.
    """
    w = Window.partitionBy(user_col).orderBy(
        ts_col, tiebreak_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    is_touch = F.col(type_col).isNull() | (F.col(type_col) != conversion_type)
    touch = F.last(
        F.when(is_touch, F.coalesce(F.col(type_col), F.lit("NULL"))), True
    ).over(w)
    conv = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_ch", touch)
        .where(F.col(type_col) == conversion_type)
    )
    return (
        conv.groupBy(F.coalesce(F.col("_ch"), F.lit("(direct)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_conversions"),
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("_rev"),
        )
        .select(
            "channel",
            "n_conversions",
            F.round(F.col("_rev") / 100.0, 6).alias("revenue"),
        )
    )


def linear_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Linear (equal-credit) multi-touch attribution with EXACT money:
    each conversion's cents split equally across the DISTINCT channels
    that preceded it, remainder cents to the alphabetically-first
    channels (q127's largest-remainder discipline applied to credit) —
    so per-conversion credits sum back to the conversion EXACTLY, and
    channel revenue reconciles to total conversion revenue to the cent.
    Conversions with no prior touch credit '(direct)' in full; NULL
    event types are the 'NULL' channel.

    Scale: the channel set per conversion is collect_set over the
    user-ordered frame (bounded by |channel|, tiny), exploded to at
    most |channel| rows per conversion; one shuffle on the user key,
    one on the channel rollup.
    """
    w = Window.partitionBy(user_col).orderBy(
        ts_col, tiebreak_col
    ).rowsBetween(Window.unboundedPreceding, -1)
    is_touch = F.col(type_col).isNull() | (F.col(type_col) != conversion_type)
    chans = F.array_sort(
        F.collect_set(
            F.when(is_touch, F.coalesce(F.col(type_col), F.lit("NULL")))
        ).over(w)
    )
    conv = (
        # NULL-value filter applies to CONVERSIONS only, after the frame:
        # a NULL-value touch still carries channel information
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_chans", chans)
        .where(
            (F.col(type_col) == conversion_type)
            & F.col(value_col).isNotNull()
        )
        .select(
            F.round(F.col(value_col) * 100).cast("long").alias("v_c"),
            F.when(F.size("_chans") > 0, F.col("_chans"))
            .otherwise(F.array(F.lit("(direct)")))
            .alias("_chans"),
        )
    )
    k = F.size("_chans")
    credited = conv.select(
        "v_c",
        k.alias("k"),
        F.posexplode("_chans").alias("pos", "channel"),
    ).select(
        "channel",
        (
            F.expr("v_c div k")
            + (F.col("pos") < F.col("v_c") % F.col("k")).cast("long")
        ).alias("credit_c"),
    )
    return (
        credited.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touchpoints"),
            F.sum(F.col("credit_c").cast("decimal(38,0)")).alias("_c"),
        )
        .select(
            "channel",
            "n_touchpoints",
            F.round(F.col("_c").cast("double") / 100.0, 6).alias("revenue"),
        )
    )


def session_conversion_paths(
    df: DataFrame,
    conversion_type: str = "purchase",
    gap_seconds: int = 1800,
    max_steps: int = 5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Which journeys convert: q137's session paths joined with a
    per-session conversion flag (any ``conversion_type`` event in the
    session — not just within the first ``max_steps``), rolled up to
    (path, n_sessions, n_converted, conversion_rate). The product
    question behind path mining — "do view>click>purchase journeys
    close more often than click-first ones?".

    One shuffle on the user key (session assignment, row numbers, the
    per-session fold and flag all share it); exact integer counts, one
    division per path.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    prev = F.lag(epoch).over(w)
    new_session = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(int(gap_seconds))), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = (
        df.where(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
        .withColumn("_sid", F.sum(new_session).over(run).cast("long"))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(user_col, "_sid").orderBy(
                    ts_col, tiebreak_col
                )
            ),
        )
        .select(
            user_col,
            "_sid",
            "_rn",
            F.coalesce(F.col("event_type"), F.lit("NULL")).alias("_et"),
        )
    )
    per_session = s.groupBy(user_col, "_sid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_steps,
                               F.struct("_rn", "_et"))
                    )
                ),
                lambda x: x["_et"],
            ),
            ">",
        ).alias("path"),
        F.max((F.col("_et") == conversion_type).cast("int")).alias("_conv"),
    )
    return (
        per_session.groupBy("path")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("_conv").cast("long").alias("n_converted"),
        )
        .withColumn(
            "conversion_rate",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ),
        )
    )


def watermark_lateness_audit(
    events: DataFrame,
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-time lateness profile in arrival order — the batch study
    that picks a Structured Streaming ``withWatermark`` delay.

    Replays the table in arrival order (``arrival_col``, a monotone
    ingest id) and computes, for every event, how far its event time
    lags the maximum event time seen BEFORE it — exactly the lateness a
    zero-delay watermark would have charged it. The running max is the
    exact distributed prefix-max (``curation.distributed_running_max``:
    one range shuffle + Arrow scan; no single-partition global window),
    so this runs at any scale.

    Output: one row per (event_type, lateness_bucket) with counts and
    the bucket's max observed lateness in seconds — read it as "a 1 h
    watermark keeps all but the `>1h` rows". Buckets: on_time (lateness
    0, including the first arrival), <=60s, <=1h, <=24h, >24h.
    """
    from .curation import distributed_running_max

    base = events.where(
        F.col(arrival_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(type_col).isNotNull()
    ).select(
        F.col(arrival_col).alias("aid"),
        F.col(type_col).alias("etype"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
    )
    rm = distributed_running_max(
        base, order_col="aid", value_col="ts_us", out_col="wm_us"
    )
    late_us = F.greatest(
        F.lit(0).cast("long"), F.col("wm_us") - F.col("ts_us")
    )
    lateness = rm.withColumn(
        "late_us", F.coalesce(late_us, F.lit(0).cast("long"))
    ).withColumn(
        "bucket",
        F.when(F.col("late_us") == 0, F.lit("on_time"))
        .when(F.col("late_us") <= 60_000_000, F.lit("le_60s"))
        .when(F.col("late_us") <= 3_600_000_000, F.lit("le_1h"))
        .when(F.col("late_us") <= 86_400_000_000, F.lit("le_24h"))
        .otherwise(F.lit("gt_24h")),
    )
    return (
        lateness.groupBy("etype", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            # floor-division (not cast) — Spark's double->long cast truncates
            # where DuckDB's rounds, so the oracle twin uses floor() too
            F.floor(F.max("late_us") / F.lit(1_000_000)).cast("long").alias("max_late_sec"),
        )
        .select(
            F.col("etype").alias("event_type"),
            "bucket",
            "n_events",
            "max_late_sec",
        )
    )


def seasonality_index(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonal index per event type: mean(value | type,
    dow) / mean(value | type), from EXACT integer micro-unit moments
    (stats.py contract — double summation order can differ across
    engines, DECIMAL(38,0) sums cannot).

    Day-of-week is computed arithmetically from epoch days
    ((days + 4) % 7, Sunday = 0; 1970-01-01 was a Thursday) so the two
    engines can't disagree on locale/week-start conventions. Two
    map-side-combinable aggregates, the per-type totals broadcast back
    (one row per type). Index rounded 6 dp after a fixed-shape double
    expression.
    """
    base = events.where(
        F.col(type_col).isNotNull()
        & F.col(ts_col).isNotNull()
        & F.col(value_col).isNotNull()
    ).select(
        F.col(type_col).alias("etype"),
        ((F.unix_date(F.col(ts_col).cast("date")) + 4) % 7).cast("int").alias("dow"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("v_u"),
    )
    per_dow = base.groupBy("etype", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("v_u").cast("decimal(38,0)")).alias("_s"),
    )
    per_type = base.groupBy("etype").agg(
        F.count(F.lit(1)).cast("long").alias("_tn"),
        F.sum(F.col("v_u").cast("decimal(38,0)")).alias("_ts"),
    )
    return (
        per_dow.join(F.broadcast(per_type), "etype")
        .select(
            F.col("etype").alias("event_type"),
            "dow",
            "n",
            F.round(
                (F.col("_s").cast("double") / F.col("n").cast("double"))
                / (F.col("_ts").cast("double") / F.col("_tn").cast("double")),
                6,
            ).alias("seasonal_index"),
        )
    )
