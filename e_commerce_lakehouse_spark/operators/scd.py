"""Slowly-changing-dimension (type 2) operators.

The reference pipeline upserts dimension-style tables by key and keeps
only the latest row (``orders_etl.py`` whenMatchedUpdateAll — covered by
``operators/merge.py``). A warehouse that needs HISTORY instead keeps
every attribute version with a validity interval — the classic SCD
type-2 shape (Kimball; Delta/Iceberg MERGE recipes). Three operators:

- :func:`scd2_build` — batch-build the versioned dimension from an
  append-ordered change log, collapsing consecutive duplicate attribute
  values (only CHANGES create versions).
- :func:`scd2_point_in_time` — enrich a probe table with the attribute
  version that was valid at each probe timestamp (point-in-time /
  temporal join; the validity-interval complement of the as-of join in
  ``queries.q28``).
- :func:`scd2_apply` — incrementally fold a new batch of changes into an
  existing dimension, touching ONLY the affected keys. Equals a full
  rebuild whenever the batch is append-ordered per key (every new event
  at or after that key's last RAW event timestamp) — the normal
  CDC-append regime. Late data older than that needs a raw-log rebuild
  of the key (documented contract, same caveat as Delta's CDC MERGE
  recipes).

100 TB design: every step is one shuffle on the dimension key (window
partitioned by key) — no global window, no driver collect. The
incremental path semi/anti-joins on the key, so the untouched majority
of a huge dimension is never re-windowed: cost is O(|changed keys'
history| + |new batch|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_build", "scd2_point_in_time", "scd2_apply", "state_timeline"]


def _collapse(
    df: DataFrame, key_col: str, ts_col: str, tiebreak_col: str, attr_col: str
) -> DataFrame:
    """Rows where ``attr_col`` differs from the previous row of the same
    key (null-safe), ordered by (ts, tiebreak). First row always kept."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    rn = F.row_number().over(w)
    return (
        df.select(key_col, ts_col, tiebreak_col, attr_col)
        .withColumn("_rn", rn)
        .withColumn("_prev", prev)
        .where((F.col("_rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("_prev")))
        .drop("_rn", "_prev")
    )


def scd2_build(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    attr_col: str,
) -> DataFrame:
    """Build an SCD type-2 dimension from an attribute change log.

    Output columns: key, ``version`` (1-based per key), ``state`` (the
    attribute value), ``valid_from`` / ``valid_to`` (half-open interval
    [from, to); ``valid_to`` NULL on the open version),
    ``change_event_id`` (the tiebreak value of the event that opened the
    version — lineage, and the exact seed :func:`scd2_apply` needs),
    ``is_current``.

    Consecutive duplicate attribute values collapse into one version
    (change detection via ``lag``); ordering ties break on
    ``tiebreak_col`` so the build is deterministic under equal
    timestamps.
    """
    changes = _collapse(df, key_col, ts_col, tiebreak_col, attr_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.row_number().over(w).cast("long").alias("version"),
        F.col(attr_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.col(tiebreak_col).cast("long").alias("change_event_id"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_point_in_time(
    dim: DataFrame, probes: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """LEFT-join each probe row to the dimension version valid at its
    timestamp: ``valid_from <= ts`` and (open version or
    ``ts < valid_to``). Equi-join on the key with a range residual —
    per-key version lists are small, so the join never degenerates into
    a cross product; probes with no version yet get NULL ``state``.
    """
    d = dim.select(
        F.col(key_col).alias("_k"), "state", "valid_from", "valid_to", "version"
    )
    cond = (
        (F.col("_k") == probes[key_col])
        & (F.col("valid_from") <= probes[ts_col])
        & (F.col("valid_to").isNull() | (probes[ts_col] < F.col("valid_to")))
    )
    return probes.join(d, cond, "left").drop("_k", "valid_from", "valid_to")


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    attr_col: str,
) -> DataFrame:
    """Fold a new batch of change events into an existing SCD2 dimension.

    Affected keys (those present in ``changes``) are re-derived from
    their existing CHANGE POINTS (each dim row replayed as one synthetic
    event at ``valid_from`` with its original ``change_event_id``
    tiebreak) unioned with the new events; unaffected keys pass through
    untouched (anti-join — never re-windowed, never reshuffled beyond
    the semi/anti probe). Joins are NULL-SAFE: a NULL key is a real
    dimension key (``scd2_build`` windows group NULLs), so a NULL-key
    batch must retire and replay its existing history like any other.

    Equals ``scd2_build`` over the concatenated raw log PROVIDED the
    batch is append-ordered per key against the RAW history: every new
    event at or after that key's LAST RAW EVENT timestamp (not merely
    its current ``valid_from`` — an event landing between the open
    version's start and a later collapsed-away duplicate would lose the
    duplicate's re-change on replay). The usual CDC-append regime (all
    new timestamps after all old ones) satisfies this; true late data
    needs a raw-log rebuild of that key.
    """
    affected = changes.select(F.col(key_col)).distinct()
    probe = affected.select(F.col(key_col).alias("_ak"))
    match = F.col(key_col).eqNullSafe(F.col("_ak"))
    keep = dim.join(probe, match, "left_anti")
    replay = dim.join(probe, match, "left_semi").select(
        F.col(key_col),
        F.col("valid_from").alias(ts_col),
        F.col("change_event_id").alias(tiebreak_col),
        F.col("state").alias(attr_col),
    )
    new_events = changes.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.col(attr_col),
    )
    rebuilt = scd2_build(
        replay.unionByName(new_events), key_col, ts_col, tiebreak_col, attr_col
    )
    return keep.unionByName(rebuilt)


def state_timeline(dim: DataFrame, key_col: str, horizon_ts=None) -> DataFrame:
    """Per-state occupancy report over an SCD2 dimension: version and
    key counts, total occupied time, and PEAK CONCURRENCY (how many keys
    were in the state at once) via a distributed sweep line.

    Intervals are clamped to the horizon (default: the dimension's max
    valid_from — the last observed instant): ends are cut at
    ``horizon_ts`` and versions opening after it are excluded, so an
    explicit early horizon reports occupancy AS OF that instant rather
    than emitting negative durations. NULL keys are real keys and count
    in ``n_keys``. Sweep
    line: each version emits +1 at valid_from and -1 at its end; the
    running sum ordered by (ts, delta, change_event_id) — departures
    before arrivals at the same instant, matching half-open
    [from, to) intervals — peaks at the state's max concurrency.
    Prefix sums within a (ts, delta) run are monotone, so the maximum
    is well-defined regardless of tiebreak, but the tiebreak keeps
    every intermediate value engine-identical anyway.

    Scale: the window partitions by state (one shuffle); durations are
    exact microsecond integers, so every output is bit-stable."""
    h = F.lit(horizon_ts).cast("timestamp") if horizon_ts is not None else None
    if h is None:
        # one tiny agg; broadcast the scalar into the plan
        hdf = dim.agg(F.max("valid_from").alias("_h"))
        dim = dim.crossJoin(F.broadcast(hdf))
        h = F.col("_h")
    end = F.least(F.coalesce(F.col("valid_to"), h), h)
    v = (
        dim.where(F.col("valid_from") <= h)  # opened within the horizon
        .select(
            "state",
            F.col(key_col).alias("_key"),
            F.col("valid_from").cast("timestamp").alias("vf"),
            end.cast("timestamp").alias("ve"),
            "change_event_id",
        )
        .persist()  # consumed by occupancy + both delta legs; released below
    )
    # distinct keys INCLUDING a NULL key (count_distinct drops NULLs)
    n_keys = (
        F.count_distinct(F.col("_key"))
        + F.max(F.when(F.col("_key").isNull(), 1).otherwise(0))
    )
    occupancy = v.groupBy("state").agg(
        F.count("*").cast("long").alias("n_versions"),
        n_keys.cast("long").alias("n_keys"),
        F.sum(
            F.unix_micros(F.col("ve")) - F.unix_micros(F.col("vf"))
        ).cast("long").alias("occupied_us"),
    )
    deltas = v.select(
        "state", F.col("vf").alias("ts"), F.lit(1).alias("delta"), "change_event_id"
    ).unionByName(
        v.select(
            "state", F.col("ve").alias("ts"), F.lit(-1).alias("delta"),
            "change_event_id",
        )
    )
    w = (
        Window.partitionBy("state")
        .orderBy("ts", "delta", "change_event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaks = (
        deltas.withColumn("conc", F.sum("delta").over(w))
        .groupBy("state")
        .agg(F.max("conc").cast("long").alias("peak_concurrent"))
        .withColumnRenamed("state", "_pstate")
    )
    # null-safe join: a NULL state is a real group (q47's fuzz finding —
    # an equi-join on the group key would silently drop it)
    result = (
        occupancy.join(
            peaks, F.col("state").eqNullSafe(F.col("_pstate")), "inner"
        ).drop("_pstate")
    )
    from .dedup import _finish_release

    return _finish_release(result, v)  # per-state tiny; release the cache
