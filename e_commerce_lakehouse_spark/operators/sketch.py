"""Deterministic cardinality sketches (KMV / k-minimum-values).

Distinct-count ESTIMATION is a workhorse on a 100 TB lake — shuffle
sizing, join-side selection, dedup-rate monitoring — but HLL-class
sketches (Spark's approx_count_distinct) are engine-specific, so their
answers cannot be value-hash oracled. KMV (Bar-Yossef et al. 2002) over
a DETERMINISTIC hash is both: keep the k smallest md5-derived hash
values of a column; with the hash mapped to [0, 2^60), the k-th
smallest h_k estimates ndv as (k-1) * 2^60 / h_k, and any engine that
can md5 reproduces the estimate bit-for-bit (DuckDB twin: q84).

Exactness guarantee: a group with fewer than k distinct hashes reports
its EXACT distinct count (the sketch degenerates to the full set).

Scale shape: one shuffle on (group, hash) with map-side partial
aggregation reduces the stream to distinct hashes; the per-group k-min
is a window top-k over those distinct hashes. A production variant
would pre-reduce each map partition to its local k smallest per group
before the shuffle (same answer, bounded shuffle volume) — the
formulation here keeps every stage a relational op so the DuckDB
oracle can state it verbatim.

Reference: no analog (the reference counts with exact COUNT(DISTINCT)
in Athena, /root/reference/src/glue_jobs/orders_etl.py:224-240 scale
notes in SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 60)  # md5 15-hex-char prefix → [0, 2^60)


def _h60(col: str):
    return F.conv(F.substring(F.md5(F.col(col)), 1, 15), 16, 10).cast("long")


def kmv_distinct_by_group(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group estimated distinct count of ``col``.

    Returns (group_cols..., n_min, kth_hash, est_distinct): n_min = how
    many of the k minimum slots filled (= exact distinct count when
    < k), est_distinct = the KMV estimate rounded to 2 dp (exact when
    n_min < k)."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by h_k)")
    from pyspark.sql import Window

    # NULL column values hash to NULL and must not occupy a k-min slot
    # (COUNT(DISTINCT) semantics exclude NULL; Spark would rank the NULL
    # hash FIRST while DuckDB ranks it LAST — review finding)
    hashes = (
        df.select(*group_cols, _h60(col).alias("_h"))
        .where(F.col("_h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_h")
    ranked = hashes.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= k
    )
    per_group = ranked.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_min"), F.max("_h").alias("kth_hash")
    )
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(_HASH_SPACE) / F.col("kth_hash"), 2)
    )
    return per_group.select(
        *group_cols, "n_min", "kth_hash", est.alias("est_distinct")
    )


def table_ndv(table, col: str, snapshot_id: int | None = None) -> dict:
    """Table-level distinct-count estimate for ``col`` MERGED from the
    per-file KMV sketches in the manifests (Iceberg puffin theta-sketch
    analog, deterministic) — zero data reads, O(live files * k) driver
    work. The merge is exact sketch algebra: the k smallest of the UNION
    of per-file k-minimums IS the global k-minimum set (every global
    minimum is a minimum of its own file), so the merged estimate equals
    the estimate computed over the whole column — which is what the q93
    oracle states in SQL.

    Files without a sketch for ``col`` (pre-declaration vintage, or a
    write-schema vintage lacking the column) are counted in
    ``files_missing``: the estimate then covers only sketched files
    (a lower bound; rewrite/compact backfills sketches like blooms)."""
    import heapq

    entries = table.entries(snapshot_id)
    k = None
    hashes: set[int] = set()
    missing = 0
    for e in entries:
        sk = (e.ndv or {}).get(col)
        if sk is None:
            if e.rows > 0:
                missing += 1
            continue
        k = sk["k"] if k is None else min(k, sk["k"])
        hashes.update(sk["mins"])
    out = {"files_total": len(entries), "files_missing": missing,
           "column": col}
    if k is None:
        out.update(n_min=0, kth_hash=None, est_distinct=None)
        return out
    mins = heapq.nsmallest(k, hashes)
    n_min = len(mins)
    kth = mins[-1] if mins else None
    if n_min < k:
        est = float(n_min)
    else:
        # HALF-AWAY-FROM-ZERO to 2 dp, matching DuckDB/Spark round —
        # Python's built-in round is banker's (half-even), a THIRD
        # rounding scheme that could flip a .xx5 boundary against the
        # q93 oracle (review finding)
        from decimal import ROUND_HALF_UP, Decimal

        v = (k - 1) * _HASH_SPACE / kth
        est = float(Decimal(repr(v)).quantize(Decimal("0.01"),
                                              rounding=ROUND_HALF_UP))
    out.update(n_min=n_min, kth_hash=kth, est_distinct=est)
    return out
