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

# THE count-min slot hash, shared with the per-file sketch builder
# (cm_rows): one definition so the table-level merger can never drift
# from the on-disk sketches
from .._footer_stats import cm_slot as _cm_slot

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


def table_histogram(table, col: str, snapshot_id: int | None = None) -> dict:
    """Table-level equi-width histogram for ``col`` MERGED from the
    per-file distribution sketches in the manifests — zero data reads,
    O(live files * bins) driver work. Per-file bin counts are EXACT (not
    estimates), and the bin edges are fixed by the table's dist spec, so
    the elementwise SUM of the per-file counts IS the histogram of the
    whole column — which is what the q217 oracle states in SQL.

    Layout mirrors _footer_stats.hist_counts: counts[0] = underflow
    (x < lo), counts[1..bins] = the bins of [lo, hi), counts[bins+1] =
    overflow (x >= hi). NULLs are excluded (like COUNT(col)). Files
    without a sketch for ``col`` are counted in ``files_missing`` and
    excluded from the merge (lower bound, like table_ndv)."""
    entries = table.entries(snapshot_id)
    merged: list[int] | None = None
    lo = hi = None
    bins = None
    missing = 0
    for e in entries:
        sk = (e.dist or {}).get(col, {}).get("hist")
        if sk is None:
            if e.rows > 0:
                missing += 1
            continue
        if merged is None:
            lo, hi, bins = sk["lo"], sk["hi"], sk["bins"]
            merged = list(sk["counts"])
        else:
            if (sk["lo"], sk["hi"], sk["bins"]) != (lo, hi, bins):
                raise ValueError(
                    f"histogram spec drift for {col!r}: file {e.path} has "
                    f"({sk['lo']}, {sk['hi']}, {sk['bins']}) vs "
                    f"({lo}, {hi}, {bins}); re-declare + rewrite first"
                )
            for i, c in enumerate(sk["counts"]):
                merged[i] += c
    out = {"column": col, "files_total": len(entries),
           "files_missing": missing, "lo": lo, "hi": hi, "bins": bins,
           "counts": merged, "total": sum(merged) if merged else 0}
    return out


def table_quantiles(table, col: str, qs: list[float],
                    snapshot_id: int | None = None) -> list[tuple]:
    """Metadata-only quantile ESTIMATES for ``col`` from the merged
    histogram: for each q in (0, 1], target = q * total; the answer is a
    linear interpolation inside the first bin whose cumulative count
    reaches the target — lo + (width/bins) * (b + (target - cum_before)
    / bin_count) — clamped to lo/hi when the target lands in the
    underflow/overflow slot. Exact same arithmetic as the SQL twin
    (identical op order, both IEEE doubles rounded to 9 dp), so the
    estimates value-hash oracle. Error bound: within one bin width of
    the true quantile for in-range data by construction.

    Returns [(q, estimate), ...]; estimate None when the merged
    histogram is empty."""
    h = table_histogram(table, col, snapshot_id)
    counts, total = h["counts"], h["total"]
    out = []
    if not counts or total == 0:
        return [(float(q), None) for q in qs]
    lo, hi, bins = h["lo"], h["hi"], h["bins"]
    width = hi - lo
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantile {q} outside (0, 1]")
        target = q * total
        cum = 0
        est = None
        for i, c in enumerate(counts):
            cum += c
            if c > 0 and cum >= target:
                if i == 0:
                    est = float(lo)
                elif i == len(counts) - 1:
                    est = float(hi)
                else:
                    b = i - 1
                    cum_before = cum - c
                    est = lo + (width / bins) * (b + (target - cum_before) / c)
                break
        # Decimal ROUND_HALF_UP, matching est_union/est_common and
        # DuckDB's half-up round() in the SQL twin (ADVICE r5: Python
        # round() is banker's and a 9-dp half tie would diverge)
        if est is not None:
            from decimal import ROUND_HALF_UP, Decimal

            est = float(Decimal(repr(est)).quantize(
                Decimal("0.000000001"), rounding=ROUND_HALF_UP))
        out.append((float(q), est))
    return out




def table_cm(table, col: str, snapshot_id: int | None = None) -> dict:
    """Merged count-min matrix for ``col`` from the manifests (zero data
    reads): per-file matrices sum elementwise into the matrix of the
    whole column. Also unions the per-file top-k candidate pools."""
    entries = table.entries(snapshot_id)
    rows: list[list[int]] | None = None
    w = d = None
    cands: dict[str, int] = {}
    missing = 0
    for e in entries:
        sk = (e.dist or {}).get(col, {}).get("cm")
        if sk is None:
            if e.rows > 0:
                missing += 1
            continue
        if rows is None:
            w, d = sk["w"], sk["d"]
            rows = [list(r) for r in sk["rows"]]
        else:
            if (sk["w"], sk["d"]) != (w, d):
                raise ValueError(
                    f"count-min spec drift for {col!r}: file {e.path} has "
                    f"(w={sk['w']}, d={sk['d']}) vs (w={w}, d={d}); "
                    f"re-declare + rewrite first"
                )
            for j in range(d):
                rj, sj = rows[j], sk["rows"][j]
                for i in range(w):
                    rj[i] += sj[i]
        for v, c in sk.get("topk", []):
            cands[v] = cands.get(v, 0) + int(c)
    return {"column": col, "files_total": len(entries),
            "files_missing": missing, "w": w, "d": d, "rows": rows,
            "candidates": cands}


def cm_estimate(table, col: str, values: list,
                snapshot_id: int | None = None) -> list[tuple]:
    """Frequency over-estimates for specific ``values`` from the merged
    count-min matrix — min over hash rows of the summed counters, a
    GUARANTEED upper bound on each value's true count (collisions only
    inflate). Returns [(str(value), estimate), ...] in input order;
    estimate None when no file carries the sketch."""
    cm = table_cm(table, col, snapshot_id)
    rows, w, d = cm["rows"], cm["w"], cm["d"]
    out = []
    for v in values:
        s = str(v)
        if rows is None:
            out.append((s, None))
        else:
            out.append((s, min(rows[j][_cm_slot(j, s, w)] for j in range(d))))
    return out


def heavy_hitters(table, col: str, min_count: int,
                  snapshot_id: int | None = None) -> list[tuple]:
    """Heavy-hitter CANDIDATES with count-min estimated frequencies,
    metadata-only: candidates are the union of every file's top-k pool
    (provably containing any value that ranks top-k by count in at least
    one file), filtered to cm_estimate >= min_count. Because count-min
    never underestimates, no candidate with true count >= min_count is
    dropped by the filter; collisions can ADD false candidates, so an
    exact verify leg (one scan filtered to the candidate set) confirms —
    the two-phase shape q218 demonstrates. Sorted by (-estimate, value)."""
    cm = table_cm(table, col, snapshot_id)
    rows, w, d = cm["rows"], cm["w"], cm["d"]
    if rows is None:
        return []
    out = []
    for v in cm["candidates"]:
        est = min(rows[j][_cm_slot(j, v, w)] for j in range(d))
        if est >= min_count:
            out.append((v, est))
    out.sort(key=lambda p: (-p[1], p[0]))
    return out


def histogram_drift(table, col: str, from_snapshot: int,
                    to_snapshot: int | None = None) -> list[tuple]:
    """Per-bin count drift between two snapshots' merged histograms —
    the metadata-only DATA-DRIFT monitor: answers "how did this column's
    distribution move between yesterday's snapshot and now" from
    manifest sketches alone, zero data reads at any table size (the
    scan-based counterpart is stats.equidepth_drift). Both snapshots
    must carry the same declared bin edges (guaranteed unless the spec
    was re-declared between them — then table_histogram raises its
    spec-drift error). Returns [(bin, n_from, n_to, delta)] over the
    full grid including the under(-1)/overflow(bins) slots."""
    a = table_histogram(table, col, snapshot_id=from_snapshot)
    b = table_histogram(table, col, snapshot_id=to_snapshot)
    if a["counts"] is None or b["counts"] is None:
        raise ValueError(f"no histogram sketch for {col!r} at one of the "
                         f"snapshots (files_missing: {a['files_missing']}"
                         f"/{b['files_missing']})")
    if a["files_missing"] or b["files_missing"]:
        # a partially-covered histogram would conflate 'data changed'
        # with 'coverage changed' — a drift MONITOR must not report
        # silence on real drift (review finding); compact backfills
        raise ValueError(
            f"incomplete histogram coverage for {col!r}: files_missing "
            f"{a['files_missing']} at from / {b['files_missing']} at to; "
            f"compact to backfill sketches before measuring drift")
    if (a["lo"], a["hi"], a["bins"]) != (b["lo"], b["hi"], b["bins"]):
        raise ValueError(f"histogram spec changed between snapshots for "
                         f"{col!r}; drift needs identical bin edges")
    return [
        (i - 1, int(na), int(nb), int(nb - na))
        for i, (na, nb) in enumerate(zip(a["counts"], b["counts"]))
    ]


def key_overlap_estimate(table_a, col_a: str, table_b, col_b: str,
                         snapshot_a: int | None = None,
                         snapshot_b: int | None = None) -> dict:
    """Metadata-only JOIN-KEY overlap estimate between two tables from
    their merged KMV sketches (Beyer et al. 2007 k-min-value set
    algebra) — the planner question "how many distinct keys do these
    tables share / how selective is this join" answered with ZERO data
    reads at any table size (broadcast-vs-shuffle and semi-join-first
    decisions on a 100 TB pair).

    Algebra: with K = the k smallest hashes of the UNION of both
    sketches (a valid KMV of A ∪ B), the Jaccard estimate is
    |K ∩ mins(A) ∩ mins(B)| / |K|, union cardinality comes from K's
    k-th minimum, and est_common = round(jaccard * est_union, 2). All
    md5-deterministic, so the estimates value-hash against a SQL twin
    (q223). Exact when both columns have fewer than k distinct values
    (the sketches degenerate to the full hash sets).

    Files without sketches are reported per side (files_missing_a/_b);
    the estimate then covers the sketched subset (compact backfills)."""
    import heapq

    a = table_ndv(table_a, col_a, snapshot_id=snapshot_a)
    b = table_ndv(table_b, col_b, snapshot_id=snapshot_b)
    out = {"col_a": col_a, "col_b": col_b,
           "files_missing_a": a["files_missing"],
           "files_missing_b": b["files_missing"]}
    if a["kth_hash"] is None or b["kth_hash"] is None:
        out.update(k=0, est_union=None, jaccard=None, est_common=None)
        return out
    # reconstruct each side's min-set from the manifests (table_ndv
    # merged them; re-merge here to get the sets, not just the k-th)
    def _mins(table, col, sid):
        hashes: set[int] = set()
        k = None
        for e in table.entries(sid):
            sk = (e.ndv or {}).get(col)
            if sk is None:
                continue
            k = sk["k"] if k is None else min(k, sk["k"])
            hashes.update(sk["mins"])
        return set(heapq.nsmallest(k, hashes)), k

    mins_a, ka = _mins(table_a, col_a, snapshot_a)
    mins_b, kb = _mins(table_b, col_b, snapshot_b)
    k = min(ka, kb)
    union_k = set(heapq.nsmallest(k, mins_a | mins_b))
    inter = len(union_k & mins_a & mins_b)
    n_min = len(union_k)
    kth = max(union_k)
    if n_min < k:
        est_union = float(n_min)  # exact: the union has < k distinct keys
    else:
        from decimal import ROUND_HALF_UP, Decimal

        v = (k - 1) * _HASH_SPACE / kth
        est_union = float(Decimal(repr(v)).quantize(Decimal("0.01"),
                                                    rounding=ROUND_HALF_UP))
    from decimal import ROUND_HALF_UP, Decimal

    jac = inter / n_min if n_min else 0.0
    est_common = float(Decimal(repr(jac * est_union)).quantize(
        Decimal("0.01"), rounding=ROUND_HALF_UP))
    out.update(k=k, n_min=int(n_min), n_inter=int(inter),
               est_union=est_union,
               jaccard=float(Decimal(repr(jac)).quantize(
                   Decimal("0.000000001"), rounding=ROUND_HALF_UP)),
               est_common=est_common)
    return out
