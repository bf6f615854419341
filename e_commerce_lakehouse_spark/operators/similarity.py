"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline (oracle-checkable); the
scale path is random-hyperplane LSH bucketing — candidates only from
matching buckets, then exact re-rank. Hyperplanes derive deterministically
from md5 of (seed, plane, dim): no RNG state, identical across runs and
executors, no data shipped to the driver.

The reference has no similarity operator at all; this is part of the
training-data surface the engine adds (task brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _finish_release, cosine_sim, round_cos, vec_norm  # noqa: F401 (cosine_sim is public API here too)


def _sql_dbl(x) -> str:
    """SQL text of an exact double literal. repr() emits the shortest
    round-trip form, so the SQL parser's Double.parseDouble lands on the
    bit-identical double."""
    return f"CAST('{float(x)!r}' AS DOUBLE)"


def _sql_darr(values) -> str:
    """SQL text of a literal array<double>."""
    return "array(" + ",".join(_sql_dbl(x) for x in values) + ")"


def _lit_vec(values) -> "F.Column":
    """Literal array<double> as ONE py4j call (F.expr of a SQL array
    literal). The classic-pyspark alternatives — F.array(*[F.lit(x)…]) and
    even F.lit(list), which expands per element internally — cost ~3 py4j
    round-trips per element; with dim×planes×tables literal vectors the
    round-trips alone dominated the ANN queries' wall (measured: q203
    spent 10.8 of 12.1 s inside 71k py4j calls)."""
    return F.expr(_sql_darr(values))


def _lit_mat(rows) -> "F.Column":
    """Literal array<array<double>> as ONE py4j call (see _lit_vec)."""
    return F.expr("array(" + ",".join(_sql_darr(row) for row in rows) + ")")


def _norms(df: DataFrame, id_out: str, vec_out: str, norm_out: str, id_col: str, vec_col: str):
    """Project (id, double-vector, L2 norm): norms computed once per row,
    never per pair. Deliberately NOT widened via plans/parallelism: the
    ANN paths are join/dispatch-bound at small scale (measured: widening
    the scan made q26 ~2× slower — extra exchanges across the 4 bucket
    branches outweigh the map-side win; the 64-dim float math is light
    next to a shingle/md5 pipeline)."""
    return df.select(
        F.col(id_col).alias(id_out),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_out),
    ).withColumn(norm_out, vec_norm(F.col(vec_out)))


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _safe_cos(dot_col, n1: str, n2: str):
    """4-dp zero-norm-guarded cosine — delegates to the single shared
    contract definition, dedup.round_cos."""
    return round_cos(dot_col, F.col(n1), F.col(n2))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded when ids
    collide). Queries are broadcast — the fact table never shuffles."""
    q = _norms(queries, query_id_col, "qv", "qn", query_id_col, vec_col)
    v = _norms(vectors, "neighbor_id", "nv", "nn", id_col, vec_col)
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .withColumn("cos", _safe_cos(_dot("nv", "qv"), "nn", "qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos")
    )


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-gaussian-ish plane from md5 — portable, no RNG."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{seed}|{plane}|{d}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(1 << 31) - 1.0)  # uniform [-1, 1)
    return out


def lsh_bucket_signature(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
    center: list[float] | None = None,
):
    """Random-hyperplane signature column: bit p = sign((v−center)·plane_p).

    ``center`` (the dataset mean) matters: embedding corpora often live in
    one orthant, where origin hyperplanes separate nothing — centering
    restores the sign-random-projection guarantees."""
    # the WHOLE signature as one SQL expression string → ONE py4j call
    # (the per-plane Column building cost ~50 py4j round-trips per plane
    # and dominated the LSH queries' wall; the JVM expression tree this
    # parses to is identical to the previous Column-built one)
    c = center or [0.0] * dim
    carr = _sql_darr(c)
    shifted = (
        f"zip_with(transform({vec_col}, x -> CAST(x AS DOUBLE)), {carr}, "
        "(x, m) -> x - m)"
    )
    terms = []
    for p in range(n_planes):
        parr = _sql_darr(_hyperplane(seed, p, dim))
        dot = (
            f"aggregate(zip_with({shifted}, {parr}, (x, w) -> x * w), "
            f"{_sql_dbl(0.0)}, (acc, v) -> acc + v)"
        )
        terms.append(f"IF({dot} >= 0, {1 << p}, 0)")
    return F.expr("(" + " + ".join(terms) + ")").alias("bucket")


def dataset_mean(df: DataFrame, dim: int, vec_col: str = "embedding") -> list[float]:
    """Per-dimension mean (one distributed agg; result is tiny). Rounded
    to 6 dp so an independent engine's avg (different float summation
    order) lands on the identical center — keeps bucket signatures
    bit-stable across engines for the SQL oracles."""
    # one array-valued aggregate expression → one py4j call, not dim × ~10
    expr = "array(" + ",".join(
        f"round(avg(CAST({vec_col}[{i}] AS DOUBLE)), 6)" for i in range(dim)
    ) + ")"
    row = df.agg(F.expr(expr).alias("m")).collect()[0]
    return [float(x) for x in row["m"]]


def _cell_cos_structs(cents: list[tuple[int, list[float], float]], vec: str, norm: str):
    """array<struct(cos, cell)> of 5-dp cosines against every literal
    centroid — ONE zip_with over a literal array-of-arrays, not one fold
    expression per cell (a 16-cell × 64-dim per-cell tree made Catalyst
    analysis/codegen the dominant cost; this keeps the plan a single
    nested-loop expression). Pure projection: zero shuffle, zero join."""
    # the whole per-cell cosine array as ONE SQL expression string → one
    # py4j call (see _lit_vec; the parsed JVM tree matches the previous
    # Column-built one).
    # 5 dp, not 6: engines' fold orders differ by ~1e-16 relative, so a
    # comparison value this coarse makes a cross-engine rounding-boundary
    # flip ~100× rarer than at 6 dp; extra ties break deterministically
    # (cell asc) in both engines. Mirrored in the q53 oracle SQL.
    cents_mat = "array(" + ",".join(_sql_darr(c_vec) for _, c_vec, _ in cents) + ")"
    packed = "array(" + ",".join(
        f"named_struct('cn', {_sql_dbl(n)}, 'cell', {int(cell)})"
        for cell, _, n in cents
    ) + ")"
    return F.expr(
        f"zip_with({cents_mat}, {packed}, (c_vec, p) -> named_struct("
        f"'cos', round(aggregate(zip_with({vec}, c_vec, (a, b) -> a * b), "
        f"{_sql_dbl(0.0)}, (acc, v) -> acc + v) / ({norm} * p.cn), 5), "
        f"'cell', p.cell))"
    )


def _centroid_argmax(cents: list[tuple[int, list[float], float]], vec: str, norm: str):
    """cell id of the max-cosine centroid, as a PURE PROJECTION (cosines
    rounded to 5 dp before the argmax for cross-engine float-assoc
    safety); ties break to the SMALLEST cell id via the (cos, -cell)
    struct max."""
    entries = F.transform(
        _cell_cos_structs(cents, vec, norm),
        lambda s: F.struct(s["cos"].alias("cos"), (-s["cell"]).alias("negcell")),
    )
    best = F.array_max(entries)
    return (-best["negcell"]).alias("cell")


def _probe_cells(cents: list[tuple[int, list[float], float]], vec: str, norm: str, nprobe: int):
    """Array of the nprobe nearest cell ids (cos desc, cell asc) — also a
    pure projection: sort the struct array ascending on (-cos, cell) and
    slice."""
    entries = F.transform(
        _cell_cos_structs(cents, vec, norm),
        lambda s: F.struct((-s["cos"]).alias("negcos"), s["cell"].alias("cell")),
    )
    ranked = F.slice(F.array_sort(entries), 1, nprobe)
    return F.transform(ranked, lambda s: s["cell"]).alias("probe_cells")


def ivf_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse quantizer of
    ``n_cells`` centroids partitions the corpus into cells; each query
    probes its ``nprobe`` nearest cells and re-ranks exactly within them.
    The standard billion-vector scale path (FAISS IVF-Flat shape),
    expressed Spark-first:

    * seeds = the ``n_cells`` vectors with smallest md5(id) — the same
      deterministic-sampling trick as q51, so seeding is reproducible
      across engines/cluster sizes and SQL-mirrorable (no RNG, no
      kmeans|| nondeterminism);
    * ONE Lloyd refinement: assign-all (zero-shuffle literal projection),
      then per-(cell, dim) mean via posexplode — a partial-aggregable
      shuffle of scalar components, never whole vectors to one place;
      means rounded to 6 dp so an independent engine lands on identical
      centroids; empty cells drop out;
    * final assignment and query probing are again pure projections;
      candidates come from an equi-join on cell (query side broadcast) —
      the fact table shuffles ZERO times end-to-end.

    Recall < 1 by design (a true neighbor in an unprobed cell is missed);
    knobs: more cells → smaller cells (faster, lower recall at fixed
    nprobe), more probes → higher recall, linear candidate cost."""
    spark = vectors.sparkSession
    v = _norms(vectors, "neighbor_id", "nv", "nn", id_col, vec_col).persist()
    try:
        cents = _ivf_centroids(v, dim, n_cells)
        assigned = v.select("neighbor_id", "nv", "nn", _centroid_argmax(cents, "nv", "nn"))
        q = _norms(queries, query_id_col, "qv", "qn", query_id_col, vec_col)
        probes = q.select(
            query_id_col, "qv", "qn", _probe_cells(cents, "qv", "qn", nprobe)
        ).select(query_id_col, "qv", "qn", F.explode("probe_cells").alias("cell"))
        scored = (
            assigned.join(F.broadcast(probes), "cell")
            .where(F.col("neighbor_id") != F.col(query_id_col))
            .withColumn("cos", _safe_cos(_dot("nv", "qv"), "nn", "qn"))
        )
        w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
        result = (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, "neighbor_id", "rank", "cos")
        )
        return _finish_release(result, v)
    except Exception:
        v.unpersist()
        raise


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH (mean-centered), union of
    bucket-collision candidates, exact cosine re-rank. Recall < 1 by
    design; knobs: fewer planes → bigger buckets, more tables → higher
    recall at proportional candidate cost (classic L-table LSH)."""
    center = dataset_mean(vectors, dim, vec_col)
    # persist both sides: v feeds the bucket branch + the re-rank join and
    # Spark won't reuse exchanges across them; q is tiny
    # eager checkpoint for v: materialized once before the fan-out (AQE
    # cache-race guard) with flat downstream plans; q is tiny (persist)
    v = _norms(vectors, "neighbor_id", "nv", "nn", id_col, vec_col).localCheckpoint(eager=True)
    q = _norms(queries, query_id_col, "qv", "qn", query_id_col, vec_col).persist()
    # ALL tables' signatures in one projection + posexplode, then ONE
    # equi-join on (table, bucket): identical candidate set to the old
    # per-table join-union loop (t is part of the key), but 1 join job and
    # 1 pass over the corpus instead of n_tables of each — at sf0.1 the
    # per-table AQE jobs dominated wall (q203 driver gap 12 s / 41 jobs);
    # at scale one corpus pass instead of n_tables is strictly fewer bytes
    def _sigs(frame, vcol):
        return F.array(*[
            lsh_bucket_signature(frame, dim, n_planes, seed + 1000 * t, vcol, center)
            for t in range(n_tables)
        ])

    vt = v.select(
        "neighbor_id", F.posexplode(_sigs(v, "nv")).alias("t", "bucket")
    )
    qt = q.select(
        query_id_col, F.posexplode(_sigs(q, "qv")).alias("t", "bucket")
    )
    cands = (
        vt.join(F.broadcast(qt), ["t", "bucket"])
        .select(query_id_col, "neighbor_id")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .distinct()
    )
    scored = (
        cands.join(v, "neighbor_id")
        .join(F.broadcast(q), query_id_col)
        .withColumn("cos", _safe_cos(_dot("nv", "qv"), "nn", "qn"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos"), F.asc("neighbor_id"))
    result = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "rank", "cos")
    )
    return _finish_release(result, v, q)


def ann_recall(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Index-quality audit: recall@k of an approximate ANN result against
    the exact ground truth, per query.

    ``exact`` / ``approx`` are result frames in the shape returned by
    :func:`brute_force_topk` / :func:`ivf_ann_topk` / :func:`lsh_ann_topk`
    (one row per (query, neighbor)). Output: one row per query with the
    ground-truth size, hit count and ``recall_at_k = n_hits /
    min(k, n_exact)`` — normalized by the ACHIEVABLE hit count, so a
    perfect index on a corpus smaller than k still reports 1.0 (review
    finding).

    100 TB story: both inputs are top-k frames (≤ k rows per query), so
    the equi-join on (query, neighbor) and the per-query aggregate are
    O(|queries| · k) — the expensive leg is *producing* the exact ground
    truth, which recall evaluation runs over a query SAMPLE by design
    (this is the offline audit for q26/q53's online indexes)."""
    gt = exact.select(query_id_col, neighbor_col)
    ap = (
        approx.select(query_id_col, neighbor_col)
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        gt.join(ap, [query_id_col, neighbor_col], "left")
        .groupBy(query_id_col)
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hits"),
        )
        .withColumn(
            "recall_at_k",
            F.round(
                F.col("n_hits") / F.least(F.lit(k), F.col("n_exact")).cast("double"),
                9,
            ),
        )
    )


def _ivf_centroids(v: DataFrame, dim: int, n_cells: int) -> list[tuple[int, list[float], float]]:
    """Deterministic coarse quantizer shared by ivf_ann_topk and
    semdedup: seeds = the n_cells vectors with smallest md5(id) (the q51
    deterministic-sampling trick — reproducible across engines and
    cluster sizes), ONE Lloyd refinement with per-(cell, dim) means
    rounded to 6 dp so an independent engine lands on identical
    centroids. Driver handles <= n_cells*dim scalars; the corpus never
    shuffles. ``v`` is a _norms frame (neighbor_id, nv, nn)."""
    seeds = (
        v.orderBy(F.md5(F.col("neighbor_id").cast("string")), F.col("neighbor_id"))
        .limit(n_cells)
        .collect()
    )  # n_cells rows of dim doubles — trivially driver-safe
    cents0 = [
        (i + 1, [float(x) for x in r["nv"]], float(r["nn"])) for i, r in enumerate(seeds)
    ]
    assigned0 = v.select("neighbor_id", "nv", _centroid_argmax(cents0, "nv", "nn"))
    mean_rows = (
        assigned0.select("cell", F.posexplode("nv").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.round(F.avg("x"), 6).alias("m"))
        .collect()
    )  # <= n_cells*dim scalars
    by_cell: dict[int, list] = {}
    for r in mean_rows:
        by_cell.setdefault(r["cell"], [0.0] * dim)[r["dim"]] = float(r["m"])
    import math as _math

    return [
        (cell, vec, _math.sqrt(sum(x * x for x in vec)))
        for cell, vec in sorted(by_cell.items())
    ]


def ivf_assign_incremental(
    base: DataFrame,
    new: DataFrame,
    dim: int,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental IVF index maintenance: the coarse quantizer is built
    ONCE from the base corpus (same deterministic md5 seeds + one Lloyd
    step as :func:`ivf_ann_topk`, so an index built today reproduces
    bit-identically), then a NEW ingest batch is assigned to those
    FROZEN centroids by a pure projection — the daily-ingest path of a
    vector index (q79's incremental-MinHash twin for ANN): the base is
    scanned only for the centroid build, the new batch never shuffles,
    and the output is the (id, cell) postings the index table appends.
    Non-zero vectors are the contract, as for ivf_ann_topk (enforced
    upstream by the quality gates)."""
    vb = _norms(base, "neighbor_id", "nv", "nn", id_col, vec_col).persist()
    try:
        cents = _ivf_centroids(vb, dim, n_cells)
    finally:
        vb.unpersist()
    vn = _norms(new, "neighbor_id", "nv", "nn", id_col, vec_col)
    return vn.select(
        F.col("neighbor_id").alias(id_col),
        _centroid_argmax(cents, "nv", "nn"),
    )


def semdedup(
    vectors: DataFrame,
    dim: int,
    n_cells: int = 16,
    tau: float = 0.96,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 shape): semantic
    dedup of an embedding corpus by clustering THEN within-cluster
    pairwise cosine — the clustering bounds the quadratic stage to
    O(sum cell_i^2), the trick that makes semantic dedup feasible at
    LAION/LLM-corpus scale (k ~ sqrt(n) cells keeps cells ~sqrt(n)).

    Deterministic end to end (md5-seeded IVF quantizer, 6-dp centroid
    means, 4-dp cosines), so the RESULT — not just its size — is SQL
    value-hash oracle-able (q88): a row is a duplicate iff a SMALLER-id
    row in the SAME cell has cosine >= tau. Returns one row per input:
    (vec_id, cell, is_dup). The within-cell self-join shuffles on the
    cell id; a pathologically hot cell is the standard SemDeDup caveat —
    raise n_cells (paper uses k in the tens of thousands at 5B docs).
    """
    v = _norms(vectors, "neighbor_id", "nv", "nn", id_col, vec_col).persist()
    assigned = v  # rebound below; keeps the except-path unpersist total
    try:
        cents = _ivf_centroids(v, dim, n_cells)
        assigned = v.select(
            "neighbor_id", "nv", "nn", _centroid_argmax(cents, "nv", "nn")
        ).persist()
        a = assigned.select(
            F.col("neighbor_id").alias("aid"), F.col("nv").alias("av"),
            F.col("nn").alias("an"), "cell",
        )
        b = assigned.select(
            F.col("neighbor_id").alias("bid"), F.col("nv").alias("bv"),
            F.col("nn").alias("bn"), "cell",
        )
        dups = (
            a.join(b, "cell")
            .where(F.col("bid") < F.col("aid"))
            .where(
                _safe_cos(_dot("av", "bv"), "an", "bn")
                >= F.lit(tau)
            )
            .select(F.col("aid").alias("neighbor_id"))
            .distinct()
            .withColumn("dup", F.lit(1))
        )
        result = (
            assigned.join(dups, "neighbor_id", "left")
            .select(
                F.col("neighbor_id").alias(id_col),
                "cell",
                F.coalesce(F.col("dup"), F.lit(0)).alias("is_dup"),
            )
        )
        return _finish_release(result, assigned, v)
    except Exception:
        for df in (v, assigned):
            try:
                df.unpersist()
            except Exception:
                pass
        raise


def embedding_diversity(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-group embedding diversity WITHOUT the pairwise join: the mean
    pairwise dot product over a group follows from the sum-of-vectors
    identity  Σ_{i≠j} vᵢ·vⱼ = |Σv|² − Σ|v|²,  so one O(n·d) aggregate
    replaces the O(n²·d) all-pairs stage — the curation metric ("is this
    cluster/source redundant or diverse?") stays linear at corpus scale.

    EXACT across engines: components are fixed to integer micro-units
    (round(x·1e6) — float32→double conversion is exact), per-(group,dim)
    sums and squares accumulate as DECIMAL(38,0) (HUGEINT in the
    oracle), and the two final divisions are fixed-shape IEEE ops on
    exact operands. No float summation order anywhere.

    Output: (group, n_vecs, avg_sq_norm, mean_pairwise_dot) in original
    (unscaled) units, 6 dp. Groups with one vector report NULL
    mean_pairwise_dot (no pairs), not a 0/0.
    """
    e = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("dim", "x"),
    ).select(
        "grp",
        "vid",
        "dim",
        F.round(F.col("x").cast("double") * 1e6).cast("long").alias("v"),
    )
    vd = F.col("v").cast("decimal(38,0)")
    per_dim = e.groupBy("grp", "dim").agg(
        F.sum(vd).alias("s"), F.sum(vd * vd).alias("q")
    )
    per_grp = per_dim.groupBy("grp").agg(
        F.sum(F.col("s") * F.col("s")).alias("ss"), F.sum("q").alias("q")
    )
    # count only rows WITH a vector — NULL embeddings contribute no
    # moments, so counting them would deflate both averages
    n = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(vec_col).cast("long").alias("n_vecs")
    )
    nn = F.col("n_vecs")
    return per_grp.join(n, "grp").select(
        F.col("grp").alias(group_col),
        "n_vecs",
        F.round(
            F.col("q").cast("double") / nn.cast("double") / 1e12, 6
        ).alias("avg_sq_norm"),
        F.when(
            nn > 1,
            F.round(
                (F.col("ss") - F.col("q")).cast("double")
                / (nn * (nn - 1)).cast("double")
                / 1e12,
                6,
            ),
        ).alias("mean_pairwise_dot"),
    )


def hard_negatives(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the k
    nearest neighbors with a DIFFERENT label — the most-confusable
    negatives that make metric-learning batches informative (random
    negatives are trivially separable; hard ones carry the gradient).
    Complements q140's hash-bucketed random negatives.

    Same plan shape as q25's brute-force top-k (queries broadcast, the
    fact table never shuffles; swap in the IVF probe for the scale
    path); the label filter applies BEFORE ranking, so ranks index the
    negative list. Cosines are 4-dp rounded (the shared round_cos
    contract) with (cos desc, id asc) tiebreaks. NULL-label rows never
    qualify on either side (SQL <> semantics, stated)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).alias("q_label"),
    ).withColumn("qn", vec_norm(F.col("qv")))
    v = vectors.select(
        F.col(id_col).alias("neg_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
        F.col(label_col).alias("n_label"),
    ).withColumn("nn", vec_norm(F.col("nv")))
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(
            (F.col("neg_id") != F.col("query_id"))
            & (F.col("n_label") != F.col("q_label"))
        )
        .withColumn(
            "cos",
            round_cos(
                F.aggregate(
                    F.zip_with(F.col("nv"), F.col("qv"), lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                F.col("nn"),
                F.col("qn"),
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neg_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


def tfidf_cosine_pairs(
    df,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 2,
    df_cap: int = 20,
    min_df: int = 2,
    min_cosine: float = 0.3,
) -> DataFrame:
    """Sparse lexical similarity: IDF-weighted set cosine between
    documents, with RARE-SHINGLE BLOCKING for candidate generation —
    the inverted-index counterpart of the embedding ANN family (no
    embeddings needed).

    Mechanics: per-document distinct word ``shingle_n``-grams (the
    dedup-family shingle contract); weight = round(ln((N+1)/(df+1)) *
    1e6) as an INTEGER, so dot products and norms are exact BIGINT sums
    (no double accumulation order anywhere — the only doubles are two
    correctly-rounded sqrt calls and one division at the end).
    Candidates = pairs sharing at least one shingle with document
    frequency in [min_df, df_cap]; the full cosine then runs over ALL
    shared shingles of each candidate pair.

    Scale shape: every join is an equi-join (shingle, then doc key);
    the candidate stage is bounded by sum(df^2) over rare shingles —
    the df_cap makes the blocking stage subquadratic by construction,
    the same promise as MinHash banding but exact. A pair that shares
    only ubiquitous shingles is unreachable by design (document this to
    users: raise df_cap for higher recall at quadratic risk).
    """
    from ..plans.parallelism import ensure_min_parallelism
    from .dedup import word_shingles

    # NULL texts are excluded on BOTH sides: Spark's word_shingles(NULL)
    # would otherwise emit an empty-string shingle while DuckDB's
    # list_distinct strips the NULL — a cross-engine df disagreement
    #
    # shingling is the CPU-heaviest map stage of the operator and a
    # single-file input scans as ONE partition (measured: an 11 s
    # one-task shingle stage on the sf0.1 corpus) — the same small-input
    # guard _shingle_table applies
    sh = ensure_min_parallelism(df.where(F.col(text_col).isNotNull())).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    n_docs = df.count()  # one scalar to the driver, reused as a literal
    # dfc via a window over the shingle shuffle: ONE exchange of the
    # shingle table instead of groupBy + join-back (two). Same rows.
    dfreq_w = Window.partitionBy("shingle")
    w = F.round(
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("dfc") + 1.0))
        * F.lit(1_000_000.0),
        0,
    ).cast("long")
    par = df.sparkSession.sparkContext.defaultParallelism
    vec = (
        sh.withColumn("dfc", F.count(F.lit(1)).over(dfreq_w))
        .select("doc_id", "shingle", w.alias("w"), "dfc")
        # explicit width: AQE would coalesce this tiny-byte frame to ~1
        # partition and every downstream candidate explosion would run
        # single-task (measured: six concurrent 30 s one-task stages)
        .repartition(par, "doc_id")
        .persist()
    )
    # materialize ONCE before the 4-consumer fan-out: concurrent AQE
    # stage jobs otherwise race the cold cache and each recomputes the
    # full shingle pipeline (guide §5 caching note)
    vec.count()
    norms = vec.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("norm2")
    )
    rare = vec.where(
        (F.col("dfc") >= min_df) & (F.col("dfc") <= df_cap)
    ).select("doc_id", "shingle")
    cand = (
        rare.alias("x")
        .join(rare.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b")
        )
        .distinct()
    )
    va = vec.select(
        F.col("doc_id").alias("a"), "shingle", F.col("w").alias("wa")
    )
    vb = vec.select(
        F.col("doc_id").alias("b"), "shingle", F.col("w").alias("wb")
    )
    dots = (
        # explicit-width exchange on the pair table: the candidate rows are
        # tiny (two ids) so AQE coalesces them to ~1 partition, but the
        # join output explodes |cand| × |shingles(a)| — the single heaviest
        # intermediate of the operator must stay as wide as the pool
        cand.repartition(par, "a")
        .join(va, "a")
        .join(vb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(
            F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_shared"),
        )
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("norm2").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("norm2").alias("nb"))
    # a zero-norm side (every shingle ubiquitous -> all weights 0) can
    # only reach here when df_cap >= corpus df; score it 0, not NaN
    cos = F.when(
        (F.col("na") > 0) & (F.col("nb") > 0),
        F.round(
            F.col("dot").cast("double")
            / (
                F.sqrt(F.col("na").cast("double"))
                * F.sqrt(F.col("nb").cast("double"))
            ),
            6,
        ),
    ).otherwise(F.lit(0.0))
    result = (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            F.col("a").alias("doc_a"),
            F.col("b").alias("doc_b"),
            "n_shared",
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )
    return _finish_release(result, vec)


def kmeans_integer(
    emb: DataFrame,
    *,
    k: int = 8,
    rounds: int = 2,
    scale: int = 10**6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means with EXACT integer arithmetic — the one
    formulation an iterative clustering is cross-engine value-hash
    stable in: vectors quantize to ``scale``-scaled integers, every
    distance is an exact BIGINT sum of squared integer differences,
    centroid updates are per-dimension integer floor-divisions, ties in
    the argmin break by cluster id. Seeds are the ``k`` smallest ids
    (deterministic, no RNG).

    Output after ``rounds`` assign/update rounds: (vec_id, cluster_id,
    dist2) — the final assignment with its exact squared distance.

    Scale shape: the long layout (id, dim, component) shuffles once and
    persists; each round is one equi-join on dim against a k x dim
    centroid table (broadcast-sized by construction) + two map-side
    combinable aggregates. Centroids localCheckpoint per round so the
    iterative plan stays linear (graph.kcore precedent). Brute-force
    assignment is O(n * k * dim) — the IVF/LSH family is the scale path
    for large k; this is the exact small-k workhorse.

    Overflow contract: quantized components SATURATE at ±2^27 (±134.2
    at the default 1e6 scale) so a 64-dim squared distance can never
    exceed int64 (64 * (2^28)^2 = 2^62); embedding spaces are unit-ish,
    so saturation only fires on corrupt inputs — and identically in
    any engine.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kmeans_integer needs k >= 1 and rounds >= 1")
    clamp = 1 << 27
    pts = (
        emb.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.transform(
                    F.col(vec_col),
                    lambda x: F.greatest(
                        F.lit(-clamp).cast("long"),
                        F.least(
                            F.lit(clamp).cast("long"),
                            F.round(
                                x.cast("double") * F.lit(float(scale)), 0
                            ).cast("long"),
                        ),
                    ),
                )
            ).alias("dim", "pv"),
        )
        .persist()
    )
    # deterministic seeds: the k smallest ids, cluster ids 0..k-1.
    # limit(k) plans as TakeOrderedAndProject (per-partition top-k +
    # driver merge — no global sort); the row_number window then runs
    # over k rows only
    wseed = Window.orderBy("id")
    seeds = (
        emb.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("id"))
        .distinct()
        .orderBy("id")
        .limit(k)
        .withColumn("_r", F.row_number().over(wseed))
        .select("id", (F.col("_r") - 1).cast("int").alias("cid"))
    )
    cents = (
        pts.join(F.broadcast(seeds), "id")
        .select("cid", "dim", F.col("pv").alias("cv"))
        .localCheckpoint(eager=True)
    )
    assign = None
    try:
        for _ in range(rounds):
            d = (
                pts.join(F.broadcast(cents), "dim")
                .groupBy("id", "cid")
                .agg(
                    F.sum(
                        (F.col("pv") - F.col("cv"))
                        * (F.col("pv") - F.col("cv"))
                    ).cast("long").alias("dist2")
                )
            )
            assign = (
                d.groupBy("id")
                .agg(F.min(F.struct("dist2", "cid")).alias("_m"))
                .select(
                    "id",
                    F.col("_m.cid").alias("cid"),
                    F.col("_m.dist2").alias("dist2"),
                )
            )
            cents = (
                pts.join(assign.select("id", "cid"), "id")
                .groupBy("cid", "dim")
                .agg(
                    F.expr("sum(pv) DIV count(1)").cast("long").alias("cv")
                )
                # lazy: materialized by the next round's broadcast build /
                # the final checkpoint — rounds are a linear chain, so the
                # deferred plan stays shallow and each round saves a job
                .localCheckpoint(eager=False)
            )
        return assign.select(
            F.col("id").alias(id_col),
            F.col("cid").alias("cluster_id"),
            "dist2",
        ).localCheckpoint(eager=True)
    finally:
        pts.unpersist()
