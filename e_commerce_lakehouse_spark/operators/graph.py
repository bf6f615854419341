"""Connected components over near-duplicate pair lists — the dedup
endgame: turn "these pairs are near-dups" into "keep ONE canonical doc
per cluster".

Algorithm: min-label propagation with pointer jumping. Each round every
node takes the min over {own label, neighbors' labels, label of its
label}; the jump halves remaining path lengths, so a diameter-D graph
converges in O(log D) rounds (near-dup graphs are unions of small
cliques — 2-3 rounds in practice). Per round: two equi-joins + one
partial-aggregable min groupBy — plain shuffles on node ids, no
driver-side graph structure, so the same code runs on a billion-edge
pair list. Each round's state is an EAGER localCheckpoint (constant
lineage depth — an iterative dataflow that only persist()s overflows
the analyzer's stack once plans nest tens of rounds deep), and the
convergence count is the action that materializes it.

The reference has no graph stage at all (its dedup is `dropDuplicates`,
/root/reference/src/glue_jobs/orders_etl.py:121); this is the standard
web-scale extension (MinHash pairs → CC → canonical pick) every
training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
) -> DataFrame:
    """(node, label) for every node in ``pairs``; label = min node id in
    the component (deterministic canonical id). Converges in
    ~log2(diameter)+2 rounds thanks to pointer jumping (default cap 30
    covers diameters up to ~2^28); raises if it doesn't converge."""
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .unionByName(pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst")))
        .distinct()
        # localCheckpoint, not persist: cuts the (often deep — e.g. a
        # whole near-dup pair pipeline) upstream plan out of every
        # round's analysis; see kcore note
        .localCheckpoint(eager=False)
    )
    # every round's state is an EAGER localCheckpoint, not a persist():
    # iterative dataflows must truncate lineage each round — cached-but-
    # unbroken lineage makes the logical plan (and the planner's stack)
    # grow linearly with rounds, which at ~30 rounds overflows the
    # analyzer on a long-chain graph. Checkpoint blocks from superseded
    # rounds are dereferenced here and GC'd by Spark's ContextCleaner.
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        # lazy: the round's convergence count() materializes the
        # checkpoint, one job per round instead of two (kcore precedent)
        .localCheckpoint(eager=False)
    )
    try:
        for _ in range(max_iter):
            msgs = edges.join(
                labels.withColumnRenamed("node", "src"), "src"
            ).select(F.col("dst").alias("node"), "label")
            # pointer jumping ("shortcutting"): also adopt the label OF my
            # label — every label is itself a node id, so one self-join
            # halves the remaining path length and a diameter-D graph
            # converges in O(log D) rounds instead of O(D) (the classic
            # PRAM/Hash-to-Min trick; a 1000-hop chain needs ~10 rounds)
            jump = (
                labels.alias("x")
                .join(
                    labels.select(
                        F.col("node").alias("label"), F.col("label").alias("label2")
                    ),
                    "label",
                )
                .select("node", F.col("label2").alias("label"))
            )
            new_labels = (
                labels.unionByName(msgs)
                .unionByName(jump)
                .groupBy("node")
                .agg(F.min("label").alias("label"))
                .localCheckpoint(eager=False)  # materialized by the count below
            )
            # convergence check on two constant-depth checkpointed sides;
            # at web scale swap the join for a checksum agg (sum of
            # labels) — same single extra stage
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("label", "old_label"), "node"
                )
                .where(F.col("label") != F.col("old_label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    finally:
        pass  # checkpoint blocks are GC'd by the ContextCleaner on deref


def dedup_clusters(
    pairs: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 30,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every doc that appears in a
    near-dup pair; cluster_id = min doc id of the component (the
    canonical survivor a keep-one policy retains). Docs in no pair are
    singletons by definition and are not emitted (join them back with a
    left join + coalesce(cluster_id, doc_id) if needed)."""
    cc = connected_components(pairs, src=src, dst=dst, max_iter=max_iter)
    sizes = cc.groupBy("label").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "label").select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        "cluster_size",
    )


def cluster_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Keep-one-per-cluster: the dedup endgame after
    ``dedup_clusters``. For every near-dup component, elect the single
    document a keep-best policy retains — highest ``quality_col``,
    ties broken by smallest id — and emit
    (cluster_id, rep_doc_id, cluster_size, rep_<quality_col>).

    Composes the pair graph (MinHash-LSH / SimHash / Jaccard) with the
    corpus quality signal: "drop every duplicate but the best copy" is
    this result anti-joined back onto the member list. Scale shape: the
    quality join is an equi-join on the doc id (cluster membership is a
    vanishing fraction of a deduplicated corpus, so the cluster side
    broadcasts in practice), and the election is one window over
    cluster_id — O(members), never O(corpus). DuckDB-oracled as q103.
    """
    clusters = dedup_clusters(pairs, src=src, dst=dst)
    joined = clusters.join(
        docs.select(F.col(id_col).alias("doc_id"), F.col(quality_col)),
        "doc_id",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(quality_col), F.col("doc_id")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("rep_doc_id"),
            "cluster_size",
            F.col(quality_col).alias(f"rep_{quality_col}"),
        )
    )


def triangle_stats(
    edges: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Exact global triangle count and transitivity of an undirected
    simple graph — the clustering diagnostic for co-purchase /
    co-occurrence graphs ("is this graph community-structured or
    hairball?").

    Canonicalizes input rows to a<b and dedups, so multi-edges and
    orientation never double-count. Triangles enumerate in the single
    canonical orientation a<b<c: E(a,b) ⋈_b E(b,c) builds each wedge
    once, then one equi-join against E(a,c) closes it — every stage an
    equi-join, never a cartesian. Wedge total Σ d(d−1) stays exact in
    DECIMAL(38,0); transitivity = 3·T / (Σd(d−1)/2) = 6T/Σd(d−1) is ONE
    division. For power-law graphs at corpus scale, cap or split hub
    vertices (degree-ordered orientation) before the wedge join — the
    canonical a<b<c form already halves wedge fan-out vs naive.

    Output: one row (n_nodes, n_edges, n_triangles, transitivity);
    transitivity NULL when the graph has no wedges.
    """
    a, b = F.col(a_col), F.col(b_col)
    ed = (
        edges.where(a.isNotNull() & b.isNotNull() & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .persist()
    )
    deg = (
        ed.select(F.col("a").alias("v"))
        .unionAll(ed.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum((F.col("d") * (F.col("d") - 1)).cast("decimal(38,0)")).alias(
            "w2"
        ),
    )
    wedges = ed.alias("e1").join(
        ed.alias("e2"), F.col("e1.b") == F.col("e2.a")
    ).select(F.col("e1.a").alias("a"), F.col("e2.b").alias("b"))
    tri = wedges.join(ed, ["a", "b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    n_edges = ed.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    result = counts.crossJoin(n_edges).crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.when(
            F.col("w2") > 0,
            F.round(
                (F.lit(6) * F.col("n_triangles")).cast("double")
                / F.col("w2").cast("double"),
                6,
            ),
        ).alias("transitivity"),
    )
    # materialize the 1-row result eagerly, then release the edge cache
    # (the dedup._finish_release pattern)
    try:
        return result.localCheckpoint(eager=True)
    finally:
        ed.unpersist()


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    a_col: str = "a",
    b_col: str = "b",
    scale: int = 10**12,
) -> DataFrame:
    """PageRank over an undirected simple graph with EXACT integer
    arithmetic — the one formulation an iterative rank can be
    cross-engine value-hash stable in: ranks live as integer mass
    (``scale`` total), every contribution is a FLOOR division
    (rank div degree), and the damping update is integer percent
    arithmetic, so no float ever enters the loop and summation order
    cannot matter. Floor-division leaks a deterministic dust of mass
    per step (< degree per node per iteration at scale 1e12 — noise at
    the 12th decimal); both engines leak identically.

    Scale shape per iteration: one edges⋈ranks equi-join + one
    map-side-combinable groupBy(dst) — the standard distributed
    PageRank step. Edges and per-round ranks are LAZY localCheckpoints,
    not persists: a persist keeps the FULL upstream logical plan (for
    q165 the whole copurchase pipeline) inside every round's analysis,
    and each round references ranks twice, so the nested plan grows
    2^rounds — the checkpoint flattens each round to a scan (the kcore
    fix; everything materializes inside the single final action).
    Fixed ``iterations`` (default 3) keeps the plan finite and the
    DuckDB oracle an unrolled CTE chain.

    Output: (node, rank_scaled BIGINT, rank DOUBLE round 9).
    """
    a, b = F.col(a_col), F.col(b_col)
    und = edges.where(a.isNotNull() & b.isNotNull() & (a != b)).select(
        F.least(a, b).alias("x"), F.greatest(a, b).alias("y")
    ).distinct()
    e = und.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    )
    e = e.localCheckpoint(eager=False)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes_df = deg.agg(F.count(F.lit(1)).alias("n"))
    # init: equal integer share of the mass (floor; dust dropped
    # identically in both engines)
    r = deg.crossJoin(F.broadcast(n_nodes_df)).select(
        "src",
        "deg",
        F.expr(f"{scale} div n").alias("rank_s"),
        F.col("n"),
    ).localCheckpoint(eager=False)
    base_term = f"(({scale} div n) * {100 - damping_pct}) div 100"
    for _ in range(iterations):
        contrib = r.select(
            "src", F.expr("rank_s div deg").alias("c")
        ).join(e, "src").select(F.col("dst").alias("src"), "c")
        inflow = contrib.groupBy("src").agg(
            F.sum(F.col("c").cast("decimal(38,0)"))
            .cast("long")
            .alias("inflow")
        )
        r = (
            r.select("src", "deg", "n")
            .join(inflow, "src", "left")
            .select(
                "src",
                "deg",
                "n",
                F.expr(
                    f"{base_term} + ({damping_pct} *"
                    " coalesce(inflow, 0)) div 100"
                ).alias("rank_s"),
            )
            .localCheckpoint(eager=False)
        )
    result = r.select(
        F.col("src").alias("node"),
        F.col("rank_s").cast("long").alias("rank_scaled"),
        F.round(F.col("rank_s").cast("double") / float(scale), 9).alias(
            "rank"
        ),
    )
    # checkpoint blocks are GC'd by the ContextCleaner on deref
    return result.localCheckpoint(eager=True)


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """k-core peeling with a FIXED round count: repeatedly drop nodes
    whose degree (within the currently-alive induced subgraph) is < k.
    Peeling is monotone — dead nodes never revive — so ``rounds``
    iterations give the exact k-core whenever the peel converges within
    them, and a deterministic superset otherwise (document the round
    budget to users; the oracle unrolls the identical chain).

    Output: (node, degree) for nodes alive after the final round, with
    their degree at the final peel.

    Scale shape per round: one edges⋈alive equi-join per endpoint +
    one map-side-combinable degree aggregate — the standard distributed
    peel; alive sets persist per round to cut lineage (released before
    return). No float anywhere; cross-engine value-hash stable.
    """
    if k < 1 or rounds < 1:
        raise ValueError("kcore needs k >= 1 and rounds >= 1")
    a, b = F.col(a_col), F.col(b_col)
    und = (
        edges.where(a.isNotNull() & b.isNotNull() & (a != b))
        .select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .distinct()
    )
    # localCheckpoint, not persist: a persist keeps the FULL upstream
    # logical plan (for q193 that is the whole copurchase pipeline) alive
    # in every round's analysis — with AQE each round's jobs re-analyze
    # it, and driver planning dominated the operator's wall. The
    # checkpoint cuts lineage so each round plans over a flat scan.
    e = und.select(F.col("x").alias("src"), F.col("y").alias("dst")).unionAll(
        und.select(F.col("y").alias("src"), F.col("x").alias("dst"))
    ).localCheckpoint(eager=False)
    # each round references the alive set TWICE (src and dst joins), so
    # a persist alone leaves a 2^rounds logical plan — localCheckpoint
    # per round cuts lineage to keep analysis linear; the checkpointed
    # blocks are node-set sized (bounded) and GC'd once dereferenced
    # LAZY localCheckpoint + count: the count action materializes the
    # checkpoint, so each round costs ONE job instead of two (the eager
    # form ran a checkpoint job and then a count job per round — at bench
    # scale job dispatch was half the operator's wall)
    alive = e.select("src").distinct().localCheckpoint(eager=False)
    n_alive = alive.count()
    deg = None
    try:
        for _ in range(rounds):
            live = e.join(alive, "src").join(
                alive.select(F.col("src").alias("dst")), "dst"
            )
            deg = live.groupBy("src").agg(
                F.count(F.lit(1)).cast("long").alias("degree")
            )
            alive = (
                deg.where(F.col("degree") >= k)
                .select("src")
                .localCheckpoint(eager=False)
            )
            n_next = alive.count()
            if n_next == n_alive:
                # peeling is monotone: an unchanged alive COUNT means an
                # unchanged alive SET — fixed point, the exact k-core
                break
            n_alive = n_next
        out = deg.where(F.col("degree") >= k).select(
            F.col("src").alias("node"), "degree"
        )
        return out.localCheckpoint(eager=True)
    finally:
        pass  # checkpoint blocks are GC'd by the ContextCleaner on deref
