"""Connected components / dedup clusters on hand-built graphs."""

from __future__ import annotations

import pytest

from e_commerce_lakehouse_spark.operators.graph import connected_components, dedup_clusters


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a: long, b: long")


def test_cc_cliques_chains_singleton_components(spark):
    # component {1,2,3} (clique), {10,11,12,13} (chain), {20,21} (pair)
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (12, 13), (20, 21)]
    got = {
        (r["node"], r["label"])
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10), (13, 10),
        (20, 20), (21, 20),
    }


def test_cc_long_chain_converges(spark):
    # worst case for label propagation: a 30-node path, min id at one end
    edges = [(i, i + 1) for i in range(100, 130)]
    labels = connected_components(_pairs(spark, edges)).collect()
    assert all(r["label"] == 100 for r in labels) and len(labels) == 31


def test_cc_max_iter_raises(spark):
    edges = [(i, i + 1) for i in range(1, 12)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_pairs(spark, edges), max_iter=2)


def test_dedup_clusters_sizes_and_canonical(spark):
    edges = [(5, 9), (9, 7), (30, 31)]
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in dedup_clusters(_pairs(spark, edges)).collect()}
    assert rows == {5: (5, 3), 9: (5, 3), 7: (5, 3), 30: (30, 2), 31: (30, 2)}


def test_cc_matches_union_find_on_random_graphs(spark):
    """Property: CC labels equal a pure-Python union-find's min-id labels
    on randomized graphs (seeded, deterministic)."""
    import random

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(1234)
    for trial in range(3):
        n_nodes = rng.randint(8, 40)
        nodes = rng.sample(range(1, 1000), n_nodes)
        edges = [
            tuple(rng.sample(nodes, 2))
            for _ in range(rng.randint(n_nodes // 2, n_nodes * 2))
        ]
        expected = union_find_labels(edges)
        got = {
            (r["node"], r["label"])
            for r in connected_components(_pairs(spark, edges)).collect()
        }
        assert got == set(expected.items()), f"trial {trial} diverged"


def test_cluster_representatives_elects_best_with_id_tiebreak(spark):
    from e_commerce_lakehouse_spark.operators.graph import cluster_representatives

    # components {1,2,3} and {10,11}; 2 is longest in the first; the
    # second ties on n_chars so the smaller id (10) must win
    edges = [(1, 2), (2, 3), (10, 11)]
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 70), (10, 40), (11, 40), (99, 999)],
        "doc_id: long, n_chars: long",
    )
    got = {
        (r["cluster_id"], r["rep_doc_id"], r["cluster_size"], r["rep_n_chars"])
        for r in cluster_representatives(docs, _pairs(spark, edges)).collect()
    }
    # doc 99 is in no pair: singletons are not emitted (dedup_clusters contract)
    assert got == {(1, 2, 3, 90), (10, 10, 2, 40)}
from e_commerce_lakehouse_spark.operators.graph import triangle_stats


def test_triangle_stats_k4_and_path(spark):
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b], "a long, b long"
    )
    r = triangle_stats(k4).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["transitivity"] == 1.0
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "a long, b long")
    r = triangle_stats(path).collect()[0]
    assert r["n_triangles"] == 0 and r["transitivity"] == 0.0
    # duplicate + reversed edges collapse; self-loops ignored
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3)], "a long, b long"
    )
    r = triangle_stats(messy).collect()[0]
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)
