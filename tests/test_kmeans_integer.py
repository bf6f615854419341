"""Closed-form tests for q198: exact integer Lloyd k-means."""

from __future__ import annotations

import pytest

from e_commerce_lakehouse_spark.operators.similarity import kmeans_integer


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_two_obvious_clusters(spark):
    # two tight groups far apart; seeds = ids 1 and 2 (one in each
    # group by construction)
    rows = [
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [0.1, 0.0]),
        (4, [0.0, 0.1]),
        (5, [10.1, 10.0]),
        (6, [10.0, 10.1]),
    ]
    out = {r.vec_id: r for r in kmeans_integer(_emb(spark, rows), k=2, rounds=2).collect()}
    g0 = {v for v, r in out.items() if r.cluster_id == out[1].cluster_id}
    g1 = {v for v, r in out.items() if r.cluster_id == out[2].cluster_id}
    assert g0 == {1, 3, 4}
    assert g1 == {2, 5, 6}
    assert out[1].cluster_id != out[2].cluster_id


def test_kmeans_dist2_exact_integer(spark):
    # seed centroids are the points themselves in round 1; after the
    # update, centroid of {(0,0),(0.000002,0)} is (1,0) in 1e6-units ->
    # dist2 to (0,0) is exactly 1
    rows = [(1, [0.0, 0.0]), (2, [0.000002, 0.0])]
    out = {r.vec_id: r for r in kmeans_integer(_emb(spark, rows), k=1, rounds=2).collect()}
    assert out[1].cluster_id == 0 and out[2].cluster_id == 0
    assert out[1].dist2 == 1 and out[2].dist2 == 1


def test_kmeans_argmin_tiebreak_by_cluster_id(spark):
    # a point equidistant from both seeds must land in the LOWER cid
    rows = [(1, [0.0]), (2, [2.0]), (3, [1.0])]
    out = {r.vec_id: r.cluster_id for r in kmeans_integer(_emb(spark, rows), k=2, rounds=1).collect()}
    assert out[3] == 0  # tie (1e6)^2 both sides -> cid 0


def test_kmeans_validates(spark):
    e = _emb(spark, [(1, [0.0])])
    with pytest.raises(ValueError):
        kmeans_integer(e, k=0)
    with pytest.raises(ValueError):
        kmeans_integer(e, k=1, rounds=0)
