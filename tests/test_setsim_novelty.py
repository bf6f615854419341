"""Unit tests for the exact set-similarity join (prefix filtering) and
shingle novelty — semantics the differential fuzz gate can't state
directly: prefix-filter losslessness vs an in-test brute force, the
no-cartesian plan shape, and novelty's first-seen accounting.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.dedup import (
    set_similarity_join,
    shingle_novelty,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta zeta"),          # J(1,2)=4/6
    (3, "alpha beta gamma delta epsilon"),       # exact dup of 1: J=1
    (4, "omega psi chi phi upsilon tau"),        # disjoint from 1-3
    (5, "omega psi chi phi upsilon"),            # J(4,5)=5/6
    (6, "alpha alpha alpha beta beta gamma"),    # multiset -> set {a,b,g}
    (7, "solo"),
    (8, "solo"),                                 # J(7,8)=1 on single-token sets
    (9, ""),                                     # empty -> {''} token
]


def _docs_df(spark):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _brute_pairs(threshold):
    sets = {i: set(t.strip().lower().split()) or {""} for i, t in DOCS}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = round(inter / len(sets[a] | sets[b]), 6)
        if j >= threshold:
            out[(a, b)] = j
    return out


@pytest.mark.parametrize("threshold", [0.5, 0.66, 0.8, 1.0])
def test_prefix_filter_matches_brute_force(spark, threshold):
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in set_similarity_join(_docs_df(spark), threshold=threshold).collect()
    }
    assert got == _brute_pairs(threshold)


def test_setsim_length_filter_boundary(spark):
    """The PPJoin length filter (min(sz) >= t*max(sz)) must be a
    NECESSARY-condition prune, never lossy at the boundary: a strict
    subset pair sits exactly at J = |A|/|B| and must survive a
    threshold equal to that ratio (>=, not >), while a smaller subset
    of the same doc must be dropped by the same filter."""
    docs = [
        (1, "a b c d e f g h i j"),   # 10 tokens
        (2, "a b c d e f g h"),       # subset, J(1,2)=8/10=0.8
        (3, "a b c"),                 # subset, J(1,3)=3/10=0.3
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in set_similarity_join(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 0.8}


def test_setsim_plan_has_no_cartesian(spark):
    plan = set_similarity_join(_docs_df(spark), threshold=0.8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_novelty_first_seen_accounting(spark):
    df = spark.createDataFrame(
        [
            (10, "one two three four", "en", "s", 18),
            (20, "one two three four", "en", "s", 18),  # exact dup, later id
            (30, "five six seven eight", "en", "s", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in shingle_novelty(df, n=3).collect()}
    # doc 10: both 3-gram shingles first seen here
    assert rows[10]["n_shingles"] == 2 and rows[10]["novelty"] == 1.0
    # doc 20: identical shingles, all first seen in doc 10
    assert rows[20]["n_novel"] == 0 and rows[20]["novelty"] == 0.0
    assert rows[30]["novelty"] == 1.0


def test_novelty_short_doc_single_shingle(spark):
    df = spark.createDataFrame(
        [(1, "only two", "en", "s", 8)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = shingle_novelty(df, n=3).collect()
    assert len(r) == 1 and r[0]["n_shingles"] == 1 and r[0]["novelty"] == 1.0


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_new_join_ops_have_no_cartesian(spark):
    """Plan-shape pins: the pair/wedge/bucket joins in the round-5 ops
    stay equi-joins. (1-row broadcast crossJoins of scalar aggregates
    are benign and allowed — only CartesianProduct is banned; the
    negative-sampling bucket join additionally bans nested-loop.)"""
    from pyspark.sql import functions as F

    from e_commerce_lakehouse_spark.operators.curation import negative_sampling
    from e_commerce_lakehouse_spark.operators.graph import triangle_stats
    from e_commerce_lakehouse_spark.operators.text import pmi_pairs

    docs = spark.createDataFrame(
        [(i, "a b c d", "en", "s", 7) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert "CartesianProduct" not in _plan(pmi_pairs(docs, min_pair_docs=1))

    edges = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    assert "CartesianProduct" not in _plan(triangle_stats(edges))

    pos = spark.createDataFrame([(1, 1), (2, 2)], "user_id long, item_id long")
    items = spark.createDataFrame([(i,) for i in range(10)], "item_id long")
    p = _plan(negative_sampling(pos, items, k=2, n_buckets=2))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
