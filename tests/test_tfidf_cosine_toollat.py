"""Closed-form and plan-shape tests for q191 (IDF-weighted set cosine
with rare-shingle blocking) and the q192 tool-latency derivation."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.similarity import tfidf_cosine_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected_cosine(corpus, a, b, df_cap=20, min_df=2):
    """Brute-force mirror with the identical integer-weight contract."""
    import itertools

    def shingles(t):
        w = t.strip().lower().split()
        if len(w) >= 2:
            return set(f"{w[i]} {w[i+1]}" for i in range(len(w) - 1))
        return {" ".join(w)}

    sets = {d: shingles(t) for d, t in corpus}
    n = len(corpus)
    dfc = {}
    for s in itertools.chain.from_iterable(sets.values()):
        dfc[s] = dfc.get(s, 0) + 1
    wgt = {s: round(math.log((n + 1.0) / (c + 1.0)) * 1_000_000) for s, c in dfc.items()}
    # candidate reachable?
    shared_rare = {
        s for s in sets[a] & sets[b] if min_df <= dfc[s] <= df_cap
    }
    if not shared_rare:
        return None
    dot = sum(wgt[s] * wgt[s] for s in sets[a] & sets[b])
    na = math.sqrt(sum(wgt[s] ** 2 for s in sets[a]))
    nb = math.sqrt(sum(wgt[s] ** 2 for s in sets[b]))
    return round(dot / (na * nb), 6)


def test_tfidf_cosine_identical_docs_score_one(spark):
    corpus = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),
        (3, "zeta eta theta iota"),
        (4, "one two three four"),
    ]
    out = {
        (r.doc_a, r.doc_b): r
        for r in tfidf_cosine_pairs(
            _docs(spark, corpus), min_cosine=0.0
        ).collect()
    }
    assert (1, 2) in out
    assert out[(1, 2)].cosine == 1.0
    assert out[(1, 2)].n_shared == 3  # 3 bigrams
    # docs sharing no shingle are unreachable
    assert (3, 4) not in out


def test_tfidf_cosine_matches_bruteforce(spark):
    corpus = [
        (1, "a b c d e"),
        (2, "a b c x y"),
        (3, "c d e f g"),
        (4, "p q r s t"),
        (5, "p q r s t"),
    ]
    got = {
        (r.doc_a, r.doc_b): r.cosine
        for r in tfidf_cosine_pairs(
            _docs(spark, corpus), min_cosine=0.0
        ).collect()
    }
    for a, b in [(1, 2), (1, 3), (4, 5)]:
        exp = _expected_cosine(corpus, a, b)
        assert exp is not None
        assert got[(a, b)] == exp
    # (2,3) share only shingle-less overlap? 'c d'? doc2 has 'c x', doc3
    # starts 'c d' -> doc1&3 share 'c d','d e'; doc2&3 share none.
    assert (2, 3) not in got


def test_tfidf_cosine_df_cap_blocks_ubiquitous_shingles(spark):
    # every doc shares 'x y' -> with df_cap below corpus size the pair
    # generation must NOT fall back to an all-pairs join on it
    corpus = [(i, f"x y unique{i} tail{i}") for i in range(1, 7)]
    out = tfidf_cosine_pairs(
        _docs(spark, corpus), df_cap=3, min_cosine=0.0
    ).collect()
    assert out == []  # the only shared shingle has df 6 > cap 3


def test_tfidf_cosine_plan_has_no_cartesian(spark, monkeypatch):
    # patch out the localCheckpoint so the assertion sees the REAL join
    # plan (post-checkpoint plans are just an RDD scan — vacuously clean)
    import e_commerce_lakehouse_spark.operators.similarity as simmod

    monkeypatch.setattr(
        simmod, "_finish_release", lambda result, *cached: result
    )
    df = _docs(spark, [(1, "a b c"), (2, "a b d")])
    plan = (
        tfidf_cosine_pairs(df, min_cosine=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" in plan  # the real plan, not a checkpoint scan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tool_latency_is_gap_to_next_turn(spark):
    # direct check of the q192 derivation on a fabricated transcript
    from e_commerce_lakehouse_spark.operators.curation import (
        grouped_exact_quantiles,
    )
    from pyspark.sql import Window

    tr = spark.createDataFrame(
        [
            ("c1", 0, "user", "q", None, 0),
            ("c1", 1, "tool", "r", "search", 100),
            ("c1", 2, "assistant", "a", None, 103),  # search: 3 s
            ("c1", 3, "tool", "r", "search", 200),
            ("c1", 4, "assistant", "a", None, 209),  # search: 9 s
            ("c1", 5, "tool", "r", "fetch", 300),    # trailing: dropped
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, sec long",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = tr.select(
        "conv_id", "turn_idx", "role", "tool",
        F.unix_micros(F.col("ts")).alias("ts_us"),
    ).withColumn("next_ts", F.lead("ts_us").over(w))
    lat = t.where(
        (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("next_ts").isNotNull()
    ).select(
        "tool",
        (F.col("next_ts") - F.col("ts_us")).alias("lat_us"),
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")).alias("tid"),
    )
    rows = grouped_exact_quantiles(
        lat, group_col="tool", value_col="lat_us", id_col="tid", qs=(0.5, 0.95)
    ).collect()
    vals = {(r.tool, r.quantile): r.value for r in rows}
    # two samples (3s, 9s): p50 -> rank ceil(0.5*2)=1 -> 3s; p95 ->
    # rank ceil(1.9)=2 -> 9s; the trailing fetch has no next turn
    assert vals == {("search", 0.5): 3_000_000, ("search", 0.95): 9_000_000}
