"""Seeded randomized differential tests: graph.kcore and
dedup.dup_span_audit against pure-Python brute-force references."""

from __future__ import annotations

import random

from e_commerce_lakehouse_spark.operators.dedup import dup_span_audit
from e_commerce_lakehouse_spark.operators.graph import kcore


def _brute_kcore(edges, k):
    """Exact k-core by repeated peeling to a fixed point."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        dead = {n for n in alive if len(adj[n] & alive) < k}
        if not dead:
            break
        alive -= dead
    return {n: len(adj[n] & alive) for n in alive}


def test_kcore_matches_bruteforce_random_graphs(spark):
    # rounds=16 caps the budget; the early convergence exit means the
    # loop stops at the fixed point (a few rounds on these densities)
    for seed in (3, 17):
        rng = random.Random(seed)
        nodes = list(range(30))
        edges = set()
        for _ in range(70):
            a, b = rng.sample(nodes, 2)
            edges.add((min(a, b), max(a, b)))
        edges = sorted(edges)
        df = spark.createDataFrame(edges, "a long, b long")
        for k in (2, 3):
            got = {
                r.node: r.degree
                for r in kcore(df, k=k, rounds=16).collect()
            }
            assert got == _brute_kcore(edges, k), (seed, k)


def _brute_dup_spans(corpus, L):
    """Exact duplicated-span coverage via per-position gram counting."""
    from collections import Counter

    counts = Counter()
    for _, text in corpus:
        for i in range(len(text) - L + 1):
            counts[text[i:i + L]] += 1
    out = {}
    for doc_id, text in corpus:
        marked = [False] * len(text)
        for i in range(len(text) - L + 1):
            if counts[text[i:i + L]] >= 2:
                for j in range(i, i + L):
                    marked[j] = True
        if not any(marked):
            continue
        spans = 0
        prev = False
        for m in marked:
            if m and not prev:
                spans += 1
            prev = m
        dup_chars = sum(marked)
        out[doc_id] = (
            spans,
            dup_chars,
            dup_chars * 1_000_000 // len(text),
        )
    return out


def test_dup_span_matches_bruteforce_random_corpora(spark):
    for seed in (5, 23):
        rng = random.Random(seed)
        vocab = "abcdef"
        corpus = []
        for d in range(12):
            n = rng.randrange(15, 60)
            corpus.append(
                (d, "".join(rng.choice(vocab) for _ in range(n)))
            )
        # plant a shared block so spans exist
        block = "".join(rng.choice(vocab) for _ in range(25))
        corpus[2] = (2, corpus[2][1] + block)
        corpus[7] = (7, block + corpus[7][1])
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_dup_spans, r.dup_chars, r.dup_frac_ppm)
            for r in dup_span_audit(df, gram_chars=12).collect()
        }
        assert got == _brute_dup_spans(
            [c for c in corpus if len(c[1]) >= 12], 12
        ), seed
