"""Curation operators: decontamination, repetition stats, distributed
prefix sum / packing, stratified sampling.

The distributed_cumsum tests are the important ones: the op must agree
with a plain global window (the semantics) while its plan contains no
single-partition global-order exchange (the reason it exists)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators.curation import (
    decontaminate,
    distributed_cumsum,
    pack_sequences,
    repetition_stats,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox sat still", "en"),
        (3, "completely different words entirely here now", "en"),
        (4, "der schnelle braune fuchs springt hoch", "de"),
        (5, "spam spam spam spam spam spam", "en"),
        (6, "one", "de"),
        (7, "alpha beta gamma delta alpha beta gamma delta", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_decontaminate_flags_overlap(spark, docs):
    bench = docs.where("doc_id = 1")
    corpus = docs.where("doc_id != 1")
    out = {r["doc_id"]: r for r in decontaminate(corpus, bench).collect()}
    assert set(out) == {2, 3, 4, 5, 6, 7}
    # doc 2 shares the 3-gram "the quick brown" (and "quick brown fox")
    assert out[2]["contaminated"] and out[2]["n_hit_shingles"] == 2
    for d in (3, 4, 5, 6, 7):
        assert not out[d]["contaminated"] and out[d]["n_hit_shingles"] == 0


def test_repetition_stats_values(spark, docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 5: one word 6 times → everything duplicated
    assert out[5]["dup_word_frac"] == pytest.approx(1 - 1 / 6)
    assert out[5]["dup_2gram_frac"] == pytest.approx(1 - 1 / 5)
    assert out[5]["top_word_frac"] == 1.0
    assert not out[5]["gopher_pass"]
    # doc 3: all distinct → zero repetition, passes
    assert out[3]["dup_word_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0
    assert out[3]["gopher_pass"]
    # doc 1: 'the' twice in 9 words
    assert out[1]["n_words"] == 9
    assert out[1]["dup_word_frac"] == pytest.approx(1 - 8 / 9, abs=1e-6)
    # doc 6: single word → n-gram fractions defined as 0
    assert out[6]["dup_2gram_frac"] == 0.0 and out[6]["dup_3gram_frac"] == 0.0


def test_distributed_cumsum_matches_global_window(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 97 + 1).alias("v")
    )
    got = distributed_cumsum(df, order_col="k", value_col="v", out_col="c",
                             num_partitions=7)
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("c", F.sum("v").over(w).cast("long"))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert got.count() == 5000


def test_distributed_cumsum_plan_has_no_global_sort_window(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    plan = distributed_cumsum(df, order_col="k", value_col="v")._jdf.queryExecution().executedPlan().toString()
    # the data path must not contain a partition-less global-order Window;
    # the only Window allowed is over the numPartitions-row totals side
    for line in plan.splitlines():
        if "Window" in line and "_pmin" not in line:
            raise AssertionError(f"unexpected global window in plan: {line}")


def test_pack_sequences_chunk_arithmetic(spark):
    rows = [(i, " ".join(["w"] * n)) for i, n in [(1, 100), (2, 200), (3, 50), (4, 300)]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=256).collect()}
    assert out[1]["start_offset"] == 0 and out[1]["first_chunk"] == 0
    assert out[2]["start_offset"] == 100
    # doc 2 spans the 256 boundary: tokens 100..299 → chunks 0 and 1
    assert out[2]["first_chunk"] == 0 and out[2]["last_chunk"] == 1
    assert out[2]["n_chunks_spanned"] == 2
    assert out[3]["start_offset"] == 300 and out[3]["first_chunk"] == 1
    assert out[4]["start_offset"] == 350 and out[4]["last_chunk"] == 2


def test_stratified_sample_quota_and_determinism(spark, docs):
    out = stratified_sample(docs, strata_col="lang", cap_per_stratum=2)
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    assert all(len(v) <= 2 for v in by_lang.values())
    assert len(by_lang["en"]) == 2 and len(by_lang["de"]) == 2
    # deterministic under repartition
    again = stratified_sample(
        docs.repartition(5), strata_col="lang", cap_per_stratum=2
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_tfidf_scores(spark, docs):
    from e_commerce_lakehouse_spark.operators.curation import tfidf_doc_scores
    import math

    out = {r["doc_id"]: r for r in tfidf_doc_scores(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # doc 5 is one token repeated: 1 distinct token, mean == max
    assert out[5]["n_distinct_tokens"] == 1
    assert out[5]["mean_idf"] == out[5]["max_idf"]
    # 'spam' occurs only in doc 5 → idf = ln(8/2)
    assert out[5]["max_idf"] == pytest.approx(round(math.log(8 / 2), 6))
    # doc 3: six all-unique tokens
    assert out[3]["n_distinct_tokens"] == 6


def test_domain_mix_weights(spark):
    from e_commerce_lakehouse_spark.operators.curation import domain_mix_weights

    rows = [(i, "a" if i % 4 else "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = {r["source"]: r for r in domain_mix_weights(df, domain_col="source").collect()}
    assert out["a"]["n_docs"] == 75 and out["b"]["n_docs"] == 25
    assert out["a"]["actual_frac"] == 0.75 and out["a"]["target_frac"] == 0.5
    assert out["a"]["weight"] == pytest.approx(0.5 / 0.75, abs=1e-6)
    assert out["b"]["weight"] == pytest.approx(2.0, abs=1e-6)
    # explicit target map
    out2 = {r["source"]: r for r in domain_mix_weights(
        df, domain_col="source", target={"a": 0.9, "b": 0.1}).collect()}
    assert out2["a"]["target_frac"] == 0.9
    assert out2["b"]["weight"] == pytest.approx(0.1 / 0.25, abs=1e-6)


# ------------------------------------------------------------ round-4 s6


def test_length_outlier_filter_band(spark):
    from e_commerce_lakehouse_spark.operators.curation import length_outlier_filter

    # 21 docs in one source: percent_rank = (rank-1)/20, so lengths 100
    # (pct 0) and 300 (pct 1.0) fall outside [0.05, 0.95]; 110 (0.05) and
    # 290 (0.95) sit exactly ON the inclusive bounds and survive
    rows = [(i, "s0", "en", 100 + 10 * i) for i in range(21)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")
    kept = length_outlier_filter(df, lo=0.05, hi=0.95).collect()
    lens = sorted(r["n_chars"] for r in kept)
    assert lens == [100 + 10 * i for i in range(1, 20)]
    assert all(0.05 <= r["length_pct"] <= 0.95 for r in kept)


def test_length_outlier_filter_ties_share_rank(spark):
    from e_commerce_lakehouse_spark.operators.curation import length_outlier_filter

    # all-equal lengths: percent_rank = 0 for every row (rank 1), the
    # whole group survives a lo=0 band and dies under lo>0 — pure
    # function of the values, no ordering nondeterminism
    rows = [(i, "s0", "en", 200) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")
    assert length_outlier_filter(df, lo=0.0, hi=1.0).count() == 5
    assert length_outlier_filter(df, lo=0.01, hi=1.0).count() == 0


def test_weighted_sample_properties(spark):
    """A-ES: heavier rows sampled proportionally more; outcome
    deterministic and layout-independent; nonpositive weights excluded."""
    from e_commerce_lakehouse_spark.operators.curation import weighted_sample
    from pyspark.sql import functions as F

    df = spark.range(0, 4_000).select(
        F.col("id").alias("doc_id"),
        # 10% of rows carry 20x the weight
        F.when(F.col("id") % 10 == 0, 200).otherwise(10).alias("w"),
    )
    got = weighted_sample(df, weight_col="w", n=400, id_col="doc_id")
    rows = got.collect()
    assert len(rows) == 400
    heavy = sum(1 for r in rows if r["w"] == 200)
    # heavy rows are 10% of the population but ~20x likelier: expect a
    # strong majority of the sample (deterministic draw, generous band)
    assert heavy > 200, heavy
    # deterministic + partitioning-independent
    again = weighted_sample(df.repartition(13), weight_col="w", n=400,
                            id_col="doc_id")
    assert {r["doc_id"] for r in again.collect()} == {r["doc_id"] for r in rows}
    # zero/NULL weights never sampled
    df2 = df.withColumn("w", F.when(F.col("doc_id") < 3_900, None)
                        .otherwise(F.lit(0)))
    assert weighted_sample(df2, weight_col="w", n=10, id_col="doc_id").count() == 0


def test_chunk_documents_windows_and_overlap(spark):
    from e_commerce_lakehouse_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "x y z"), (3, "one")],
        "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, window_words=4, stride_words=3).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # full coverage with 1-word overlap: starts 0,3,6 over 10 words
    assert [r["chunk_text"] for r in by_doc[1]] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert all(r["n_chunks"] == 3 for r in by_doc[1])
    # short docs: exactly one (possibly short) chunk
    assert [(r["chunk_text"], r["n_words"]) for r in by_doc[2]] == [("x y z", 3)]
    assert [(r["chunk_text"], r["n_words"]) for r in by_doc[3]] == [("one", 1)]
    # every word of every doc appears in at least one chunk
    import itertools

    for doc, txt in [(1, " ".join(f"w{i}" for i in range(10)))]:
        covered = set(itertools.chain.from_iterable(
            r["chunk_text"].split(" ") for r in by_doc[doc]))
        assert covered == set(txt.split(" "))
    # guards
    import pytest as _pt

    with _pt.raises(ValueError, match="stride_words must be <="):
        chunk_documents(df, window_words=4, stride_words=5)


def test_bm25_scores_tiny_corpus(spark):
    """BM25 on a two-doc corpus against scalar-Python expectations
    (k1=1.2, b=0.75, Lucene-smoothed idf); docs matching no term are
    absent; n_matched_terms counts DISTINCT matched terms."""
    import math

    from e_commerce_lakehouse_spark.operators.curation import bm25_scores

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "c c")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["a", "b"]).collect()}
    assert set(got) == {1, 2}  # doc 3 matches nothing

    n, avgdl = 3, (3 + 2 + 2) / 3
    idf = {t: math.log(1 + (n - df + 0.5) / (df + 0.5))
           for t, df in {"a": 1, "b": 2}.items()}

    def term(tf, dl, t):
        return idf[t] * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert got[1]["n_matched_terms"] == 2
    assert got[1]["bm25"] == round(term(2, 3, "a") + term(1, 3, "b"), 6)
    assert got[2]["n_matched_terms"] == 1
    assert got[2]["bm25"] == round(term(1, 2, "b"), 6)

    import pytest

    with pytest.raises(ValueError, match="query term"):
        bm25_scores(docs, [])


def test_shard_shuffle_deterministic_and_layout_independent(spark):
    import hashlib

    from e_commerce_lakehouse_spark.operators.curation import shard_shuffle

    docs = spark.createDataFrame([(i,) for i in range(1, 201)], "doc_id: long")
    out = shard_shuffle(docs, n_shards=8, seed="ep1").collect()
    assert len(out) == 200

    # replay the permutation in pure python: shard + order are functions
    # of md5('ep1:' || id) and nothing else
    def ref(i):
        h = hashlib.md5(f"ep1:{i}".encode()).hexdigest()
        return int(h[:8], 16) % 8, h

    by_shard = {}
    for i in range(1, 201):
        s, h = ref(i)
        by_shard.setdefault(s, []).append((h, i))
    expect = {}
    for s, rows in by_shard.items():
        for pos, (_, i) in enumerate(sorted(rows), start=1):
            expect[i] = (s, pos)
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in out} == expect

    # partition-layout independence: a differently-split input yields
    # the identical permutation (the df.sample() failure mode)
    again = shard_shuffle(docs.repartition(13), n_shards=8, seed="ep1").collect()
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in again} == expect

    # a different seed draws a different permutation
    ep2 = shard_shuffle(docs, n_shards=8, seed="ep2").collect()
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in ep2} != expect


def test_shard_shuffle_rejects_bad_n(spark):
    import pytest as _pytest

    from e_commerce_lakehouse_spark.operators.curation import shard_shuffle

    docs = spark.createDataFrame([(1,)], "doc_id: long")
    with _pytest.raises(ValueError):
        shard_shuffle(docs, n_shards=0)


def test_perplexity_buckets_orders_repetitive_text_into_head(spark):
    from e_commerce_lakehouse_spark.operators.curation import perplexity_buckets

    # doc 0 is maximally predictable (one repeated bigram); docs 1-5 are
    # all-distinct word salad. The repetitive doc must score the LOWEST
    # cross-entropy and land in 'head'; a one-word doc emits no bigrams.
    rows = [(0, "a b " * 20 + "a b")] + [
        (i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(1, 6)
    ] + [(9, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 9 not in by_id                       # <2 tokens: no bigrams
    assert len(out) == 6
    assert min(by_id.values(), key=lambda r: r["cross_entropy"])["doc_id"] == 0
    assert by_id[0]["bucket"] == "head"
    # exact tertiles: 6 docs -> 2/2/2
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {"head": 2, "middle": 2, "tail": 2}


def test_perplexity_buckets_partitioning_invariant(spark):
    from e_commerce_lakehouse_spark.operators.curation import perplexity_buckets

    rows = [(i, " ".join(f"t{(i * 7 + j) % 13}" for j in range(15))) for i in range(30)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, perplexity_buckets(df1).collect()))
    b = sorted(map(tuple, perplexity_buckets(df1.repartition(8)).collect()))
    assert a == b and len(a) == 30


def test_quality_funnel_first_failure_attribution(spark):
    from e_commerce_lakehouse_spark.operators.curation import quality_funnel

    long_clean = " ".join(f"word{i}" for i in range(40))
    rows = [
        (0, long_clean, "en"),                              # keeps
        (1, "short", "en"),                                 # length
        (2, long_clean, "zh"),                              # lang
        (3, "spam " * 60, "en"),                            # repetition
        (4, long_clean + " mail bob@example.com end", "en"),  # pii
        (5, "x", "zh"),                                     # length BEFORE lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: (r["first_failed_rule"], r["keep"])
           for r in quality_funnel(df, min_chars=50, max_chars=500).collect()}
    assert out[0] == ("none", True)
    assert out[1] == ("length", False)
    assert out[2] == ("lang", False)
    assert out[3] == ("repetition", False)
    assert out[4] == ("pii", False)
    assert out[5] == ("length", False)   # fixed order: length outranks lang


def test_quality_funnel_null_rows_are_attributed_not_dropped(spark):
    from e_commerce_lakehouse_spark.operators.curation import quality_funnel

    long_clean = " ".join(f"word{i}" for i in range(40))
    rows = [(0, long_clean, "en"), (1, None, "en"), (2, long_clean, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r["first_failed_rule"]
           for r in quality_funnel(df, min_chars=50, max_chars=500).collect()}
    assert len(out) == 3                 # additive funnel: no silent drops
    assert out[1] == "length"            # null text fails the length band
    assert out[2] == "lang"              # null lang fails the allowlist


def test_perplexity_buckets_rejects_non_integral_ids_handles_negative(spark):
    from e_commerce_lakehouse_spark.operators.curation import perplexity_buckets

    sdf = spark.createDataFrame(
        [("a", "x y z w v u t s")], "doc_id string, text string"
    )
    with pytest.raises(TypeError):
        perplexity_buckets(sdf)
    # negative ids order numerically in the rank key (offset encoding)
    rows = [(i - 3, " ".join(f"t{(i * 5 + j) % 7}" for j in range(12))) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df).collect()
    assert len(out) == 9
    sizes = {}
    for r in out:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {"head": 3, "middle": 3, "tail": 3}


def test_exact_quantiles_nearest_rank_and_guards(spark):
    from e_commerce_lakehouse_spark.operators.curation import exact_quantiles

    # values 1..10: p50 -> rank 5 value 5; p90 -> rank 9; p100 -> rank 10
    rows = [(i, i) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    out = {r["quantile"]: (r["rank"], r["value"])
           for r in exact_quantiles(df, value_col="v", qs=(0.5, 0.9, 1.0)).collect()}
    assert out[0.5] == (5, 5)
    assert out[0.9] == (9, 9)
    assert out[1.0] == (10, 10)
    # partitioning invariance incl. duplicate values (tie by id)
    dup = spark.createDataFrame([(i, 7) for i in range(20)], "doc_id long, v long")
    a = sorted(map(tuple, exact_quantiles(dup, value_col="v").collect()))
    b = sorted(map(tuple, exact_quantiles(dup.repartition(8), value_col="v").collect()))
    assert a == b
    with pytest.raises(ValueError):
        exact_quantiles(df, value_col="v", qs=(0.0,))
    sdf = spark.createDataFrame([("a", 1)], "doc_id string, v long")
    with pytest.raises(TypeError):
        exact_quantiles(sdf, value_col="v")
    assert exact_quantiles(df.where("v > 99"), value_col="v").count() == 0


def test_grouped_exact_quantiles_per_group_targets(spark):
    from e_commerce_lakehouse_spark.operators.curation import grouped_exact_quantiles

    # group a: 1..4 (p50 -> rank 2 value 2); group b: 10..19 (p50 -> rank 5 value 14)
    rows = [(i, "a", i) for i in range(1, 5)] + [(100 + i, "b", 10 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, src string, v long")
    out = {(r["src"], r["quantile"]): (r["rank"], r["value"])
           for r in grouped_exact_quantiles(df, group_col="src", value_col="v",
                                            qs=(0.5, 1.0)).collect()}
    assert out[("a", 0.5)] == (2, 2)
    assert out[("a", 1.0)] == (4, 4)
    assert out[("b", 0.5)] == (5, 14)
    assert out[("b", 1.0)] == (10, 19)
    with pytest.raises(TypeError):
        grouped_exact_quantiles(
            spark.createDataFrame([(1, "a", 1.5)], "doc_id long, src string, v double"),
            group_col="src", value_col="v")
