"""Training-data operators: dedup family, similarity, text analysis.
Planted-duplicate fixtures with known answers; LSH recall asserted
against the brute-force baseline."""

import pytest
from pyspark.sql import functions as F

from e_commerce_lakehouse_spark.operators import dedup as dd
from e_commerce_lakehouse_spark.operators import similarity as sim
from e_commerce_lakehouse_spark.operators import text as tx

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different words entirely here now"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "der hund und die katze und der vogel"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_finds_planted_duplicate(docs):
    out = {r["doc_id"]: r["n_copies"] for r in dd.exact_dedup(docs).collect()}
    assert out[0] == 2          # doc 3 collapsed into doc 0
    assert 3 not in out
    assert out[1] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    # exact full-set Jaccard is the DEFAULT (matches the function name)
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] < 1.0
    assert (0, 2) not in pairs


def test_ngram_jaccard_df_cut_opt_in(spark):
    # a stop-shingle present in >half the corpus must be cut when the
    # caller opts in with max_df_frac=0.5:
    # docs 0..3 share 'the cat sat'; only 0,1 share the rest of the text
    rows = [
        (0, "the cat sat on a red mat tonight"),
        (1, "the cat sat on a red mat today"),
        (2, "the cat sat under a blue box alone"),
        (3, "the cat sat with a green hat again"),
        (4, "completely different words everywhere now truly"),
        (5, "another unrelated document body text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in
           dd.ngram_jaccard_pairs(df, threshold=0.3, max_df_frac=0.5).collect()}
    # 'the cat sat' (and 'cat sat on' etc. appearing in ≤3 docs survive the
    # 0.5 cut at n=6 docs; 'the cat sat' appears in 4 > 3 → cut), so the
    # 0-1 pair must rest on their genuinely-shared tail, not the stop-gram
    assert (0, 1) in got
    assert (2, 3) not in got  # only the cut stop-gram linked them


def test_minhash_lsh_finds_exact_and_near_dup(docs):
    pairs = {(r["a"], r["b"]): r["jaccard_est"] for r in
             dd.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs  # high overlap → most minhashes agree


def test_simhash_hamming(docs, spark):
    sigs = {r["id"]: r["sig"] for r in dd.simhash_signatures_df(docs).collect()}
    assert sigs[0] == sigs[3]  # identical text → identical simhash
    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             dd.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 3)] == 0
    assert (0, 1) in pairs and 0 < pairs[(0, 1)] <= 10


def test_embedding_neardup_and_ann(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {(r["a"], r["b"]) for r in dd.embedding_neardup_pairs(emb, threshold=0.95).collect()}
    assert pairs == {(0, 1)}

    # LSH-bucketed scale path: found pairs are a SUBSET of the exact pairs
    # (recall < 1 by design) with identical verified cosine, and the plan
    # contains no cartesian/nested-loop stage
    lsh = dd.embedding_neardup_lsh(emb, threshold=0.95, n_planes=2, n_tables=4, dim=4)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    lsh_pairs = {(r["a"], r["b"]) for r in lsh.collect()}
    assert lsh_pairs <= pairs

    queries = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    topk = sim.brute_force_topk(emb, queries, k=2).collect()
    assert [r["neighbor_id"] for r in sorted(topk, key=lambda r: r["rank"])] == [1, 4]


def test_lsh_ann_recall_vs_brute_force(spark):
    # deterministic pseudo-vectors; recall@5 of bucketed ANN vs exact
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest() * 4
        return [b / 255.0 for b in h[:16]]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(120)], "vec_id long, embedding array<double>"
    ).cache()
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(emb, queries, k=5).collect()
    approx = sim.lsh_ann_topk(emb, queries, dim=16, k=5, n_planes=4, n_tables=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.6  # mean-centered 8-table LSH


def test_ivf_ann_deterministic_and_recall(spark):
    # IVF with few cells + high nprobe approaches exact; identical across runs
    import hashlib

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest() * 4
        return [b / 255.0 for b in h[:16]]

    emb = spark.createDataFrame(
        [(i, vec(i)) for i in range(120)], "vec_id long, embedding array<double>"
    ).cache()
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, sim.ivf_ann_topk(emb, queries, dim=16, k=5,
                                           n_cells=8, nprobe=4).collect()))
    b = sorted(map(tuple, sim.ivf_ann_topk(emb, queries, dim=16, k=5,
                                           n_cells=8, nprobe=4).collect()))
    assert a == b  # deterministic seeding/means/argmax
    exact = sim.brute_force_topk(emb, queries, k=5).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r[0], r[1]) for r in a}
    assert len(exact_set & got) / len(exact_set) >= 0.6
    # probing ALL cells must be exact (IVF degenerates to brute force)
    full = sim.ivf_ann_topk(emb, queries, dim=16, k=5, n_cells=8, nprobe=8).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in full} == exact_set
    emb.unpersist()


def test_text_analysis_fields(docs):
    out = {r["doc_id"]: r for r in tx.analyze_documents(docs).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[0]["lang_guess"] == "en"
    assert out[4]["lang_guess"] == "de"
    assert out[0]["fingerprint"] == out[3]["fingerprint"]
    assert out[0]["fingerprint"] != out[1]["fingerprint"]
    assert 0.0 <= out[2]["quality"] <= 1.0


def test_fingerprint_shingle_min_matches_python_oracle(spark):
    import hashlib

    text = "The quick  brown fox JUMPS over the lazy dog near the river bank"
    norm = " ".join(text.lower().strip().split())
    k = 16
    expected = min(
        hashlib.md5(norm[i : i + k].encode()).hexdigest()
        for i in range(max(1, len(norm) - k + 1))
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = df.select(tx.fingerprint_shingle_min(F.col("text")).alias("fp")).collect()[0]["fp"]
    assert got == expected


# ---------------------------------------------------- PII scrub (round 4)


def test_redact_pii_all_kinds(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user+tag@sub.example.org ip 192.168.0.1 tel +44 207-946-0958 end")],
        "doc_id long, text string",
    )
    out = tx.pii_scrub(df).collect()[0]
    assert out["n_emails"] == 1 and out["n_ipv4"] == 1 and out["n_phones"] == 1
    assert out["n_pii_residual"] == 0
    assert out["text"] == "mail <EMAIL> ip <IP> tel +44 <PHONE> end"


def test_redact_pii_email_domain_not_eaten_by_ip(spark):
    # numeric-ish domains: email redaction runs FIRST so the IPv4 pattern
    # never bites into an address's dotted domain
    df = spark.createDataFrame([(1, "x 1a@2.33.de y")], "doc_id long, text string")
    out = tx.pii_scrub(df).collect()[0]
    assert out["n_emails"] == 1
    assert out["text"] == "x <EMAIL> y"


def test_pii_scrub_clean_text_untouched(spark):
    df = spark.createDataFrame(
        [(1, "no personal data here, just words and the number 42")],
        "doc_id long, text string",
    )
    out = tx.pii_scrub(df).collect()[0]
    assert (out["n_emails"], out["n_phones"], out["n_ipv4"]) == (0, 0, 0)
    assert out["text"] == "no personal data here, just words and the number 42"


# -------------------------------------------- normalized dedup (round 4)


def test_normalized_dedup_collapses_case_and_punct(spark):
    df = spark.createDataFrame(
        [
            (0, "The quick brown fox!"),
            (1, "  the   QUICK brown fox  "),   # normalized twin of 0
            (2, "the quick brown foxes"),        # NOT a twin
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["n_copies"] for r in dd.normalized_exact_dedup(df).collect()}
    assert out == {0: 2, 2: 1}
    # byte-exact dedup keeps all three — the normalization is the point
    assert dd.exact_dedup(df).count() == 3


def test_window_containment_flags_embedded_copy_not_similar_jaccard(spark):
    """Containment catches what Jaccard can't: a short doc fully embedded
    in a much longer one is ~100% contained but low-Jaccard. Unrelated
    docs must score zero."""
    short = "alpha beta gamma delta epsilon zeta eta theta"          # 8 words
    long_ = short + " " + " ".join(f"filler{i}" for i in range(40))  # 48 words
    other = " ".join(f"unrelated{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, other)], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in dd.window_containment_stats(df, n=8).collect()}
    # doc1: its single 8-word window appears inside doc2 -> fully contained
    assert out[1].n_windows == 1 and out[1].n_dup_windows == 1
    assert out[1].is_dup == 1
    # doc2: only 1 of its 41 windows is shared -> not flagged
    assert out[2].n_windows == 41 and out[2].n_dup_windows == 1
    assert out[2].is_dup == 0
    # doc3: nothing shared
    assert out[3].n_dup_windows == 0 and out[3].is_dup == 0


def test_window_containment_short_doc_fallback(spark):
    """Docs under n words collapse to one whole-text window (the
    word_shingles fallback) — two identical short docs flag each other."""
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "different tiny")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in dd.window_containment_stats(df, n=8).collect()}
    assert out[1].is_dup == 1 and out[2].is_dup == 1
    assert out[3].is_dup == 0


def test_incremental_minhash_never_self_pairs_corpus(spark):
    """The incremental op only reports new-vs-corpus matches: two
    identical docs INSIDE the corpus produce no row, while a new doc
    matching a corpus doc does."""
    base = " ".join(f"word{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(1, base), (2, base),                      # identical pair IN corpus
         (3, " ".join(f"other{i}" for i in range(60)))],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(100, base + " tiny tail change"),          # near-dup of corpus 1/2
         (101, " ".join(f"fresh{i}" for i in range(60)))],
        "doc_id int, text string",
    )
    rows = dd.minhash_lsh_incremental(new, corpus, threshold=0.25).collect()
    assert all(r.new_id >= 100 and r.corpus_id < 100 for r in rows)
    matched = {(r.new_id, r.corpus_id) for r in rows}
    assert (100, 1) in matched and (100, 2) in matched
    assert not any(nid == 101 for nid, _ in matched)


def test_semdedup_marks_within_cluster_neardups(spark):
    """SemDeDup: exact/near duplicate vectors land in one cell and every
    copy but the smallest-id one is marked; distinct directions are kept.
    Deterministic — two runs produce identical assignments."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.02, 0.0, 0.0]),   # near-dup of 0
        (2, [1.0, 0.0, 0.0, 0.0]),      # exact dup of 0
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in sim.semdedup(emb, dim=4, n_cells=3,
                                                tau=0.95).collect()}
    assert len(got) == 6
    # near/exact dups of the smallest id are marked; the rest kept
    assert got[0]["is_dup"] == 0
    assert got[1]["is_dup"] == 1 and got[2]["is_dup"] == 1
    assert got[1]["cell"] == got[0]["cell"] == got[2]["cell"]
    assert {got[i]["is_dup"] for i in (3, 4, 5)} == {0}

    again = {r["vec_id"]: (r["cell"], r["is_dup"])
             for r in sim.semdedup(emb, dim=4, n_cells=3, tau=0.95).collect()}
    assert again == {k: (v["cell"], v["is_dup"]) for k, v in got.items()}

    # scale shape: the within-cluster pair stage is an EQUI join on cell,
    # never a cartesian/nested-loop plan
    plan = sim.semdedup(emb, dim=4, n_cells=3, tau=0.95)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_top_ngrams_counts_and_rank(spark):
    rows = [
        ("a", "click here to accept cookies now"),
        ("b", "please click here to accept cookies"),
        ("c", "click here to accept cookies click here to accept cookies"),
        ("d", "too short"),
        ("e", ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["gram"]: r for r in tx.top_ngrams(docs, n=3, k=5).collect()}
    # "click here to": a=1, b=1, c=2 -> 4 occurrences in 3 docs
    top = got["click here to"]
    assert (top["n_occurrences"], top["n_docs"], top["rank"]) == (4, 3, 1)
    assert got["here to accept"]["n_occurrences"] == 4
    # a <3-token doc and an empty doc contribute nothing
    all_grams = tx.top_ngrams(docs, n=3, k=100).collect()
    assert all(" " in r["gram"] for r in all_grams)
    # ranks are 1..k dense and deterministic
    ranks = [r["rank"] for r in tx.top_ngrams(docs, n=3, k=5).collect()]
    assert ranks == [1, 2, 3, 4, 5]


def test_top_ngrams_plan_shape(spark):
    """Distinct-doc count is a two-level aggregate: no Expand (the
    count(DISTINCT) plan) and no global Sort before the limit."""
    rows = [("a", "w x y z"), ("b", "w x y")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    plan = tx.top_ngrams(docs, n=3, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    assert "TakeOrderedAndProject" in plan


def test_leakage_safe_split_no_straddle(spark):
    from e_commerce_lakehouse_spark.operators.curation import leakage_safe_split

    # 40 docs with planted near-dup families: ids 3k/3k+1 share a text
    # (exact dup), 3k+2 is unique — components {3k, 3k+1} must land on
    # the same side; singletons split by their own id.
    rows = []
    for i in range(40):
        fam = i // 3
        txt = (f"family {fam} shared body of text repeated words here"
               if i % 3 < 2 else f"unique document number {i} with its own words")
        rows.append((i, txt, 20 + i))
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.9)
    out = leakage_safe_split(docs, pairs, val_frac=0.5, seed="0")
    got = {r["doc_id"]: (r["split_unit"], r["split"]) for r in out.collect()}
    assert len(got) == 40                       # every doc assigned exactly once
    # no cluster straddles the boundary
    by_unit = {}
    for _, (unit, split) in got.items():
        by_unit.setdefault(unit, set()).add(split)
    assert all(len(s) == 1 for s in by_unit.values())
    # planted pairs share a unit; unique docs are their own unit
    for k in range(0, 39, 3):
        assert got[k][0] == got[k + 1][0] == k
        assert got[k + 2][0] == k + 2
    assert {s for _, s in got.values()} == {"train", "val"}
    # determinism across re-runs / seed draws a different permutation
    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(docs, pairs, val_frac=0.5,
                                         seed="0").collect()}
    assert again == {k: v[1] for k, v in got.items()}
    other = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(docs, pairs, val_frac=0.5,
                                         seed="epoch2").collect()}
    assert other != again


def test_leakage_safe_split_rejects_bad_frac(spark):
    from e_commerce_lakehouse_spark.operators.curation import leakage_safe_split

    docs = spark.createDataFrame([(1, "x", 1)], "doc_id long, text string, n_chars long")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, docs.selectExpr("doc_id a", "doc_id b"),
                           val_frac=1.5)


def test_cross_source_overlap_counts_planted_prefix_dups(spark):
    # three docs share the same first-8-word prefix: two in srcA, one in
    # srcB; a fourth doc is unique. Expect (A,A)=C(2,2 choose)=1 pair,
    # (A,B)=2 pairs, no row for the unique doc's fingerprint.
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, shared + " tail one", "srcA"),
        (1, shared + " tail two", "srcA"),
        (2, shared + " tail three", "srcB"),
        (3, "totally different words in every position here now", "srcB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): (r["n_shared_fps"], r["n_dup_pairs"])
        for r in dd.cross_source_overlap(df).collect()
    }
    assert out[("srcA", "srcA")] == (1, 1)
    assert out[("srcA", "srcB")] == (1, 2)
    assert ("srcB", "srcB") not in out  # single doc per fp on each side


def test_cross_source_overlap_plan_is_aggregate_first(spark):
    # the self-join input must be the (fp, source) aggregate, never the
    # raw corpus: no CartesianProduct/BroadcastNestedLoop anywhere.
    rows = [(i, f"w{i} x y z a b c d e", f"s{i % 2}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = dd.cross_source_overlap(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_temperature_resample_upweights_rare_strata(spark):
    from e_commerce_lakehouse_spark.operators.curation import temperature_resample

    # 90 'en' docs vs 10 'fr' docs, budget 50. Natural share of fr is
    # 10%; sqrt smoothing gives sqrt(10)/(sqrt(90)+sqrt(10)) = 25%, so
    # fr's quota must strictly exceed its natural-frequency allocation.
    rows = [(i, "en" if i < 90 else "fr") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_resample(df, strata_col="lang", budget=50, alpha=0.5)
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert by_lang["fr"] > 5                      # upweighted past 10% of 50
    assert by_lang["fr"] + by_lang["en"] <= 50    # never exceeds budget
    # every sampled row respects its stratum quota and rank determinism
    bad = out.where(F.col("sample_rank") > F.col("quota")).count()
    assert bad == 0


def test_temperature_resample_quota_capped_at_population(spark):
    from e_commerce_lakehouse_spark.operators.curation import temperature_resample

    # tiny stratum (2 docs) with a huge budget: quota caps at population
    # (without-replacement sampling cannot upsample past n_docs).
    rows = [(i, "big") for i in range(50)] + [(100, "tiny"), (101, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_resample(df, strata_col="lang", budget=1000, alpha=0.5)
    tiny = out.where(F.col("lang") == "tiny").collect()
    assert len(tiny) == 2 and all(r["quota"] == 2 for r in tiny)
    with pytest.raises(ValueError):
        temperature_resample(df, strata_col="lang", budget=0)


def test_temperature_resample_is_partitioning_invariant(spark):
    from e_commerce_lakehouse_spark.operators.curation import temperature_resample

    rows = [(i, ["en", "fr", "de"][i % 3]) for i in range(60)]
    df1 = spark.createDataFrame(rows, "doc_id long, lang string")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, temperature_resample(df1, strata_col="lang", budget=30).collect()))
    b = sorted(map(tuple, temperature_resample(df8, strata_col="lang", budget=30).collect()))
    assert a == b
