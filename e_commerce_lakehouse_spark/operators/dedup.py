"""Deduplication family for training-data pipelines over ``documents``.

Exact, n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine
near-dup — each a composition of built-in DataFrame ops (no UDFs), each
with a DuckDB-SQL twin in ``__spark_entry__.oracle_sql``.

Hash choice: every hash is ``md5`` (identical lowercase-hex output in
Spark and DuckDB) so signatures are bit-identical across engines. MinHash
uses the lexicographic MIN of seeded md5 strings — a valid random
permutation per seed, portable everywhere.

Scale notes (100 TB): the shingle self-join explodes on stop-shingles, so
``max_df`` drops shingles present in more than that many documents before
the join (standard df-cut); MinHash/LSH replaces the quadratic verify
with band-bucket candidates; SimHash candidates are banded by 4×15-bit
prefix chunks rather than cross-joined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _finish_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` eagerly (localCheckpoint: blocks sized to the
    threshold-filtered OUTPUT — orders of magnitude smaller than the
    corpus — lineage to the cached intermediates cut), then unpersist the
    intermediates. Without this, every ``persist()`` below leaks cached
    blocks for the life of the session, and a long multi-query sweep
    accumulates executor storage pressure (round-2 finding). The returned
    checkpoint blocks are owned by the caller and are GC-cleaned by
    Spark's ContextCleaner once dereferenced; at corpus scale, stage the
    result to a temp parquet instead and unpersist after the write."""
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for c in cached:
            c.unpersist()


# ------------------------------------------------------------------ exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one survivor (min id) per distinct text. Hash-groupBy —
    the content hash, not the full text, is the shuffle key at scale."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "content_hash", "n_copies")
    )


def normalize_text(col: Column) -> Column:
    """Canonical text form for near-exact dedup (the normalization pass
    CCNet/RefinedWeb run before hashing): lowercase, strip everything but
    ``[a-z0-9]`` and whitespace, collapse whitespace runs, trim. Pure
    Column expressions (one map stage corpus-wide); the regexes sit in
    the Java ∩ RE2 subset so the DuckDB oracle normalizes identically."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def normalized_exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-exact dedup on NORMALIZED content: one survivor (min id) per
    distinct canonical form — catches case/punctuation/whitespace twins
    that byte-exact dedup misses, without any pairwise stage. Same scale
    shape as ``exact_dedup``: the md5 of the canonical form (16 bytes,
    never the text) is the shuffle key."""
    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col))).alias("norm_hash"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
        .select(id_col, "norm_hash", "n_copies")
    )


# ------------------------------------------------------------- shingling


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document."""
    w = F.split(F.trim(F.lower(text)), r"\s+")
    m = F.size(w) - (n - 1)
    grams = F.when(
        m >= 1,
        F.transform(
            F.sequence(F.lit(1), m),
            lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", w)))
    return F.array_distinct(grams)


def _shingle_table(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # shingling + the per-shingle md5 downstream are the CPU-heaviest
    # map-side work in the engine; a single-file input would run them on
    # one core (see plans/parallelism.py — measured 12× on sf0.1)
    from ..plans.parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    return df.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


# ---------------------------------------------------------- n-gram Jaccard


def window_containment_stats(
    df: DataFrame,
    n: int = 8,
    min_dup_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring-window CONTAINMENT dedup — the "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022) shape,
    distributed: fixed n-word windows stand in for suffix-array substring
    matches. Distinct from Jaccard/MinHash SIMILARITY: a short document
    fully copied into a long one scores near-zero Jaccard but 100%
    containment here.

    Per document: total distinct n-word windows, how many of them appear
    in at least one OTHER document, the duplicated fraction, and an
    ``is_dup`` flag at ``min_dup_frac``.

    Scale shape: windows become 60-bit md5-prefix ints (never strings);
    per-window document counts come from ONE count-over-window on that
    key (no second shuffle for a join-back), then one aggregation by
    doc — two shuffles total, both on compact keys, no pairwise stage
    anywhere. Stop-window skew is bounded: a window shared by k docs
    costs k rows, not k² pairs."""
    from pyspark.sql import Window

    sh = _shingle_table(df, text_col, id_col, n)
    keyed = sh.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("w"),
    )
    docs_with = F.count("*").over(Window.partitionBy("w"))
    per_doc = (
        keyed.withColumn("docs_with", docs_with)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(F.when(F.col("docs_with") > 1, 1).otherwise(0)).alias(
                "n_dup_windows"
            ),
        )
    )
    dup_frac = F.round(F.col("n_dup_windows") / F.col("n_windows"), 6)
    return per_doc.select(
        id_col,
        "n_windows",
        "n_dup_windows",
        dup_frac.alias("dup_frac"),
        (dup_frac >= min_dup_frac).cast("int").alias("is_dup"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """All pairs (a<b) with Jaccard(shingles_a, shingles_b) ≥ threshold.

    inter via shingle equi-join, union via |A|+|B|−inter. The DEFAULT is
    EXACT Jaccard over the full shingle sets — what the function name
    promises. On web-scale text the shingle self-join explodes
    quadratically on stop-shingles, so production callers should OPT IN
    to the df-cut (``max_df_frac=0.5``: drop shingles present in more
    than half the corpus — the standard df-cut; an absolute ``max_df``
    overrides the fraction). The cut changes each document's
    surviving-shingle set, so Jaccard with a cut is over the CUT sets —
    visible at the call site because the caller passed the knob
    (round-2 advice: the cut must never be a silent default).

    Shingles are carried as 60-bit md5-prefix ints, not strings: the
    self-join shuffles 8-byte keys instead of ~25-char text (~3× less
    shuffle volume; collision odds ~n²/2^60 are negligible and the
    DuckDB oracle hashes identically)."""
    sh = _shingle_table(df, text_col, id_col, n).select(
        id_col,
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long")
        .alias("shingle"),
    )
    limit = None
    if max_df is not None:
        limit = F.lit(max_df)
    elif max_df_frac is not None:
        n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
        limit = F.col("n_docs") * F.lit(max_df_frac)
    if limit is not None:
        dfreq = sh.groupBy("shingle").agg(F.countDistinct(id_col).alias("df_"))
        if max_df is None:
            dfreq = dfreq.crossJoin(F.broadcast(n_docs))
        rare = dfreq.where(F.col("df_") <= limit).select("shingle")
        sh = sh.join(rare, "shingle")
    # persist the CUT int-shingle table: it feeds sizes + both self-join
    # sides, and as (long, long) rows it caches ~3× cheaper than the
    # string form (which made caching a net loss); at corpus scale stage
    # it to a temp parquet instead
    sh = sh.persist()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    result = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("szb")), "b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return _finish_release(result, sh)


# ------------------------------------------------------------ MinHash+LSH


# Carter-Wegman multipliers/offsets for the derived minhash family: odd
# constants < 2^31 from a fixed table (deterministic, engine-portable)
_MH_PRIME = (1 << 61) - 1  # Mersenne prime 2^61-1


def _mh_params(j: int) -> tuple[int, int]:
    import hashlib

    h = hashlib.md5(f"mh|{j}".encode()).hexdigest()
    a = (int(h[:8], 16) | 1) & 0x7FFFFFFF  # odd, < 2^31
    b = int(h[8:16], 16) & 0x7FFFFFFF
    return a, b


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 12,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """num_hashes MinHash values per doc.

    ONE md5 per (doc, shingle) row, split into two 30-bit words, then
    h_j = min over shingles of (a_j*w1 + b_j*w2 + j) mod (2^61-1) — a
    2-universal integer family. vs. the naive num_hashes-md5s-per-shingle
    scheme this is ~4× cheaper at the same shuffle shape (the min agg is
    over BIGINTs, not 32-char strings), and every term stays < 2^63 so
    Spark bigint and the DuckDB oracle wrap identically (they don't —
    they never overflow)."""
    sh = _shingle_table(df, text_col, id_col, n)
    md5 = F.md5(F.col("shingle"))
    w1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long") % F.lit(1 << 30)
    w2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long") % F.lit(1 << 30)
    sh = sh.select(id_col, w1.alias("w1"), w2.alias("w2"))
    aggs = []
    for j in range(num_hashes):
        a, b = _mh_params(j)
        hj = (F.lit(a) * F.col("w1") + F.lit(b) * F.col("w2") + F.lit(j)) % F.lit(_MH_PRIME)
        aggs.append(F.min(hj).alias(f"h{j}"))
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.25,
    num_hashes: int = 12,
    bands: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash → LSH banding → candidates → SIGNATURE-estimate verify.

    ``jaccard_est`` = fraction of equal MinHash components — the unbiased
    MinHash estimator. Verification is O(candidates × num_hashes): no
    shingle re-join, no quadratic pass — the shape production web-dedup
    pipelines use. For exact Jaccard use ``ngram_jaccard_pairs``."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # persist the signatures: they fan out into ``bands`` self-joins plus
    # two verification joins, and Spark does NOT reuse the exchange across
    # branches (measured: 16 full input scans without this, 1 with). The
    # cached set is num_hashes longs per doc — tiny relative to the
    # corpus; at petabyte doc counts write it to a temp table instead.
    # eager localCheckpoint: materializes ONCE before the fan-out (the
    # AQE cache-race guard) AND cuts the shingle pipeline's lineage out of
    # every downstream stage job's re-analysis (r6: the banded self-join,
    # the two verify joins and their AQE stages each re-analyzed it)
    sig = minhash_signatures(df, num_hashes, n, text_col, id_col).localCheckpoint(eager=True)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        )
        for b in range(bands)
    ]
    # all bands in one posexplode + ONE self-join on (band, key): identical
    # candidate set to the per-band join-union loop (the band index is part
    # of the join key), in 1 join job and 1 signature pass instead of
    # ``bands`` of each — the per-band AQE jobs dominated wall at sf0.1
    banded = sig.select(id_col, F.posexplode(F.array(*band_cols)).alias("bi", "bk"))
    left = banded.select(F.col(id_col).alias("a"), "bi", "bk")
    right = banded.select(F.col(id_col).alias("b"), "bi", "bk")
    cands = (
        left.join(right, ["bi", "bk"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("a"), *[F.col(f"h{j}").alias(f"ha{j}") for j in range(num_hashes)])
    sb = sig.select(F.col(id_col).alias("b"), *[F.col(f"h{j}").alias(f"hb{j}") for j in range(num_hashes)])
    matches = sum(
        (F.col(f"ha{j}") == F.col(f"hb{j}")).cast("int") for j in range(num_hashes)
    )
    result = (
        cands.join(sa, "a")
        .join(sb, "b")
        .withColumn("jaccard_est", F.round(matches / F.lit(num_hashes), 6))
        .where(F.col("jaccard_est") >= threshold)
        .select("a", "b", "jaccard_est")
    )
    return _finish_release(result, sig)


def minhash_lsh_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame,
    threshold: float = 0.25,
    num_hashes: int = 12,
    bands: int = 3,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental near-dup detection: flag NEW documents that collide
    with an EXISTING corpus — the "dedup today's crawl against the lake"
    path (RefinedWeb/CCNet shape). The corpus is NEVER self-paired:
    every band join is strictly new×corpus, so incremental cost is
    O(|new| + matched bands) regardless of corpus size — at 100 TB the
    corpus signatures/bands are computed once, stored as a table, and
    only the new batch is shingled per run (here both derive inline so
    the op is self-contained and oracle-able).

    Returns (new_id, corpus_id, jaccard_est) for signature-estimate
    matches ≥ threshold. Same MinHash family/banding as
    ``minhash_lsh_pairs``, so stored corpus signatures are reusable
    across both ops."""
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # eager localCheckpoints: materialize once before the fan-out (AQE
    # cache-race guard) and cut the shingle pipelines out of downstream
    # stage-job re-analysis (see minhash_lsh_pairs)
    sig_new = minhash_signatures(new_df, num_hashes, n, text_col, id_col).localCheckpoint(eager=True)
    sig_old = minhash_signatures(corpus_df, num_hashes, n, text_col, id_col).localCheckpoint(eager=True)

    def _banded(sig, out_id):
        cols = [
            F.md5(
                F.concat_ws(
                    "|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            )
            for b in range(bands)
        ]
        # all bands in one posexplode: ONE new×corpus join on (band, key)
        # replaces the per-band join-union loop (identical match set —
        # the band index is part of the join key)
        return sig.select(
            F.col(id_col).alias(out_id),
            F.posexplode(F.array(*cols)).alias("bi", "bk"),
        )

    bn, bo = _banded(sig_new, "new_id"), _banded(sig_old, "corpus_id")
    cands = bn.join(bo, ["bi", "bk"]).select("new_id", "corpus_id").distinct()
    sa = sig_new.select(
        F.col(id_col).alias("new_id"),
        *[F.col(f"h{j}").alias(f"ha{j}") for j in range(num_hashes)],
    )
    sb = sig_old.select(
        F.col(id_col).alias("corpus_id"),
        *[F.col(f"h{j}").alias(f"hb{j}") for j in range(num_hashes)],
    )
    matches = sum(
        (F.col(f"ha{j}") == F.col(f"hb{j}")).cast("int") for j in range(num_hashes)
    )
    result = (
        cands.join(sa, "new_id")
        .join(sb, "corpus_id")
        .withColumn("jaccard_est", F.round(matches / F.lit(num_hashes), 6))
        .where(F.col("jaccard_est") >= threshold)
        .select("new_id", "corpus_id", "jaccard_est")
    )
    return _finish_release(result, sig_new, sig_old)


# ---------------------------------------------------------------- SimHash

SIMHASH_BITS = 60  # 15 hex chars → fits a signed int64 exactly in both engines


def _token_hash60(tok: Column) -> Column:
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash(text: Column) -> Column:
    """60-bit SimHash over word tokens, all built-in expressions:
    per-bit majority vote of token hashes. Column form — prefer
    ``simhash_signatures_df`` in bulk paths (single pass over exploded
    tokens instead of 60 array folds per row)."""
    toks = F.array_distinct(F.split(F.trim(F.lower(text)), r"\s+"))
    hashes = F.transform(toks, _token_hash60)
    bits = [_bit_term(hashes, i) for i in range(SIMHASH_BITS)]
    return sum(bits[1:], bits[0])


def _bit_term(hashes: Column, i: int) -> Column:
    # closure factory: HOF lambdas must take exactly (acc, h) — no bound
    # defaults (pyspark binds extra params as lambda variables)
    vote = F.aggregate(
        hashes,
        F.lit(0),
        lambda acc, h: acc + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    return F.when(vote > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))


def simhash_signatures_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig) via explode + ONE grouped aggregation pass: 60
    sum(sign(bit)) aggs over (doc, token) rows — map-side combinable,
    whole-stage codegen, no per-row array re-walks.

    Input widening is CONDITIONAL (< pool/2): a narrow scan (sf0.1
    documents = one parquet file = ONE partition) serializes the
    token-explode+hash map stage on a single core regardless of pool
    width — round 3 removed the widening after a warm-floor A/B showed
    the repartition costing ~15% (6.8 s vs 5.9 s), and the very next
    recorded bench paid 13× on the serial tail under contention (82.9 s
    vs 6.2 s, VERDICT r3). The pool/2 guard keeps the warm-floor win
    when the scan is already reasonably split, and only pays the one
    round-robin shuffle when the map stage would otherwise idle most of
    the cluster. At corpus scale inputs arrive in thousands of splits
    and this is a no-op."""
    pool = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, pool // 2):
        from ..plans.parallelism import ensure_min_parallelism

        df = ensure_min_parallelism(df)
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))).alias("tok"),
    ).withColumn("h", _token_hash60(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("id").agg(*votes)
    sig_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(SIMHASH_BITS)
    ]
    return agg.select("id", sum(sig_terms[1:], sig_terms[0]).alias("sig"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs (a<b) with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    EXACT via pigeonhole banding (Manku et al., WWW'07 style): with
    n_chunks > max_hamming, any pair within the radius must agree on at
    least one whole chunk, so chunk-equality joins produce a complete
    candidate set; exact Hamming verify filters it. n_chunks self-joins
    on short keys replace the O(n²) cross join."""
    n_chunks = max_hamming + 1
    while SIMHASH_BITS % n_chunks != 0:  # align to a divisor of 60
        n_chunks += 1
    chunk_bits = SIMHASH_BITS // n_chunks
    # persist: the signature table feeds n_chunks self-joins and Spark
    # won't reuse the exchange across them (one 60-agg token pass instead
    # of 2×n_chunks); one long per doc — tiny
    # eager localCheckpoint: materialize once + flat downstream plans
    # (see minhash_lsh_pairs)
    sigs = simhash_signatures_df(df, text_col, id_col).localCheckpoint(eager=True)
    chunks = [
        F.shiftright(F.col("sig"), chunk_bits * c)
        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
        for c in range(n_chunks)
    ]
    # all chunks in one posexplode + ONE self-join on (chunk, key):
    # identical candidate set to the per-chunk join-union loop (the chunk
    # index is part of the join key), in 1 join job and 1 signature pass
    banded = sigs.select(
        "id", "sig", F.posexplode(F.array(*chunks)).alias("ci", "ck")
    )
    left = banded.select(
        F.col("id").alias("a"), F.col("sig").alias("siga"), "ci", "ck"
    )
    right = banded.select(
        F.col("id").alias("b"), F.col("sig").alias("sigb"), "ci", "ck"
    )
    result = (
        left.join(right, ["ci", "ck"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", "siga", "sigb")
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("siga").bitwiseXOR(F.col("sigb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
    return _finish_release(result, sigs)


# ------------------------------------------------- embedding-cosine near-dup


def round_cos(dot: Column, na: Column, nb: Column, dp: int = 4) -> Column:
    """dp-rounded cosine from a precomputed dot product and two L2 norms,
    under the single zero-norm contract: a zero (or NULL) norm yields
    NULL similarity (DuckDB's double division by zero is NULL; oracles
    mirror with nullif(norm_a * norm_b, 0)). The ONE definition shared
    by the dedup and similarity families — keep contract tweaks here."""
    den = na * nb
    return F.round(F.when(den != 0, dot / den), dp)


def cosine_sim(a: Column, b: Column) -> Column:
    """Exact cosine of two array<float>/array<double> columns — sequential
    fold in double precision (bit-stable, matches DuckDB's list kernels).
    Zero-norm contract: a zero (or NULL) norm yields NULL similarity, not
    NaN/Inf — matching DuckDB, whose double division by zero is NULL."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    den = na * nb
    return F.when(den != 0, dot / den)


def vec_norm(vec: Column) -> Column:
    """L2 norm in double precision (sequential fold — oracle-stable)."""
    d = F.transform(vec, lambda x: x.cast("double"))
    return F.sqrt(F.aggregate(F.transform(d, lambda x: x * x), F.lit(0.0), lambda a, v: a + v))


def embedding_neardup_lsh(
    df: DataFrame,
    threshold: float = 0.40,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: sign-LSH bucket candidates (mean-centered, multi-table),
    then EXACT cosine verify — never an all-pairs join. Deterministic:
    hyperplanes derive from md5(seed, plane, dim) and the center is the
    6-dp-rounded dataset mean, so the result is a pure function of the
    input that a SQL oracle can mirror plane-by-plane (oracles.py does).

    Recall < 1 by design (candidates only from colliding buckets); the
    exact O(n²) baseline remains ``embedding_neardup_pairs``. At 100 TB
    the candidate join is an equi-join on a 6-bit bucket key per table —
    shuffle cost ~n·T, verify cost ~collisions, no quadratic stage."""
    from .similarity import dataset_mean, lsh_bucket_signature

    center = dataset_mean(df, dim, vec_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", vec_norm(F.col("v"))).localCheckpoint(eager=True)
    # eager checkpoint: feeds bucket + 2 verify branches — materialized
    # once, flat plans downstream (see minhash_lsh_pairs)
    # all tables' signatures in one projection + posexplode, then ONE
    # self-join on (table, bucket): identical candidate set to the old
    # per-table join-union loop, in 1 join and 1 corpus pass (see
    # similarity.lsh_ann_topk for the measured rationale)
    sigs = F.array(*[
        lsh_bucket_signature(base, dim, n_planes, seed + 1000 * t, "v", center)
        for t in range(n_tables)
    ])
    bt = base.select("id", F.posexplode(sigs).alias("t", "bucket"))
    left = bt.select(F.col("id").alias("a"), "t", "bucket")
    right = bt.select(F.col("id").alias("b"), "t", "bucket")
    cands = (
        left.join(right, ["t", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = base.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    vb = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    result = (
        cands.join(va, "a")
        .join(vb, "b")
        .withColumn("cos", round_cos(dot, F.col("na"), F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("a", "b", "cos")
    )
    return _finish_release(result, base)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairs (a<b) with cosine ≥ threshold. Brute-force O(n²) baseline —
    the LSH-bucketed scale path is ``embedding_neardup_lsh``.

    Norms are computed ONCE per row before the pair join (O(n) folds, not
    O(n²)); only the dot product runs per pair — same arithmetic shape as
    the oracle's dot/(|a||b|), so 4-dp rounding agrees."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn("nrm", vec_norm(F.col("v")))
    left = base.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    right = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    return (
        left.join(right, F.col("a") < F.col("b"))
        .withColumn("cos", round_cos(dot, F.col("na"), F.col("nb")))
        .where(F.col("cos") >= threshold)
        .select("a", "b")
    )

# ------------------------------------------------------- corpus overlap


def prefix_fingerprint(text: Column, k: int = 8) -> Column:
    """Dolma-style first-k-token fingerprint: md5 of the first ``k``
    NORMALIZED words (``normalize_text`` canonical form). Catches the
    boilerplate-prefix duplicate family (mirrored pages, templated
    headers) that exact full-text hashing misses, at the cost of one map
    stage — no tokenizer, no shuffle."""
    words = F.split(normalize_text(text), " ")
    return F.md5(F.array_join(F.slice(words, 1, k), " "))


def cross_source_overlap(
    df: DataFrame,
    *,
    text_col: str = "text",
    source_col: str = "source",
    prefix_k: int = 8,
) -> DataFrame:
    """Cross-source duplication overlap matrix: for every source pair
    (a <= b), how many fingerprints they share and how many duplicate
    document pairs that implies. The triage step a multi-dump corpus
    (CommonCrawl snapshots, site mirrors) runs BEFORE committing to a
    full dedup order — dumps with heavy mutual overlap get deduped
    against each other first.

    Fingerprint is the first-``prefix_k``-normalized-words hash
    (``prefix_fingerprint``); swap in md5(text) for exact-only overlap.

    Scale shape — aggregate-first, never row-quadratic: the corpus
    collapses to one row per (fingerprint, source) WITH ITS COUNT before
    any join, so the self-equi-join input is bounded by distinct
    fingerprints x sources, and pair counts are arithmetic on the counts
    (cnt_a*cnt_b across sources, C(cnt,2) within) — a fingerprint
    duplicated a million times costs one row, not 10^12 join outputs.
    Output is at most |sources|^2 rows: always driver-safe.
    """
    per = (
        df.groupBy(
            prefix_fingerprint(F.col(text_col), prefix_k).alias("fp"),
            F.col(source_col).alias("src"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    a = per.select("fp", F.col("src").alias("source_a"), F.col("cnt").alias("cnt_a"))
    b = per.select("fp", F.col("src").alias("source_b"), F.col("cnt").alias("cnt_b"))
    # shiftright, not /2: long division through double loses exactness
    # past 2^53, and boilerplate fingerprints at corpus scale get there
    pair_cnt = F.when(
        F.col("source_a") == F.col("source_b"),
        F.shiftright(F.col("cnt_a") * (F.col("cnt_a") - 1), 1),
    ).otherwise(F.col("cnt_a") * F.col("cnt_b"))
    return (
        a.join(b, "fp")
        .where(F.col("source_a") <= F.col("source_b"))
        .withColumn("pair_cnt", pair_cnt)
        .where(F.col("pair_cnt") > 0)
        .groupBy("source_a", "source_b")
        .agg(
            F.countDistinct("fp").alias("n_shared_fps"),
            F.sum("pair_cnt").alias("n_dup_pairs"),
        )
    )

# ------------------------------------- exact set-similarity join (PPJoin)


def set_similarity_join(
    df: DataFrame,
    threshold: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT token-set Jaccard join via prefix filtering (AllPairs /
    PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): all
    pairs (a < b) with Jaccard(tokens_a, tokens_b) >= threshold, where
    tokens are the document's DISTINCT whitespace words.

    Complements the probabilistic near-dup family: MinHash (q22) trades
    exactness for candidate economy; this operator keeps Jaccard EXACT
    and gets its candidate economy from the prefix-filter theorem — if
    |A ∩ B| >= α then, under any fixed global token order, the first
    |A|-α+1 tokens of A and the first |B|-α+1 of B must intersect
    (pigeonhole). With J >= t implying |A∩B| >= ceil(t·|A|) (since
    union >= |A|), each document only indexes its first
    sz - ceil(t·sz) + 1 tokens under the RAREST-FIRST global order
    (ascending document frequency, token string tiebreak), and the
    candidate join runs on those prefix tokens only.

    Scale shape: every stage is an equi-join or a map-side-combinable
    aggregate — df-count groupBy(token), one token-keyed join to attach
    df, one per-doc window for prefix positions (shuffle on id), the
    prefix self-equi-join on token (rarest-first ordering keeps stop
    words OUT of prefixes, so the join never explodes on them), then an
    O(candidates) verify. Two further LOSSLESS cuts (both from the
    PPJoin paper's filter family) keep the constant down when the
    corpus is dense (tiny vocabulary — the pathological case where
    every prefix token is frequent and candidates grow quadratically):

    - LENGTH filter at the candidate join: J(A,B) >= t forces
      min(|A|,|B|) >= t·max(|A|,|B|) (substitute |A∩B| <= min into the
      Jaccard bound), so prefix matches between size-incompatible docs
      are dropped before the pair ever exists;
    - the verify joins each candidate pair against the per-doc sorted
      token ARRAY (one bounded row per doc) and computes the exact
      intersection size in-row, instead of re-exploding the token
      stream through two pair×token shuffles and a groupBy (the old
      verify shuffled ~135 M (pair, token) rows on the sf0.1 corpus).
      At corpus scale the doc-set table is corpus-sized (never
      pair-sized); the arrays are per-doc bounded.

    With both cuts plus explicit-width exchanges below, the operator is
    OUTPUT-BOUND on dense corpora (measured: 5× docs → 24.4× true
    pairs → 16× wall, i.e. per-emitted-pair cost falls with scale) —
    the optimum for an exact all-pairs join, whose result on a
    fixed-vocabulary corpus is inherently quadratic. Never a cartesian
    anywhere.
    """
    from pyspark.sql import Window

    from ..plans.parallelism import ensure_min_parallelism

    toks = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    )
    # (id, token) rows feed df-counts, prefixes, and the verify — persist
    toks = toks.persist()
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("df_"))
    w_pos = Window.partitionBy(id_col).orderBy(F.col("df_").asc(), F.col("tok").asc())
    w_all = Window.partitionBy(id_col)
    # explicit-width exchange feeding the per-doc windows (the q191
    # idiom): the (id, tok, df) rows are tiny, so AQE coalesces the
    # window shuffle to ~1 partition — and the whole candidate
    # generation (windows -> prefix filter -> broadcast prefix
    # self-join -> length filter) fuses into that one task, serializing
    # the operator's heaviest expansion (profiled: ONE 43 s task on the
    # sf0.1 corpus). An explicit hash exchange on the window key keeps
    # the stage as wide as the pool and adds no extra shuffle (it
    # satisfies the windows' required distribution).
    par = df.sparkSession.sparkContext.defaultParallelism
    pos = toks.join(dfreq, "tok").repartition(par, id_col).select(
        id_col,
        "tok",
        F.row_number().over(w_pos).alias("pos"),
        F.count("*").over(w_all).alias("sz"),
    )
    prefix = pos.where(
        F.col("pos")
        <= F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + F.lit(1)
    )
    cands = (
        prefix.select(F.col(id_col).alias("a"), "tok", F.col("sz").alias("sza"))
        .join(
            prefix.select(F.col(id_col).alias("b"), "tok", F.col("sz").alias("szb")),
            "tok",
        )
        .where(
            (F.col("a") < F.col("b"))
            # length filter: min(sz) >= t * max(sz) is NECESSARY for
            # J >= t (|A∩B| <= min(|A|,|B|)), so dropping the pair here
            # is lossless
            & (
                F.least("sza", "szb").cast("double")
                >= F.lit(threshold) * F.greatest("sza", "szb").cast("double")
            )
        )
        .select("a", "b")
        .distinct()
    )
    docsets = toks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("tok")).alias("ts"),
        F.count("*").alias("sz"),
    )
    # same idiom on the pair table: every candidate row pays an
    # |A|x|B| array intersection in the verify
    result = (
        cands.repartition(par, "a")
        .join(
            docsets.select(
                F.col(id_col).alias("a"),
                F.col("ts").alias("ta"),
                F.col("sz").alias("sza"),
            ),
            "a",
        )
        .join(
            docsets.select(
                F.col(id_col).alias("b"),
                F.col("ts").alias("tb"),
                F.col("sz").alias("szb"),
            ),
            "b",
        )
        .withColumn("inter", F.size(F.array_intersect("ta", "tb")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return _finish_release(result, toks)


# -------------------------------------------------------- shingle novelty


def shingle_novelty(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document shingle novelty: the fraction of a document's
    distinct word n-gram shingles whose FIRST corpus appearance (minimum
    document id) is this document. The dedup-aware curation signal —
    near-zero novelty means the document is assembled from already-seen
    text (mirrors, templates, quote farms) even when no single pairwise
    Jaccard crosses a dedup threshold; selection by novelty keeps the
    marginal-information documents.

    Scale shape: shingles travel as 60-bit md5-prefix ints (8-byte
    shuffle keys, like q22); one map-side-combinable groupBy(shingle)
    for first-ids, one shingle-keyed join back, one groupBy(doc). Never
    quadratic; no windows over the token stream.
    """
    sh = _shingle_table(df, text_col, id_col, n).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long")
        .alias("sh"),
    )
    sh = sh.persist()
    first = sh.groupBy("sh").agg(F.min(id_col).alias("first_id"))
    result = (
        sh.join(first, "sh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("first_id") == F.col(id_col)).cast("long")).alias("n_novel"),
        )
        .withColumn("novelty", F.round(F.col("n_novel") / F.col("n_shingles"), 6))
        .select(id_col, "n_shingles", "n_novel", "novelty")
    )
    return _finish_release(result, sh)


# ------------------------------------------------------ sketch calibration


def sketch_calibration(
    df: DataFrame,
    threshold: float = 0.25,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash/LSH quality readout against EXACT Jaccard on the same
    corpus: precision (candidate pairs that are truly ≥ threshold),
    recall (true pairs the sketch surfaced), and the mean absolute
    estimator error over the hits — the calibration run that decides
    num_hashes/bands BEFORE committing a petabyte dedup pass (run it on
    a sample at production scale; the exact side is the expensive leg).

    Exact comparison arithmetic: both jaccards are 6-dp multiples, so
    |est − exact|·1e6 rounds to an exact integer and the MAE numerator
    sums as DECIMAL(38,0) — no float summation order; the three ratios
    are one division each.
    """
    exact = ngram_jaccard_pairs(
        df, threshold=threshold, text_col=text_col, id_col=id_col
    )
    cands = minhash_lsh_pairs(
        df, threshold=threshold, text_col=text_col, id_col=id_col
    )
    hits = cands.join(exact, ["a", "b"])
    diff = F.abs(F.round((F.col("jaccard_est") - F.col("jaccard")) * 1e6)).cast(
        "long"
    )
    m = hits.agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"),
        F.sum(diff.cast("decimal(38,0)")).alias("_sd"),
    )
    nt = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    nc = cands.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_hits, n_true, n_cand = F.col("n_hits"), F.col("n_true"), F.col("n_candidates")
    return nc.crossJoin(nt).crossJoin(m).select(
        "n_candidates",
        "n_true",
        "n_hits",
        F.when(
            n_cand > 0,
            F.round(n_hits.cast("double") / n_cand.cast("double"), 6),
        ).alias("precision"),
        F.when(
            n_true > 0,
            F.round(n_hits.cast("double") / n_true.cast("double"), 6),
        ).alias("recall"),
        F.when(
            n_hits > 0,
            F.round(
                F.col("_sd").cast("double") / 1e6 / n_hits.cast("double"), 6
            ),
        ).alias("mae"),
    )


def dedup_burden(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source exact-duplicate burden report — the triage readout
    that decides WHERE dedup budget goes: per group, document count,
    unique-text count, duplicate rate, and the characters a dedup pass
    would reclaim (total chars minus one survivor's chars per distinct
    text). Pure aggregates on the content-hash key (q20's shuffle
    shape); a duplicate text spanning two sources counts in each
    source's burden (dedup within source — the cross-source view is
    q106's overlap matrix).

    Exact: counts and char sums are integers; the one division per
    group is the reported rate.
    """
    per_text = (
        df.select(
            F.col(group_col).alias("grp"),
            F.md5(F.col(text_col)).alias("h"),
            F.length(F.col(text_col)).cast("long").alias("chars"),
        )
        .groupBy("grp", "h")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sum(F.col("chars").cast("decimal(38,0)")).alias("chars_all"),
            F.min("chars").alias("chars_keep"),
        )
    )
    return (
        per_text.groupBy("grp")
        .agg(
            F.sum("n_copies").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
            F.sum(
                F.col("chars_all") - F.col("chars_keep").cast("decimal(38,0)")
            ).alias("_saved"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
            F.col("_saved").cast("long").alias("chars_reclaimable"),
        )
    )


def dup_span_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_chars: int = 20,
    min_count: int = 2,
) -> DataFrame:
    """Exact substring-duplication audit (the char-level dedup report of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): every ``gram_chars``-char window that occurs >=
    ``min_count`` times ANYWHERE in the corpus marks its positions as
    duplicated; overlapping marked windows are merged into maximal
    spans per document (gaps-and-islands over a running max-end).

    Output per document with at least one span: n_dup_spans, dup_chars
    (characters covered by merged spans), dup_frac_ppm (exact integer
    DIV — chars duplicated per million).

    Scale shape: the gram table is ~one row per character, but every
    shuffle key is the md5 of the gram (never the text); the hot-gram
    filter is a map-side-combinable count, the mark-back is a hash
    equi-join on that digest, and the island merge partitions by
    doc_id (state = one document's marked positions). Nothing is ever
    all-pairs. Reference analog: none (the reference has no dedup); this
    extends operators/dedup.py's window containment (q78) to exact
    char-level span coverage.
    """
    from ..plans.parallelism import ensure_min_parallelism

    # the per-char window extraction (explode + substring + md5) is the
    # CPU-heaviest map stage here and a single-file input scans as ONE
    # partition — widen it first (small-input guard, no-op at scale)
    base = ensure_min_parallelism(
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
        ).where(F.length("_t") >= gram_chars)
    )
    grams = base.select(
        "doc_id",
        F.length("_t").cast("long").alias("n_chars"),
        F.explode(
            F.sequence(F.lit(1), F.length("_t") - gram_chars + 1)
        ).alias("p"),
        F.md5(
            F.substring(F.col("_t"), F.col("p"), F.lit(gram_chars))
        ).alias("h"),
    )
    # corpus-wide occurrence count as ONE window over the digest shuffle:
    # the previous groupBy + join-back shape shuffled the gram table by h
    # twice and its persist was cache-raced by concurrent AQE stage jobs
    # (measured: the full explode+md5 pipeline ran twice, single-task)
    marked = (
        grams.withColumn("cnt", F.count(F.lit(1)).over(Window.partitionBy("h")))
        .where(F.col("cnt") >= min_count)
        .select(
            "doc_id",
            "n_chars",
            "p",
            (F.col("p") + gram_chars).alias("e"),
        )
    )
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        marked.withColumn("pme", F.max("e").over(wprev))
        .withColumn(
            "new_isl",
            (F.col("pme").isNull() | (F.col("p") > F.col("pme"))).cast("int"),
        )
        .withColumn("isl", F.sum("new_isl").over(wrun))
    )
    spans = islands.groupBy("doc_id", "isl").agg(
        F.max("n_chars").alias("n_chars"),
        (F.max("e") - F.min("p")).cast("long").alias("span_chars"),
    )
    out = (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
            F.sum("span_chars").cast("long").alias("dup_chars"),
            F.max("n_chars").alias("_nc"),
        )
        .select(
            "doc_id",
            "n_dup_spans",
            "dup_chars",
            F.expr("(dup_chars * 1000000) DIV _nc").cast("long")
            .alias("dup_frac_ppm"),
        )
    )
    return _finish_release(out)
