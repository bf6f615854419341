"""Text-analysis operators for training-data pipelines over ``documents``.

Beyond the reference's string functions (trim/upper/length,
`/root/reference/src/glue_jobs/products_etl.py:61-73`) these are the
text ops a 100 TB corpus pipeline needs: token counting, quality scoring,
language-ID heuristics, document fingerprinting. ALL logic is built-in
``pyspark.sql.functions`` (JVM, whole-stage codegen) — no Python in the
hot path — and every op has an exact DuckDB-SQL twin in
``__spark_entry__.oracle_sql`` so the driver can verify it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny fixed lexicons for the language-vote heuristic (shared with oracle)
STOPWORDS_EN = ("the", "a", "of", "and", "to")
LEXICONS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "la", "y"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (deterministic, mirrors DuckDB
    string_split_regex on trimmed input)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct split,
# restricted to the Java-regex ∩ RE2 common subset so Spark and DuckDB
# count identically: disjoint alternatives, no lookarounds)
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    """Token count under a BPE-style pre-tokenization (words / digit runs
    / single punctuation), the usual cheap proxy for LLM token budgeting
    when the real tokenizer is too expensive for a 100 TB scan."""
    return F.regexp_count(col, F.lit(BPE_ISH_PATTERN))


def stopword_ratio(col: Column, stopwords=STOPWORDS_EN) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(col: Column) -> Column:
    punct = F.length(F.regexp_replace(col, r"[^.,;:!?]", ""))
    return F.round(punct / F.greatest(F.length(col), F.lit(1)), 6)


def quality_score(col: Column) -> Column:
    """Deterministic 0..1 quality proxy: length band + stopword presence −
    punctuation excess (the standard cheap pre-filters before expensive
    dedup/training steps)."""
    length_ok = (F.length(col) >= 100) & (F.length(col) <= 20_000)
    score = (
        F.when(length_ok, 0.5).otherwise(0.0)
        + F.least(stopword_ratio(col) * 5, F.lit(0.3))
        + F.when(punct_ratio(col) <= 0.1, 0.2).otherwise(0.0)
    )
    return F.round(score, 6)


def _lexicon_hits(toks: Column, lex: tuple[str, ...]) -> Column:
    # NB: higher-order-function lambdas must take exactly the declared
    # params — a `lx=lex` default would be bound as a lambda variable
    return F.size(F.filter(toks, lambda t: t.isin(*lex)))


def lang_guess(col: Column) -> Column:
    """Language-ID heuristic: vote by lexicon-token hits, ties → 'und'.
    (A real system plugs fastText/CLD3 in the same column position.)"""
    toks = tokens(col)
    votes = {lang: _lexicon_hits(toks, lex) for lang, lex in LEXICONS.items()}
    best = F.greatest(*votes.values())
    n_best = sum(F.when(v == best, 1).otherwise(0) for v in votes.values())
    out = F.when((best == 0) | (n_best > 1), F.lit("und"))
    for lang, v in votes.items():
        out = out.when(v == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def fingerprint_md5(col: Column) -> Column:
    """Whole-document fingerprint of whitespace-normalized text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def fingerprint_shingle_min(col: Column, k: int = 16) -> Column:
    """Winnowing-style fingerprint: min md5 over character k-gram shingles
    (robust to small edits, unlike fingerprint_md5). Built from
    sequence+transform — JVM-side, no UDF."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    grams = F.transform(F.sequence(F.lit(1), n), lambda i: F.md5(norm.substr(i, F.lit(k))))
    return F.array_min(grams)


# ---------------------------------------------------------------- PII
# Patterns restricted to the Java-regex ∩ RE2 common subset (character
# classes, bounded repetition, \b word boundary — no lookarounds, no
# backreferences) so Spark and the DuckDB oracle match IDENTICAL spans.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_PATTERN = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE_PATTERN = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"

#: redaction order matters: emails first (their domains contain dots that
#: the IPv4 pattern could otherwise bite into), then phones (digit runs
#: with separators), then bare IPv4s.
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", PII_EMAIL_PATTERN, "<EMAIL>"),
    ("phone", PII_PHONE_PATTERN, "<PHONE>"),
    ("ipv4", PII_IPV4_PATTERN, "<IP>"),
)


def pii_count(col: Column, kind: str) -> Column:
    """Number of PII spans of one kind (email / phone / ipv4)."""
    pat = {k: p for k, p, _ in PII_RULES}[kind]
    return F.regexp_count(col, F.lit(pat))


def redact_pii(col: Column) -> Column:
    """Replace every PII span with its typed placeholder. Pure chained
    ``regexp_replace`` Column expressions — JVM-side, whole-stage codegen,
    exactly the scrubbing pass a pre-training corpus runs corpus-wide
    (so it must cost one map stage, never a UDF or a second scan)."""
    out = col
    for _, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub + audit in ONE pass: per-row PII counts (pre-redaction), the
    redacted text, and residual counts (post-redaction; 0 unless a span
    type overlaps another's replacement — the audit column a compliance
    pipeline keeps)."""
    c = F.col(text_col)
    red = redact_pii(c)
    return df.withColumns(
        {
            "n_emails": pii_count(c, "email"),
            "n_phones": pii_count(c, "phone"),
            "n_ipv4": pii_count(c, "ipv4"),
            text_col: red,
            "n_pii_residual": pii_count(red, "email")
            + pii_count(red, "phone")
            + pii_count(red, "ipv4"),
        }
    )


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    # regex-heavy per-row features: widen a narrow single-file scan so
    # the map stage uses the whole pool (plans/parallelism.py)
    from ..plans.parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(df)
    c = F.col(text_col)
    return df.select(
        "doc_id",
        token_count(c).alias("n_tokens"),
        bpe_ish_token_count(c).alias("n_tokens_bpe"),
        F.length(c).alias("n_chars_computed"),
        stopword_ratio(c).alias("stopword_ratio"),
        punct_ratio(c).alias("punct_ratio"),
        quality_score(c).alias("quality"),
        lang_guess(c).alias("lang_guess"),
        fingerprint_md5(c).alias("fingerprint"),
    )


# ------------------------------------------------- boilerplate n-grams
def word_ngrams(col: Column, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) over whitespace tokens —
    sequence+transform+slice Column expressions (JVM, codegen; no UDF).
    A document with fewer than ``n`` tokens yields an empty array (the
    guard matters: ``sequence(0, size-n)`` would otherwise run backwards
    and emit phantom negative offsets)."""
    toks = tokens(col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def top_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 20,
    min_docs: int = 1,
) -> DataFrame:
    """C4-style corpus heavy hitters: the ``k`` most frequent word
    n-grams with occurrence and document counts — the table a curation
    pipeline uses to find boilerplate (cookie banners, nav bars, license
    headers) before stripping it.

    Returns (gram, n_occurrences, n_docs, rank), rank 1 = most frequent,
    ties broken by gram text so the result is deterministic.

    100 TB design: explode is map-side (no shuffle); the distinct-doc
    count is a TWO-LEVEL aggregate — groupBy(gram, doc) with map-side
    combine collapses each document's internal repetitions before the
    gram-level rollup, so the second shuffle carries at most one row per
    (gram, doc) instead of one per occurrence, and no count(DISTINCT)
    expand plan ever materializes. Top-k is orderBy+limit (TakeOrdered —
    per-partition heaps + driver merge of k·P rows, never a global sort
    shuffle); the rank window runs AFTER the limit, over k rows.
    ``min_docs`` is the df-cut escape hatch: at corpus scale the gram
    dictionary is huge and the singleton tail is noise — cutting it in
    the aggregate (HAVING) keeps the top-k input small."""
    grams = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    per_doc = grams.groupBy("gram", "doc").agg(
        F.count("*").alias("occ_in_doc")
    )
    agg = per_doc.groupBy("gram").agg(
        F.sum("occ_in_doc").alias("n_occurrences"),
        F.count("*").alias("n_docs"),
    )
    if min_docs > 1:
        agg = agg.where(F.col("n_docs") >= min_docs)
    top = agg.orderBy(F.desc("n_occurrences"), "gram").limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_occurrences"), "gram")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "gram", "n_occurrences", "n_docs", "rank"
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram (Shannon) entropy in nats — the classic
    gibberish/boilerplate signal for LLM corpus curation: near-zero
    entropy flags repeated-token spam, unusually high entropy flags
    random noise. Uses the repo-wide whitespace tokenizer on
    lowercased text (same contract as q40/q98's oracles).

    Computed as ``ln(n) - (Σ c·ln c)/n`` over exact integer counts, so
    the only float ops are |vocab| logs and one division — rounded 6 dp
    to absorb cross-engine libm ulps (same guard as TF-IDF/BM25).
    Shape: explode → two stacked group-bys on (doc, token) then doc —
    both map-side combinable, one shuffle each, no windows over the
    token stream. Output: (doc_id, n_tokens, n_distinct, entropy),
    token-less documents excluded (entropy undefined on n=0).
    """
    tok = df.select(
        "doc_id",
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    ).where(F.col("tok") != "")
    counts = tok.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
            .alias("_clogc"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            F.round(
                F.log(F.col("n_tokens").cast("double"))
                - F.col("_clogc") / F.col("n_tokens").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def pmi_pairs(
    df: DataFrame,
    min_pair_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pointwise mutual information over token pairs co-occurring at the
    DOCUMENT level: PMI = ln(N·c_ab / (c_a·c_b)) — the collocation /
    topic-coherence statistic (high-PMI pairs are phrases and topical
    anchors; near-zero pairs are independent).

    Exact counts end-to-end: c_a/c_b are document frequencies, c_ab the
    pair's co-document count via a doc-keyed self equi-join (bounded by
    per-doc distinct-token counts — never corpus-quadratic), and the
    support floor ``min_pair_docs`` prunes BEFORE the df joins. The one
    float op is the final ln on a single exact ratio (the q128 ln
    contract: DECIMAL products cast to double, one division, one ln),
    rounded 6 dp.
    """
    from ..plans.parallelism import ensure_min_parallelism

    toks = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    )
    toks = toks.persist()
    n_docs = toks.select(F.countDistinct("doc").alias("n_docs"))
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        toks.select("doc", F.col("tok").alias("tok_a"))
        .join(toks.select("doc", F.col("tok").alias("tok_b")), "doc")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_docs)
    )
    dec = "decimal(38,0)"
    result = (
        pairs.join(
            dfreq.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a")),
            "tok_a",
        )
        .join(
            dfreq.select(F.col("tok").alias("tok_b"), F.col("c").alias("c_b")),
            "tok_b",
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.round(
                F.log(
                    (F.col("n_ab").cast(dec) * F.col("n_docs").cast(dec)).cast(
                        "double"
                    )
                    / (F.col("c_a").cast(dec) * F.col("c_b").cast(dec)).cast(
                        "double"
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    try:
        return result.localCheckpoint(eager=True)
    finally:
        toks.unpersist()


def effective_tokens(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Effective (post-exact-dedup) token budget per group: raw token
    count vs the count with each distinct text tallied ONCE — the
    number that matters when sizing a training run (duplicates add
    epochs, not information; q159 reports the same effect in
    characters, this in the unit the token budget is written in).

    Tokens are the repo-wide whitespace split; exact integer counts via
    the content-hash aggregate (q20's shuffle shape), one division for
    the duplication factor.
    """
    per_text = (
        df.select(
            F.col(group_col).alias("grp"),
            F.md5(F.col(text_col)).alias("h"),
            F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
            .cast("long")
            .alias("toks"),
        )
        .groupBy("grp", "h")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("toks").alias("toks_one"),
        )
    )
    return (
        per_text.groupBy("grp")
        .agg(
            F.sum(
                F.col("n_copies").cast("decimal(38,0)")
                * F.col("toks_one").cast("decimal(38,0)")
            )
            .cast("long")
            .alias("raw_tokens"),
            F.sum(F.col("toks_one").cast("decimal(38,0)"))
            .cast("long")
            .alias("effective_tokens"),
        )
        .select(
            F.col("grp").alias(group_col),
            "raw_tokens",
            "effective_tokens",
            F.round(
                F.col("raw_tokens").cast("double")
                / F.col("effective_tokens").cast("double"),
                6,
            ).alias("duplication_factor"),
        )
    )


#: 2^61 — modulus for the order-independent posting-list signature.
_SIG_MOD = 2305843009213693952


def inverted_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build the term-level inverted-index summary: per lowercased
    whitespace token — document frequency, collection frequency, and an
    exact ORDER-INDEPENDENT signature of the full posting list
    (doc -> sorted positions).

    The signature makes posting lists comparable across engines without
    materializing them: per (term, doc) an md5 over the ordered
    position list (bounded by one document's length), then per term the
    SUM mod 2^61 of a 60-bit digest of (doc_id, doc fingerprint) — a
    commutative combine, so the term-level aggregate is map-side
    combinable and never needs a sorted collect_list over an unbounded
    posting list (stop-words have corpus-sized postings; an
    order-dependent fingerprint would serialize them).

    Tokenization matches q40's contract: split(trim(lower(text)),
    '\\s+'), empty tokens dropped, positions are 0-based pre-filter
    indexes.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("ord", "term"),
    ).where(F.col("term") != "")
    perdoc = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("ord")),
                    lambda x: x.cast("string"),
                ),
                ",",
            )
        ).alias("docfp"),
    )
    sig = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "#", F.col("doc_id").cast("string"), F.col("docfp")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return perdoc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
        F.pmod(F.sum(sig), F.lit(_SIG_MOD)).cast("long").alias("postings_sig"),
    )
