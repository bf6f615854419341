"""Training-data curation operators: decontamination, repetition quality,
sequence packing, stratified sampling.

These extend the dedup/text family (SURVEY.md §2 "LLM-data-pipeline
operators") with the remaining curation stages a pre-training pipeline
runs between dedup and tokenization:

- ``decontaminate``: benchmark n-gram overlap removal (the GPT-3 appendix-C
  shape: any document sharing an n-gram with an eval set is flagged).
- ``repetition_stats``: Gopher-style repetition quality signals
  (duplicate-word / duplicate-n-gram / top-word fractions; Rae et al. 2021
  §A1.1) as pure Column expressions plus one (doc_id, token) aggregation.
- ``pack_sequences``: concat-and-chunk packing offsets — every document's
  byte position in the virtual concatenated token stream, computed with a
  DISTRIBUTED prefix sum (partition-local cumsum + broadcast partition
  offsets), never a single-partition global window.
- ``stratified_sample``: deterministic per-stratum quota sampling by md5
  rank (companion to the corpus-wide hash-gate sample, queries.q51).

Scale notes (100 TB): the benchmark side of decontamination is distinct
shingle hashes — eval sets are tiny relative to the corpus, so it is
broadcast; the corpus side never self-joins. Repetition stats shuffle on
(doc_id, token) then (doc_id) — linear in corpus size. Packing's only
full-data shuffle is one repartitionByRange on the order key; the
cross-partition carry is numPartitions scalars on the driver.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _finish_release, word_shingles
from . import text as tx

__all__ = [
    "decontaminate",
    "repetition_stats",
    "distributed_cumsum",
    "distributed_running_max",
    "pack_sequences",
    "stratified_sample",
    "temperature_resample",
    "perplexity_buckets",
    "quality_funnel",
    "exact_quantiles",
    "grouped_exact_quantiles",
    "tfidf_doc_scores",
    "domain_mix_weights",
    "length_outlier_filter",
    "shard_shuffle",
]


def _shingle_hash60(shingle: Column) -> Column:
    """60-bit md5-prefix int key (same key the Jaccard/MinHash family uses:
    8-byte join keys instead of strings)."""
    return F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (GPT-3 style).

    Returns one row per corpus document: ``(id_col, n_hit_shingles,
    contaminated)`` where ``n_hit_shingles`` is how many of the document's
    DISTINCT n-grams also occur anywhere in ``benchmark``.

    Plan shape: the benchmark collapses to its distinct 60-bit shingle
    hashes — for a real eval suite that is thousands of rows against a
    multi-billion-document corpus, so it is broadcast
    (``broadcast_benchmark=True``); the corpus side is a single explode +
    one aggregation keyed by ``id_col``. No corpus self-join, nothing
    quadratic.
    """
    bench_h = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("shingle"))
        .select(_shingle_hash60(F.col("shingle")).alias("h"))
        .distinct()
    )
    if broadcast_benchmark:
        bench_h = F.broadcast(bench_h)
    corpus_h = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    ).select(id_col, _shingle_hash60(F.col("shingle")).alias("h"))
    hits = (
        corpus_h.join(bench_h, "h")
        .groupBy(id_col)
        .agg(F.count_distinct("h").alias("n_hit_shingles"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hit_shingles"), F.lit(0)).alias("n_hit_shingles"),
            (F.coalesce(F.col("n_hit_shingles"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def _gram_frac_dup(words: Column, n: int) -> Column:
    """Fraction of the document's word n-grams that are repeats
    (1 - distinct/total); 0.0 when fewer than n words."""
    m = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
        lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]),
    )
    return F.when(
        m >= 1,
        F.round(1.0 - F.size(F.array_distinct(grams)) / F.size(grams), 6),
    ).otherwise(F.lit(0.0))


def _top_word_frac(df: DataFrame, words: Column, id_col: str) -> DataFrame:
    """(id, _twf): most-frequent-token share per document, 6-dp rounded —
    the Gopher top-word signal, shared by ``repetition_stats`` and
    ``quality_funnel`` so the q65/q109 oracle pair cannot drift. The one
    shuffled piece of the family: (id, token) count then (id) max."""
    return (
        df.select(id_col, F.explode(words).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.round(F.max("c") / F.sum("c"), 6).alias("_twf"))
    )


def repetition_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_word_max: float = 0.20,
    dup_2gram_max: float = 0.60,
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Columns: n_words, dup_word_frac, dup_2gram_frac, dup_3gram_frac
    (pure Column expressions — whole-stage codegen, no shuffle),
    top_word_frac (one (id, token) count + one (id) max — the only
    shuffled part), and ``gopher_pass`` combining the thresholds.
    """
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(
        id_col,
        F.size(words).alias("n_words"),
        F.round(1.0 - F.size(F.array_distinct(words)) / F.size(words), 6).alias(
            "dup_word_frac"
        ),
        _gram_frac_dup(words, 2).alias("dup_2gram_frac"),
        _gram_frac_dup(words, 3).alias("dup_3gram_frac"),
    )
    top = _top_word_frac(df, words, id_col).select(
        id_col, F.col("_twf").alias("top_word_frac")
    )
    return base.join(top, id_col).select(
        id_col,
        "n_words",
        "dup_word_frac",
        "dup_2gram_frac",
        "dup_3gram_frac",
        "top_word_frac",
        (
            (F.col("top_word_frac") <= top_word_max)
            & (F.col("dup_2gram_frac") <= dup_2gram_max)
        ).alias("gopher_pass"),
    )


def distributed_cumsum(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_col`` order,
    WITHOUT a single-partition global window.

    The naive ``Window.orderBy(order_col)`` plan collapses the whole table
    into one task (Spark's global-order window has no partition key) — a
    non-starter at 100 TB. Instead:

      1. one ``repartitionByRange(order_col)`` + ``sortWithinPartitions``
         (the only full-data shuffle),
      2. partition-local cumsum in Arrow batches (``mapInArrow`` with a
         running carry across the partition's batch iterator — order
         preserved, zero shuffle),
      3. per-partition totals → driver (numPartitions scalars), exclusive
         prefix over THOSE, broadcast-joined back per partition.

    The per-partition join key is the partition's MINIMUM order value —
    derived from the data, never ``TaskContext.partitionId()``. The task
    partition id is the STAGE partition index: when Catalyst pipelines the
    map stage into a union (e.g. inside ``exceptAll``) the ids shift by
    the sibling child's partition count, and the two evaluations of this
    subtree (totals side vs row side) would key off different ids and
    silently drop whole partitions. Range boundaries are deterministic
    for a given input, so the min-key is stable across re-evaluations.

    Requires ``order_col`` values be globally unique (ties across the
    range boundary would make the order, hence the sum, nondeterministic).
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(nparts, order_col).sortWithinPartitions(order_col)

    fields = list(ranged.schema.fields)
    key_type = ranged.schema[order_col].dataType.simpleString()
    out_schema_ddl = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + f", `_pmin` {key_type}, `{out_col}` bigint"
    )

    def _local_cumsum(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.compute as pc

        carry = 0
        pmin = None
        for b in batches:
            if pmin is None and b.num_rows:
                pmin = b.column(order_col)[0]  # partition is sorted: first = min
            vals = pc.cast(b.column(value_col), pa.int64())
            cs = pc.add(pc.cumulative_sum(vals), carry)
            carry = cs[-1].as_py() if len(cs) else carry
            arrays = list(b.columns) + [
                pa.array([pmin.as_py()] * b.num_rows, b.column(order_col).type),
                cs,
            ]
            names = [f.name for f in fields] + ["_pmin", out_col]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    local = ranged.mapInArrow(_local_cumsum, out_schema_ddl)
    # CRITICAL: materialize ONCE. The totals/offsets broadcast runs as a
    # separate job from the row-side join, and two independent
    # evaluations of this subtree can sample DIFFERENT range boundaries
    # (RangePartitioner seeds off the evaluation's RDD id) — the two
    # sides then carry different _pmin key sets and the join silently
    # drops whole partitions (caught by the sf0.1 sweep: q108 returned
    # a varying ~6-12% of its rows). A lazy localCheckpoint computes the
    # stage in the first job and serves the second from the cached
    # blocks, so both sides see one partitioning.
    local = local.localCheckpoint(eager=False)
    totals = local.groupBy("_pmin").agg(F.max(out_col).alias("_tot"))
    w = Window.orderBy("_pmin").rowsBetween(Window.unboundedPreceding, -1)
    # the window below IS single-partition — over numPartitions rows, not data
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w), F.lit(0)).cast("long")
    ).select("_pmin", "_off")
    return (
        local.join(F.broadcast(offsets), "_pmin")
        .withColumn(out_col, (F.col(out_col) + F.col("_off")).cast("long"))
        .drop("_pmin", "_off")
    )


def distributed_running_max(
    df: DataFrame,
    *,
    order_col: str,
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global running max of ``value_col`` over STRICTLY PRECEDING
    rows in ``order_col`` order (exclusive prefix max), without a
    single-partition global window.

    Same three-stage shape as ``distributed_cumsum`` (one range shuffle,
    partition-local Arrow scan with a carry, per-partition maxima →
    driver → exclusive prefix over numPartitions scalars, broadcast
    back), with max as the monoid instead of sum. The first row in
    global order has no preceding value and gets NULL.

    This is the batch twin of a streaming event-time watermark: the
    exclusive running max of event time in ARRIVAL order is exactly the
    watermark a `withWatermark(0s)` stream would have carried before
    each element, so `running_max - ts` is the element's lateness —
    the number `withWatermark(delay)` tuning needs.

    Requires ``order_col`` globally unique and ``value_col`` int64
    (cast timestamps to ``unix_micros`` at the call site).
    """
    spark = df.sparkSession
    nparts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(nparts, order_col).sortWithinPartitions(order_col)

    fields = list(ranged.schema.fields)
    key_type = ranged.schema[order_col].dataType.simpleString()
    out_schema_ddl = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in fields)
        + f", `_pmin` {key_type}, `{out_col}` bigint, `_pmax_v` bigint"
    )
    _NEG = -(2**63)

    def _local_runmax(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        carry = _NEG  # max over all preceding rows in this partition
        pmin = None
        for b in batches:
            if pmin is None and b.num_rows:
                pmin = b.column(order_col)[0]  # sorted: first = min
            vals = pc_cast_i64(b.column(value_col))
            inc = np.maximum.accumulate(
                np.concatenate(([carry], vals.to_numpy(zero_copy_only=False)))
            )
            excl = inc[:-1]  # max over strictly preceding rows
            carry = int(inc[-1])
            arrays = list(b.columns) + [
                pa.array([pmin.as_py()] * b.num_rows, b.column(order_col).type),
                pa.array(excl, pa.int64()),
                pa.array([carry] * b.num_rows, pa.int64()),
            ]
            names = [f.name for f in fields] + ["_pmin", out_col, "_pmax_v"]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    def pc_cast_i64(arr):
        import pyarrow.compute as pc

        return pc.cast(arr, pa.int64())

    local = ranged.mapInArrow(_local_runmax, out_schema_ddl)
    # one evaluation only — same RangePartitioner-reseeding hazard as
    # distributed_cumsum (see the comment there)
    local = local.localCheckpoint(eager=False)
    totals = local.groupBy("_pmin").agg(F.max("_pmax_v").alias("_pm"))
    w = Window.orderBy("_pmin").rowsBetween(Window.unboundedPreceding, -1)
    # window over numPartitions rows, not data
    offsets = totals.withColumn(
        "_off", F.coalesce(F.max("_pm").over(w), F.lit(_NEG)).cast("long")
    ).select("_pmin", "_off")
    return (
        local.join(F.broadcast(offsets), "_pmin")
        .withColumn(out_col, F.greatest(F.col(out_col), F.col("_off")))
        .withColumn(
            out_col,
            F.when(F.col(out_col) == F.lit(_NEG), F.lit(None).cast("long")).otherwise(
                F.col(out_col)
            ),
        )
        .drop("_pmin", "_off", "_pmax_v")
    )


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk packing offsets (the GPT pre-training shape:
    documents are concatenated in ``id_col`` order and split into
    ``budget``-token training sequences; documents may straddle chunks).

    Per document: token count, start offset in the virtual stream, the
    first/last chunk it lands in, and how many chunks it spans. Built on
    :func:`distributed_cumsum`, so the only full-data shuffle is the range
    partition on ``id_col``.
    """
    toks = df.select(
        id_col,
        F.size(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("n_tokens"),
    )
    cum = distributed_cumsum(
        toks,
        order_col=id_col,
        value_col="n_tokens",
        out_col="_cum",
        num_partitions=num_partitions,
    )
    start = (F.col("_cum") - F.col("n_tokens")).cast("long")
    first = F.floor(start / budget).cast("long")
    last = F.floor((F.col("_cum") - 1) / budget).cast("long")
    return cum.select(
        id_col,
        "n_tokens",
        start.alias("start_offset"),
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks_spanned"),
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    id_col: str = "doc_id",
    cap_per_stratum: int,
) -> DataFrame:
    """Deterministic per-stratum quota sample: the ``cap_per_stratum``
    documents with the smallest md5(id) rank inside each stratum.

    Partition-layout independent (rank is a pure function of the id, the
    tiebreak is the id itself) and shuffle-bounded by the stratum key —
    the per-stratum sort is a top-k inside each window partition, never a
    global sort. Companion to the corpus-wide hash-gate sample
    (queries.q51): quotas rebalance skewed strata (languages, sources)
    instead of preserving their natural frequencies.
    """
    gate = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(gate, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= cap_per_stratum)
        .select(id_col, strata_col, "sample_rank")
    )


def weighted_sample(
    df: DataFrame,
    *,
    weight_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme over md5-derived uniforms: each row
    draws u = md5_frac(id) in (0,1] and priority ln(u)/w (monotone
    equivalent of u^(1/w)); the n LARGEST priorities are the sample, and
    inclusion probability is proportional to weight. Quality-weighted
    data selection ("sample 10M docs, favor high-quality") with a fixed,
    replayable outcome — the u's are pure functions of the id, so the
    SAME sample falls out on any cluster, any partitioning, any engine
    that can md5 (DuckDB twin: q86).

    Scale shape: one global top-n (TakeOrdered — per-partition heaps,
    no full sort). Priorities are ROUNDED to 9 dp before ranking with
    the id as tiebreak: Java and DuckDB libm may differ in the last ulp
    of ln(), and an unrounded rank could flip the n-th boundary between
    engines; at 9 dp a flip needs two priorities within 1e-9 — ties are
    then broken identically by id. Rows with NULL or non-positive
    weights are excluded (zero weight = never sampled)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # u in (0, 1]: (h60 + 1) / 2^60 — md5 prefix as a 60-bit uniform
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)         .cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(1 << 60))
    prio = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    ranked = (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("priority", prio)
        .orderBy(F.desc("priority"), F.col(id_col))
        .limit(n)
    )
    return ranked.select(id_col, weight_col, "priority")


def tfidf_doc_scores(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TF-IDF document scores: mean and max token IDF per document —
    the "rare-token density" quality signal (high mean-IDF = unusual
    vocabulary; near-zero = boilerplate).

    Two aggregations, both keyed well at scale: document frequency
    shuffles on the token (vocabulary-sized, not corpus-sized), the
    per-doc rollup shuffles on (id, token) then (id). The tiny DF table
    (one row per distinct token) is broadcast back onto the token
    stream. IDF = ln((N + 1) / (df + 1)) (smoothed), rounded to 6 dp in
    both engines.
    """
    toks = df.select(
        id_col,
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"),
    )
    n_docs = df.count()  # one scalar to the driver, reused as a literal
    docfreq = (
        toks.select(id_col, "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("df"))
        .withColumn(
            "idf", F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
        )
    )
    per_doc_tok = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    return (
        per_doc_tok.join(F.broadcast(docfreq), "tok")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_distinct_tokens"),
            F.round(F.sum(F.col("tf") * F.col("idf")) / F.sum("tf"), 6).alias(
                "mean_idf"
            ),
            F.round(F.max("idf"), 6).alias("max_idf"),
        )
    )


def domain_mix_weights(
    df: DataFrame,
    *,
    domain_col: str = "source",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain resampling weights for a target mixture.

    With no explicit ``target``, the target is uniform across observed
    domains. Output per domain: document count, actual fraction, target
    fraction, and ``weight = target_frac / actual_frac`` — the factor a
    sampler multiplies into each document's keep-probability to hit the
    mixture. One groupBy on the domain key; the totals join is a
    broadcast of one row.
    """
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(
        F.sum("n_docs").alias("_total"), F.count("*").alias("_n_domains")
    )
    out = counts.crossJoin(F.broadcast(total))
    if target is None:
        tgt = 1.0 / F.col("_n_domains")
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]
        )
        tgt = F.coalesce(mapping[F.col(domain_col)], F.lit(0.0))
    return out.select(
        domain_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("_total"), 6).alias("actual_frac"),
        F.round(tgt, 6).alias("target_frac"),
        F.round(tgt / (F.col("n_docs") / F.col("_total")), 6).alias("weight"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 document scores for a fixed term set — the standard
    retrieval/quality scorer one notch above ``tfidf_doc_scores``
    (length-normalized, tf-saturating).

    score(D) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    with the Lucene-smoothed idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Scale shape: doc length rides ALONG with the token stream (no
    second pass or join back to the corpus), so the only corpus-sized
    shuffle is the (doc, term) tf aggregate — map-side combinable. The
    document-frequency table is at most ``len(query_terms)`` rows and
    broadcasts. N/avgdl are one tiny driver aggregate (exact: integer
    sum / count in both engines). Scores rounded to 6 dp so double
    summation order can't flip the value hash (q67's convention).

    Output: (doc_id, n_matched_terms, bm25) — docs matching >=1 term.
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    n_docs, total_len = (
        df.select(
            F.count("*").alias("n"),
            F.sum(F.size(F.split(F.trim(F.lower(F.col(text_col))),
                                 r"\s+"))).alias("s"),
        ).collect()[0]
    )
    avgdl = float(total_len) / float(n_docs)
    arr = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(
        id_col, F.size(arr).alias("dl"), F.explode(arr).alias("tok")
    ).where(F.col("tok").isin([t.lower() for t in query_terms]))
    tf = toks.groupBy(id_col, "dl", "tok").agg(F.count("*").alias("tf"))
    dfreq = (
        tf.groupBy("tok")
        .agg(F.countDistinct(id_col).alias("df"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    contrib = F.col("idf") * F.col("tf") * (k1 + 1.0) / denom
    return (
        tf.join(F.broadcast(dfreq), "tok")
        .groupBy(id_col)
        .agg(
            F.countDistinct("tok").alias("n_matched_terms"),
            F.round(F.sum(contrib), 6).alias("bm25"),
        )
    )


def length_outlier_filter(
    df: DataFrame,
    *,
    length_col: str = "n_chars",
    by: str = "source",
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Heuristic quality gate: drop each domain's length-distribution
    tails (C4/Gopher keep documents inside a length band; doing it per
    domain keeps a long-form domain from eating a short-form one's
    budget). Keeps rows whose per-domain ``percent_rank`` over the length
    column lies in [lo, hi]; the rank is emitted as ``length_pct`` so
    downstream stages can re-cut without recomputing the window.

    Ties share a rank (percent_rank is rank-based), so the result is a
    pure function of the values — no ordering nondeterminism. Scale: one
    shuffle on the domain key. For corpora where a single domain exceeds
    executor memory, swap the exact window for approx_percentile
    bounds computed in a first aggregate pass (two scans, no big window)
    — the exact window is the oracled variant.
    """
    w = Window.partitionBy(by).orderBy(F.col(length_col))
    out = df.withColumn("length_pct", F.round(F.percent_rank().over(w), 6))
    return out.where(
        (F.col("length_pct") >= lo) & (F.col("length_pct") <= hi)
    )


def chunk_documents(
    df: DataFrame,
    window_words: int = 64,
    stride_words: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking — the RAG/pretraining primitive that turns
    long documents into fixed-size overlapping windows (stride <= window
    gives ``window - stride`` words of overlap between neighbors, so a
    fact straddling a boundary appears whole in some chunk).

    All JVM column expressions, zero UDFs: split to words once, generate
    the start offsets with ``sequence`` (step = stride, ending at the
    last offset that still starts a NEW span — short docs yield exactly
    one chunk), posexplode, slice + rejoin. Cost is O(total output
    words) in whole-stage codegen; no shuffle at all (the explode is
    pipelined into the scan), so it scales embarrassingly. Returns
    (id, chunk_idx, n_chunks, chunk_text, n_words).

    Unlike pack_sequences (q64: concat-and-cut to a token budget, no
    overlap, crosses documents) this is per-document and overlapping —
    the two ends of the chunking spectrum a training pipeline needs."""
    if window_words < 1 or stride_words < 1:
        raise ValueError("window_words and stride_words must be >= 1")
    if stride_words > window_words:
        raise ValueError("stride_words must be <= window_words "
                         "(gaps would silently drop words)")
    words = F.split(F.col(text_col), " ")
    n = F.size(words)
    # last start: the largest multiple of stride <= n-1 that still adds
    # coverage; ceil((n - window) / stride) * stride, floored at 0
    last = F.greatest(
        F.lit(0),
        F.ceil((n - F.lit(window_words)).cast("double")
               / F.lit(stride_words)).cast("int") * F.lit(stride_words),
    )
    starts = F.sequence(F.lit(0), last, F.lit(stride_words))
    out = (
        df.select(
            F.col(id_col),
            words.alias("_w"),
            F.size(starts).alias("n_chunks"),
            F.posexplode(starts).alias("chunk_idx", "_s"),
        )
        .select(
            id_col,
            "chunk_idx",
            "n_chunks",
            F.array_join(
                F.slice("_w", F.col("_s") + 1, window_words), " "
            ).alias("chunk_text"),
            F.least(F.size("_w") - F.col("_s"),
                    F.lit(window_words)).alias("n_words"),
        )
    )
    return out


def shard_shuffle(
    df: DataFrame,
    *,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Deterministic global shuffle into training shards: assign every
    document a ``shard`` in [0, n_shards) and a ``pos`` (1-based) inside
    its shard, both pure functions of md5(seed || ':' || id).

    The pre-training primitive ``df.orderBy(rand())`` can't give you —
    Spark's ``rand``/``sample`` seeds are partition-layout dependent, so
    the "shuffled" order changes when the input splits differently.
    Here the permutation is replayable on any cluster size, any engine
    that can md5, and any re-run: shard = first 32 bits of the hash mod
    n_shards, order within a shard = the full hash (ties impossible
    beyond the id tiebreak). Changing ``seed`` draws an independent
    permutation (epoch reshuffles).

    Scale shape (100 TB): exactly ONE hash shuffle on the shard key,
    then a per-shard sort — set ``n_shards`` so one shard ≈ one output
    file (thousands to millions of shards at corpus scale) and every
    window partition is a single bounded task; there is no global sort
    and no driver-side state. Reference analog: none (the reference has
    no sampling/shuffle surface); this is SURVEY §2 "LLM-data-pipeline
    operators" territory, DuckDB-oracled as q102.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("shuffle_key", F.col(id_col))
    return (
        df.select(F.col(id_col), h.alias("shuffle_key"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    val_frac: float = 0.125,
    id_col: str = "doc_id",
    seed: str = "0",
) -> DataFrame:
    """Train/val split that near-duplicates cannot straddle: the split
    decision hashes the near-dup CLUSTER id, not the document id, so
    every member of a component lands on the same side of the boundary.
    Per-doc hash splits leak — a benchmark answer duplicated into a
    near-identical page lands in train while its twin lands in val, and
    the eval is contaminated by construction. Returns ``docs`` plus
    ``split_unit`` (the cluster id, or the doc's own id for singletons)
    and ``split`` ('train' | 'val').

    Determinism: unit = coalesce(cluster_id, id); val iff the first 32
    bits of md5(seed || ':' || unit) fall below floor(val_frac * 2^32)
    — bit-identical across engines, cluster sizes, and re-runs (same
    gate as q51), and stable under corpus growth: a NEW document never
    flips an EXISTING singleton's side (its unit is unchanged), only
    genuine new near-dup edges can re-unit a doc.

    Scale shape (100 TB): the cluster table holds only docs that appear
    in a near-dup pair — a small fraction of the corpus — so the join
    back is broadcastable; the gate itself is a pure column expression
    at the scan. Label propagation (operators/graph.py) is O(diameter)
    equi-join rounds. Reference analog: none; SURVEY §2 training-data
    territory, DuckDB-oracled as q105 (recursive-CTE clusters + the
    same md5 gate).
    """
    if not 0.0 < val_frac < 1.0:
        raise ValueError("val_frac must be in (0, 1)")
    from .graph import dedup_clusters

    clusters = dedup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    joined = docs.join(F.broadcast(clusters), on=id_col, how="left")
    unit = F.coalesce(F.col("cluster_id"), F.col(id_col))
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), unit.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    threshold = int(val_frac * (1 << 32))
    return (
        joined.withColumn("split_unit", unit)
        .withColumn(
            "split",
            F.when(bucket < F.lit(threshold), F.lit("val")).otherwise(
                F.lit("train")
            ),
        )
        .drop("cluster_id")
    )

def temperature_resample(
    df: DataFrame,
    *,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled multilingual resampling (the XLM-R / mBERT
    exponential-smoothing scheme, Conneau et al. 2020 eq. 1): stratum l
    gets share q_l proportional to n_l^alpha, so low-resource strata are
    UPweighted relative to their natural frequency (alpha=1 preserves it,
    alpha=0 is uniform). Each stratum's quota is budget*q_l capped at
    n_l (sampling is without replacement — upsampling beyond a stratum's
    population is the repeat-epochs knob, not this operator's), filled by
    the smallest-md5(id) documents in the stratum.

    Determinism across engines: alpha=0.5 routes through sqrt(), which
    IEEE 754 specifies exactly-rounded on every platform (unlike pow/ln);
    shares are rounded to 9 dp before the quota multiply and the product
    to 6 dp before floor, so a cross-engine last-ulp wobble in the share
    SUM cannot flip a quota boundary (same guard as ``weighted_sample``).
    Other alphas work but ride java/libm pow() and lose the bit-exact
    cross-engine guarantee — the DuckDB oracle twin (q107) pins 0.5.

    Scale shape: one count aggregate (|strata| rows, driver-safe), the
    quota table broadcast back, one per-stratum top-quota window — the
    same bounded shuffle as ``stratified_sample``. Nothing global."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    ncol = F.col("n_docs").cast("double")
    scaled = F.sqrt(ncol) if alpha == 0.5 else F.pow(ncol, F.lit(float(alpha)))
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_docs")).withColumn("scaled", scaled)
    z = counts.agg(F.sum("scaled").alias("z"))
    quotas = (
        counts.crossJoin(F.broadcast(z))
        .withColumn("share", F.round(F.col("scaled") / F.col("z"), 9))
        .withColumn(
            "quota",
            F.least(
                F.col("n_docs"),
                F.floor(F.round(F.lit(budget) * F.col("share"), 6)).cast("long"),
            ).cast("int"),
        )
        .select(strata_col, "quota")
    )
    gate = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(gate, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .join(F.broadcast(quotas), strata_col)
        .where(F.col("sample_rank") <= F.col("quota"))
        .select(id_col, strata_col, "sample_rank", "quota")
    )

def perplexity_buckets(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document by language-model cross-entropy and split the corpus into
    exact head/middle/tail tertiles — the head is the cleanest third,
    the tail the likeliest-garbage third. CCNet scores with an external
    KenLM 5-gram; this operator self-trains an add-one-smoothed BIGRAM
    LM from the corpus (no external model artifacts), which preserves
    the pipeline shape and keeps the DuckDB twin exact (q108).

    Per-doc score: mean over bigrams of -ln((c12+1)/(c1+V)) in nats,
    where c12/c1 are corpus bigram/context counts and V the unigram
    vocabulary size; rounded to 6 dp so the avg's cross-engine sum-order
    ulp wobble cannot leak into the value hash (q67's guard). Documents
    with fewer than two tokens have no bigrams and are excluded.

    Scale shape: the bigram stream is one explode (persisted across its
    three uses); the LM tables are distinct-bigram/-unigram bounded —
    far below corpus size, equi-joined back onto the stream (stopword
    bigrams are the skew risk: AQE skew-join territory, and a df-cut on
    c12 heavy hitters is the escape hatch); the per-doc aggregate
    shuffles on id. The tertile assignment is an EXACT global ntile
    WITHOUT a single-partition window: global rank via
    ``distributed_cumsum`` of ones over a fixed-width (ce, id) sort key
    (range shuffle + partition-local Arrow cumsum + numPartitions-row
    offset table), then pure ntile arithmetic from (rank, n)."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    toks = df.select(F.col(id_col), words.alias("w"))
    vocab = toks.select(F.explode("w").alias("tok")).agg(
        F.count_distinct("tok").alias("vsz")
    )
    seq = F.when(F.size("w") >= 2, F.sequence(F.lit(1), F.size("w") - 1)).otherwise(
        F.array().cast("array<int>")
    )
    bigs = (
        toks.select(
            id_col,
            F.explode(
                F.transform(
                    seq,
                    lambda i: F.struct(
                        F.element_at(F.col("w"), i).alias("w1"),
                        F.element_at(F.col("w"), (i + F.lit(1)).cast("int")).alias("w2"),
                    ),
                )
            ).alias("bg"),
        )
        .select(id_col, "bg.w1", "bg.w2")
        .persist()
    )
    c12 = bigs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bigs.groupBy("w1").agg(F.count("*").alias("c1"))
    neg_logp = -F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("vsz"))
    )
    scores = (
        bigs.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(neg_logp), 6).alias("cross_entropy"),
        )
        .persist()
    )
    n = scores.count()  # materializes scores off the persisted bigram stream
    bigs.unpersist()
    # fixed-width sort key: zero-padded micro-nats then the id encoded
    # order-preserving for the FULL int64 range (value + 2^63 as a
    # 20-digit decimal — lpad on a raw string would TRUNCATE long ids
    # and misorder negative ones, breaking distributed_cumsum's
    # uniqueness precondition). Integral id types only, enforced.
    id_dt = df.schema[id_col].dataType.simpleString()
    if id_dt not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(
            f"perplexity_buckets needs an integral {id_col!r} "
            f"(got {id_dt}): the tertile rank's fixed-width sort key "
            "encodes the id numerically"
        )
    id_enc = F.lpad(
        (
            F.col(id_col).cast("decimal(20,0)")
            + F.lit("9223372036854775808").cast("decimal(20,0)")
        )
        .cast("decimal(20,0)")
        .cast("string"),
        20,
        "0",
    )
    keyed = scores.withColumn(
        "_rk",
        F.concat(
            F.lpad(F.round(F.col("cross_entropy") * 1e6).cast("long").cast("string"), 12, "0"),
            F.lit("-"),
            id_enc,
        ),
    ).withColumn("_one", F.lit(1))
    ranked = distributed_cumsum(keyed, order_col="_rk", value_col="_one", out_col="_rank")
    k = 3
    small_sz, big = divmod(n, k)
    big_sz = small_sz + 1
    boundary = big * big_sz
    r = F.col("_rank")
    if small_sz == 0:  # n < k: everything lands in the leading tiles
        tile = r
    else:
        tile = F.when(
            r <= boundary, F.floor((r - 1) / F.lit(big_sz)) + 1
        ).otherwise(F.lit(big) + F.floor((r - boundary - 1) / F.lit(small_sz)) + 1)
    bucket = (
        F.when(tile == 1, "head").when(tile == 2, "middle").otherwise("tail")
    )
    out = ranked.select(id_col, "n_bigrams", "cross_entropy", bucket.alias("bucket"))
    return _finish_release(out, scores)

def quality_funnel(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_chars: int = 100,
    max_chars: int = 2000,
    allowed_langs: tuple[str, ...] = ("en", "es", "de", "fr"),
    top_word_max: float = 0.20,
    dup_2gram_max: float = 0.60,
) -> DataFrame:
    """Composed quality gate with per-document rule attribution — the
    final filter a production corpus ships (Dolma / RefinedWeb publish
    exactly this rule stack with its attrition table). Rules evaluate in
    a FIXED order and every document records the FIRST rule it failed:

      1. ``length``     — char count outside [min_chars, max_chars]
      2. ``lang``       — declared language not in the allowlist
      3. ``repetition`` — Gopher gate (top_word_frac / dup_2gram_frac)
      4. ``pii``        — any un-redacted PII span (email/phone/IPv4)

    Returns (id, n_chars, first_failed_rule, keep); the attrition funnel
    is ``GROUP BY first_failed_rule`` on top. First-failure attribution
    (not a bitmask) is what makes the funnel additive: rule counts sum
    to the drop total, so pipeline owners can rank rules by cost.

    Scale shape: rules 1, 2, 4 and dup_2gram are pure Column
    expressions (one codegen'd map stage over the scan); top_word_frac
    is the only shuffle — the same (id, token) aggregate
    ``repetition_stats`` pays. Nothing joins the corpus to itself."""
    c = F.col(text_col)
    words = F.split(F.trim(F.lower(c)), r"\s+")
    pii_total = (
        tx.pii_count(c, "email") + tx.pii_count(c, "phone") + tx.pii_count(c, "ipv4")
    )
    base = df.select(
        id_col,
        F.col(lang_col),
        F.length(c).cast("long").alias("n_chars"),
        _gram_frac_dup(words, 2).alias("_d2"),
        pii_total.alias("_pii"),
    )
    top = _top_word_frac(df, words, id_col)
    # NULL-total rules: a null text is a length failure (not a silently
    # dropped row — explode(NULL) would erase it from the inner-joined
    # aggregate, so the join below is LEFT); a null lang fails the
    # allowlist (bare NOT IN returns NULL and would slip through).
    first_failed = (
        F.when(
            F.col("n_chars").isNull()
            | (F.col("n_chars") < min_chars)
            | (F.col("n_chars") > max_chars),
            "length",
        )
        .when(
            F.col(lang_col).isNull() | ~F.col(lang_col).isin(*allowed_langs), "lang"
        )
        .when(
            (F.col("_twf") > top_word_max) | (F.col("_d2") > dup_2gram_max),
            "repetition",
        )
        .when(F.col("_pii") > 0, "pii")
        .otherwise("none")
    )
    return (
        base.join(top, id_col, "left")
        .withColumn("first_failed_rule", first_failed)
        .select(
            id_col,
            "n_chars",
            "first_failed_rule",
            (F.col("first_failed_rule") == "none").alias("keep"),
        )
    )

def _rank_key_enc(col: str) -> Column:
    """Order-preserving fixed-width encoding of a signed int64 column:
    +2^63 offset into an unsigned decimal, zero-padded to 20 digits —
    string order == numeric order. Shared by exact_quantiles and
    interpolated_quantiles (the distributed-rank order key)."""
    return F.lpad(
        (
            F.col(col).cast("decimal(20,0)")
            + F.lit("9223372036854775808").cast("decimal(20,0)")
        )
        .cast("decimal(20,0)")
        .cast("string"),
        20,
        "0",
    )


def exact_quantiles(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str = "doc_id",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT nearest-rank quantiles of an integral column, distributed.

    Spark's exact ``percentile`` aggregate buffers every value of the
    group in one reducer — a non-starter corpus-wide at 100 TB — and
    ``approx_percentile`` trades the exactness a data contract may pin.
    This takes the third path: global rank via ``distributed_cumsum``
    (one range shuffle + partition-local Arrow cumsum, no
    single-partition sort), then each quantile q picks the row at
    nearest-rank ``max(1, ceil(q*n))``. Ordering ties break by
    ``id_col`` so the picked VALUE is deterministic even under heavy
    value duplication. Result is len(qs) rows: (quantile, rank, value)
    — collected driver-side, bounded by len(qs).

    Integral value/id columns only (the rank key is the same
    order-preserving offset-decimal encoding ``perplexity_buckets``
    uses; float keys would need an IEEE total-order encoding this
    deliberately does not attempt)."""
    for col in (value_col, id_col):
        dt = df.schema[col].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise TypeError(f"exact_quantiles needs integral {col!r} (got {dt})")
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1]")

    keyed = df.select(
        F.col(value_col).cast("long").alias("value"),
        F.concat(
            _rank_key_enc(value_col), F.lit("-"), _rank_key_enc(id_col)
        ).alias("_rk"),
    ).withColumn("_one", F.lit(1))
    ranked = distributed_cumsum(keyed, order_col="_rk", value_col="_one", out_col="_rank")
    n = df.count()
    spark = df.sparkSession
    if n == 0:
        return spark.createDataFrame([], "quantile double, rank long, value long")
    import math

    targets = {q: max(1, math.ceil(q * n)) for q in qs}
    hit = {
        r["_rank"]: r["value"]
        for r in ranked.where(
            F.col("_rank").isin(*set(targets.values()))
        ).collect()
    }
    rows = [(float(q), int(rk), int(hit[rk])) for q, rk in sorted(targets.items())]
    return spark.createDataFrame(rows, "quantile double, rank long, value long")

def grouped_exact_quantiles(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    id_col: str = "doc_id",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact nearest-rank quantiles PER GROUP — the per-domain length/
    quality contract companion to the corpus-wide ``exact_quantiles``.

    Here the window IS partitioned (by ``group_col``), so the plan is
    one shuffle on the group key and scale-safe as long as no single
    group approaches corpus size (a whole-corpus group is what
    ``exact_quantiles``'s distributed rank is for — that skew note is
    the boundary between the two). Targets are max(1, ceil(q*n_g)) per
    group; ties break by ``id_col``. Output: one row per (group, q)."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("each q must be in (0, 1]")
    dt = df.schema[value_col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint"):
        raise TypeError(f"grouped_exact_quantiles needs integral {value_col!r} (got {dt})")
    spark = df.sparkSession
    w = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("rank", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy(group_col)))
    )
    qdf = F.broadcast(
        spark.createDataFrame([(float(q),) for q in sorted(qs)], "quantile double")
    )
    target = F.greatest(F.lit(1), F.ceil(F.col("quantile") * F.col("_n")))
    return (
        ranked.join(qdf, F.col("rank") == target)
        .select(
            group_col,
            "quantile",
            F.col("rank").cast("long").alias("rank"),
            F.col(value_col).cast("long").alias("value"),
        )
    )


def mixture_drift(
    df: DataFrame,
    group_col: str = "source",
    cat_col: str = "lang",
) -> DataFrame:
    """Per-group KL divergence of a categorical distribution vs the
    whole-corpus distribution — the mixture-drift monitor a multi-source
    training pipeline runs per ingest (is src17 suddenly all-zh?).

    KL(P_g || P_corpus) = Σ_c p_g(c) * ln(p_g(c) / p(c)). No smoothing
    needed: the corpus includes every group, so p(c) > 0 wherever
    p_g(c) > 0. NULL categories AND NULL groups count as their own
    '__null__' bucket (coalesced) rather than silently dropping rows —
    a NULL group would otherwise vanish through the count-table
    equi-joins while still inflating the corpus denominator.

    Scale: two count aggregates on (group, cat) and (cat) — both
    map-side combinable; the per-category corpus table is
    vocabulary-sized, so the join broadcasts. Probabilities are exact
    integer ratios; the ln/multiply tail is a handful of terms per
    group, so 6-dp rounding is far beyond any accumulation ulp.
    """
    cat = F.coalesce(F.col(cat_col), F.lit("__null__")).alias("cat")
    grp = F.coalesce(F.col(group_col), F.lit("__null__")).alias("grp")
    base = df.select(grp, cat)
    # ONE scan: the (group, cat) count table is persisted because its
    # three downstream re-aggregations use DIFFERENT groupings (grp /
    # cat / global), so Spark's exchange reuse can't share them — without
    # the persist each would rescan the corpus.
    by_gc = (
        base.groupBy("grp", "cat").agg(F.count("*").alias("c_gc")).persist()
    )
    by_g = by_gc.groupBy("grp").agg(F.sum("c_gc").cast("long").alias("n_g"))
    by_c = by_gc.groupBy("cat").agg(F.sum("c_gc").cast("long").alias("c_c"))
    total = by_c.agg(F.sum("c_c").cast("long").alias("n_total"))
    p_g = F.col("c_gc") / F.col("n_g")
    p = F.col("c_c") / F.col("n_total")
    term = p_g * F.log(p_g / p)
    result = (
        by_gc.join(by_g, "grp")
        .join(F.broadcast(by_c), "cat")
        .crossJoin(F.broadcast(total))
        .groupBy("grp")
        .agg(
            F.max("n_g").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_cats"),
            F.round(F.sum(term), 6).alias("kl_nats"),
        )
        .select(F.col("grp").alias(group_col), "n_docs", "n_cats", "kl_nats")
    )
    # result is per-group tiny; checkpoint eagerly and release the cache
    # so a long sweep doesn't accumulate persisted count tables
    return _finish_release(result, by_gc)


def negative_sampling(
    positives: DataFrame,
    items: DataFrame,
    k: int = 3,
    n_buckets: int = 8,
    user_col: str = "user_id",
    item_col: str = "item_id",
) -> DataFrame:
    """Deterministic hash-bucketed negative sampling for contrastive /
    ranking training data: for each user with positives, emit ``k``
    pseudo-random NEGATIVE items (never interacted) drawn from the
    user's hash bucket of the item catalog, ranked by the md5 of the
    (user, item) pair — a fixed, engine-portable permutation, so the
    sample is reproducible run-over-run and Spark/DuckDB-identical
    (the q51 md5-gate contract; no rand(), no seed plumbing).

    Scale shape: the candidate space is users × (|catalog| / n_buckets)
    via an EQUI-join on the bucket id — never users × catalog; raise
    ``n_buckets`` as the catalog grows to hold the per-user candidate
    count constant. The anti-join on positives and the per-user top-k
    window both share the user-key shuffle. Bucketing trades candidate
    breadth for cost (a user only sees 1/n_buckets of the catalog) —
    the standard in-batch/bucketed negative-mining compromise.
    """
    from pyspark.sql import Window

    def _h(col):
        return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")

    users = positives.select(user_col).distinct().select(
        user_col, (_h(F.col(user_col).cast("string")) % n_buckets).alias("b")
    )
    catalog = items.select(item_col).distinct().select(
        item_col, (_h(F.col(item_col).cast("string")) % n_buckets).alias("b")
    )
    cands = users.join(catalog, "b").select(user_col, item_col)
    negs = cands.join(positives.select(user_col, item_col).distinct(),
                      [user_col, item_col], "left_anti")
    pair_rank = _h(
        F.concat_ws(
            "#", F.col(user_col).cast("string"), F.col(item_col).cast("string")
        )
    )
    w = Window.partitionBy(user_col).orderBy(
        pair_rank.asc(), F.col(item_col).asc()
    )
    return (
        negs.select(user_col, item_col, F.row_number().over(w).alias("rnk"))
        .where(F.col("rnk") <= k)
        .select(
            user_col,
            F.col(item_col).alias("neg_item"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def exact_stratified_split(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    test_bp: int = 2000,
) -> DataFrame:
    """Stratified train/test split whose test-set size is EXACT: the
    global quota T = N·test_bp // 10000 (basis points — integer
    fraction, no float), per-stratum base quotas by floor division,
    and the leftover distributed by largest remainder (remainder desc,
    stratum asc — q127's allocation rule applied to sampling). Within
    each stratum the chosen rows are the smallest md5(id) ranks — the
    q51/q66 deterministic-gate contract, reproducible run-over-run.

    Invariant (pinned by the oracle): Σ n_test = N·test_bp // 10000
    EXACTLY — the proportional-float split every naive implementation
    ships can be off by ±(#strata) rows, which matters when the test
    set feeds a paired benchmark.

    Scale: the quota table is strata-bounded (its window is a single
    partition over |strata| rows — fine for any real strata column);
    row selection is one md5-rank window per stratum on the same
    shuffle as the count. Output: (stratum, n_total, n_test, n_train).
    """
    from pyspark.sql import Window

    base = df.where(F.col(id_col).isNotNull()).select(
        F.col(strata_col).alias("st"), F.col(id_col).alias("rid")
    )
    counts = base.groupBy("st").agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").cast("long").alias("n_total_all"),
        F.sum(F.expr(f"(n_s * {test_bp}) div 10000")).cast("long").alias(
            "base_sum"
        ),
    )
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "st",
            "n_s",
            F.expr(f"(n_s * {test_bp}) div 10000").cast("long").alias("base"),
            ((F.col("n_s") * test_bp) % 10000).alias("rem"),
            (
                F.expr(f"(n_total_all * {test_bp}) div 10000").cast("long")
                - F.col("base_sum")
            ).alias("leftover"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("rem").desc(), F.col("st").asc_nulls_last())
            ),
        )
        .select(
            "st",
            "n_s",
            (F.col("base") + (F.col("rk") <= F.col("leftover")).cast("long")).alias(
                "quota"
            ),
        )
    )
    w = Window.partitionBy("st").orderBy(
        F.md5(F.col("rid").cast("string")).asc(), F.col("rid").asc()
    )
    # null-safe quota join: a NULL stratum is a real group (matches the
    # oracle's IS NOT DISTINCT FROM)
    q2 = quotas.select(F.col("st").alias("q_st"), "quota")
    picked = (
        base.withColumn("rn", F.row_number().over(w))
        .join(q2, F.col("st").eqNullSafe(F.col("q_st")))
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum((F.col("rn") <= F.col("quota")).cast("long")).alias("n_test"),
        )
    )
    return picked.select(
        F.col("st").alias(strata_col),
        "n_total",
        "n_test",
        (F.col("n_total") - F.col("n_test")).alias("n_train"),
    )


def shard_rebalance_diff(
    df: DataFrame,
    n_from: int = 8,
    n_to: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Data-placement policy comparison for a shard-count change: how
    many rows MOVE when shards go ``n_from`` → ``n_to`` under (a)
    modulo placement (md5(id) % n — a row stays only when
    h mod lcm(n_from, n_to) lands in the agreeing residues: 80% moves
    for 8→10) and (b) rendezvous/HRW hashing (argmax_s md5(id||s) —
    moves only ~(1 − n_from/n_to) = 20% for 8→10, the
    consistent-hashing bound). The number that
    decides whether a re-shard is an overnight job or a month of
    egress.

    Pure projections (the rendezvous argmax is an array_max over a
    literal shard list — no join, no shuffle except the final 2-row
    rollup); md5 everywhere, so the diff is engine-portable and
    reproducible.
    """

    def _h(col):
        return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

    sid = F.col(id_col).cast("string")
    mod_from = _h(sid) % n_from
    mod_to = _h(sid) % n_to

    def _rdv(n):
        entries = F.array(
            *[
                F.struct(
                    _h(F.concat_ws("#", sid, F.lit(str(s)))).alias("hv"),
                    F.lit(s).alias("shard"),
                )
                for s in range(n)
            ]
        )
        return F.array_max(entries)["shard"]

    marked = df.select(
        (mod_from != mod_to).cast("long").alias("moved_mod"),
        (_rdv(n_from) != _rdv(n_to)).cast("long").alias("moved_rdv"),
    )
    agg = marked.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("moved_mod").cast("long").alias("mv_mod"),
        F.sum("moved_rdv").cast("long").alias("mv_rdv"),
    )
    mod_row = agg.select(
        F.lit("modulo").alias("policy"),
        "n_rows",
        F.col("mv_mod").alias("n_moved"),
        F.round(F.col("mv_mod").cast("double") / F.col("n_rows").cast("double"), 6).alias("pct_moved"),
    )
    rdv_row = agg.select(
        F.lit("rendezvous").alias("policy"),
        "n_rows",
        F.col("mv_rdv").alias("n_moved"),
        F.round(F.col("mv_rdv").cast("double") / F.col("n_rows").cast("double"), 6).alias("pct_moved"),
    )
    return mod_row.unionByName(rdv_row)


def interpolated_quantiles(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str = "doc_id",
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """EXACT percentile_cont semantics, distributed: linear
    interpolation between the two nearest ranks at position
    ``q*(n-1)+1`` — the continuous companion to ``exact_quantiles``'s
    nearest-rank (percentile_disc) contract, without Spark's
    single-reducer ``percentile`` aggregate.

    Global rank comes from ``distributed_cumsum`` (range shuffle +
    Arrow partition-local cumsum — no single-partition sort); only the
    <= 2*len(qs) boundary rows come to the driver. The interpolated
    value is raw double arithmetic on two integer bounds with
    IEEE-identical operation order in any engine (no rounding applied:
    the bits match by construction).

    Output: (quantile, lo_rank, hi_rank, value) — len(qs) rows.
    """
    import math

    for col in (value_col, id_col):
        dt = df.schema[col].dataType.simpleString()
        if dt not in ("bigint", "int", "smallint", "tinyint"):
            raise TypeError(
                f"interpolated_quantiles needs integral {col!r} (got {dt})"
            )
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("each q must be in [0, 1]")

    # NULLs are excluded from both the rank and n — a NULL value/id
    # would encode a NULL order key (breaking distributed_cumsum's
    # unique-key contract) while still inflating the count
    base = df.where(
        F.col(value_col).isNotNull() & F.col(id_col).isNotNull()
    )
    keyed = base.select(
        F.col(value_col).cast("long").alias("value"),
        F.concat(
            _rank_key_enc(value_col), F.lit("-"), _rank_key_enc(id_col)
        ).alias("_rk"),
    ).withColumn("_one", F.lit(1))
    ranked = distributed_cumsum(
        keyed, order_col="_rk", value_col="_one", out_col="_rank"
    )
    n = base.count()
    spark = df.sparkSession
    schema = "quantile double, lo_rank long, hi_rank long, value double"
    if n == 0:
        return spark.createDataFrame([], schema)
    targets = []  # list, not dict: duplicate qs keep their rows
    for q in sorted(float(q) for q in qs):
        pos = q * (n - 1) + 1.0
        lo = int(math.floor(pos))
        hi = int(math.ceil(pos))
        targets.append((q, lo, hi, pos - lo))
    need = {r for _, lo, hi, _ in targets for r in (lo, hi)}
    hit = {
        r["_rank"]: r["value"]
        for r in ranked.where(F.col("_rank").isin(*need)).collect()
    }
    rows = []
    for q, lo, hi, frac in targets:
        vlo, vhi = float(hit[lo]), float(hit[hi])
        rows.append((q, lo, hi, vlo + (vhi - vlo) * frac))
    return spark.createDataFrame(rows, schema)
