"""Blocked fuzzy (edit-distance) matching — entity-resolution dedup.

The exact/MinHash/SimHash family in ``operators/dedup.py`` targets long
documents; dimension VALUES (product names, merchant strings) need
character-level tolerance instead. Classic ER shape: block on a cheap
deterministic key so candidate generation is an equi-join, then verify
candidates with Levenshtein — never an all-pairs cross product.

100 TB design: the value space is aggregated FIRST (distinct value +
count + a stable sample key), so a billion-row fact table with a
million distinct names costs one groupBy before any pairing — the same
aggregate-first move as ``dedup.cross_source_overlap``. Blocks bound
the quadratic stage to O(Σ block²) over the DISTINCT-value table;
`levenshtein` is a JVM builtin (codegen'd), no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_levenshtein_pairs"]


def blocked_levenshtein_pairs(
    df: DataFrame,
    value_col: str,
    key_col: str,
    block_expr,
    max_dist: int = 2,
) -> DataFrame:
    """Distinct-value pairs within a block at edit distance <= max_dist.

    ``block_expr`` is a Column computed from ``value_col`` (e.g. the
    last token, a phonetic code, a length band). Output one row per
    unordered candidate pair (``name_a < name_b`` lexicographically):
    the block key, both values, their row counts, a sample key each,
    and the distance.
    """
    vals = (
        df.select(
            F.col(value_col).alias("name"),
            F.col(key_col).alias("k"),
            block_expr.alias("block"),
        )
        .groupBy("block", "name")
        .agg(F.count("*").alias("n"), F.min("k").alias("sample_key"))
    )
    a = vals.select(
        "block",
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
        F.col("sample_key").alias("key_a"),
    )
    b = vals.select(
        "block",
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
        F.col("sample_key").alias("key_b"),
    )
    pairs = a.join(b, "block").where(F.col("name_a") < F.col("name_b"))
    return pairs.withColumn(
        "dist", F.levenshtein("name_a", "name_b").cast("long")
    ).where(F.col("dist") <= F.lit(max_dist))
