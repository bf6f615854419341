"""Deterministic, distributed transcripts generator.

Generates the engine's primary input per BASELINE.json ``input_hint``:
an Iceberg-style table of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Design constraints (FIXTURES.md §1):
- fully deterministic from (seed, n_turns) — every value derives from
  ``xxhash64`` of (seed, row id); no wall clock, no RNG state;
- generated DISTRIBUTED via ``spark.range`` + built-in column expressions
  (JVM-side, whole-stage codegen) so the generator itself scales to the
  10^12-turn story — no driver-side numpy materialization;
- conversation sizes are power-law skewed (hot-conversation skew, ~1-3%
  of all turns landing in conv rank 0) so salting / AQE skew handling is
  actually exercised;
- ``ts`` is monotone non-decreasing within a conversation with planted
  ties (zero increments) to exercise deterministic tiebreaks.

Reference analog: the reference's unit fixtures plant duplicates and
invalid rows by hand (`/root/reference/tests/conftest.py:26-33`); we
generate the equivalent at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .schema import TRANSCRIPTS_SCHEMA

TOOL_NAMES = ("search", "bash", "python", "browser")

# power-law exponent: conv rank r receives mass ∝ r^(1/SKEW_P - 1);
# with P=3 the hottest conversation holds ~(1/n_convs)^(1/3) of all turns
SKEW_P = 3.0

_U64_MAX = float(2**64)


def _u01(*cols) -> F.Column:
    """Deterministic uniform(0,1) from xxhash64 of the given columns."""
    h = F.xxhash64(*cols)
    # map signed int64 -> [0,1): shift to unsigned range as double
    return (h.cast("double") / _U64_MAX) + F.lit(0.5)


def transcripts_df(
    spark: SparkSession,
    n_turns: int,
    seed: int = 42,
    avg_turns_per_conv: int = 20,
    n_partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts DataFrame, distributed and deterministic."""
    n_convs = max(4, n_turns // avg_turns_per_conv)
    if n_partitions is None:
        n_partitions = max(8, min(256, n_turns // 50_000 + 8))
    base = spark.range(0, n_turns, 1, n_partitions)
    s = F.lit(seed)

    # skewed conversation assignment: rank = floor(n_convs * u^P)
    u = _u01(s, F.lit("conv"), F.col("id"))
    conv_rank = F.floor(F.lit(float(n_convs)) * F.pow(u, F.lit(SKEW_P))).cast("long")
    df = base.withColumn("conv_rank", conv_rank)

    # dense turn_idx per conversation (deterministic: ordered by row id)
    w = Window.partitionBy("conv_rank").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    # monotone non-decreasing ts with planted ties: per-turn increment in
    # {0..6} minutes (0 ≈ 1/7 of turns → ties), running-summed per conv
    inc_min = F.xxhash64(s, F.lit("inc"), F.col("conv_rank"), F.col("turn_idx")) % 7
    inc_min = F.abs(inc_min)
    run = Window.partitionBy("conv_rank").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    base_epoch = F.lit(1_700_000_000)  # fixed, not wall clock
    conv_start = base_epoch + (F.abs(F.xxhash64(s, F.lit("t0"), F.col("conv_rank"))) % 10_000_000)
    epoch = conv_start + F.sum(inc_min * 60).over(run)
    df = df.withColumn("ts", F.timestamp_seconds(epoch))

    # role: cyclic user/assistant with occasional system/tool
    rh = F.abs(F.xxhash64(s, F.lit("role"), F.col("id")))
    df = df.withColumn(
        "role",
        F.when(F.col("turn_idx") == 0, F.lit("system"))
        .when(rh % 19 == 3, F.lit("tool"))
        .when(F.col("turn_idx") % 2 == 1, F.lit("assistant"))
        .otherwise(F.lit("user")),
    )
    tool_arr = F.array(*[F.lit(t) for t in TOOL_NAMES])
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.element_at(tool_arr, (rh % len(TOOL_NAMES) + 1).cast("int")),
        ),
    )

    # pseudo-text, length 10..2000, derived from md5 of the row identity
    text_len = (F.abs(F.xxhash64(s, F.lit("len"), F.col("id"))) % 1991 + 10).cast("int")
    seed_hex = F.md5(F.concat_ws("|", s, F.col("conv_rank"), F.col("turn_idx")))
    df = df.withColumn("text", F.substring(F.repeat(seed_hex, 63), 1, 2000).substr(F.lit(1), text_len))

    df = df.withColumn("conv_id", F.format_string("conv-%012d", F.col("conv_rank")))
    return df.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.col("tool"),
        F.col("ts"),
    )


def corrections_df(
    spark: SparkSession,
    transcripts: DataFrame,
    seed: int = 42,
    update_pct: int = 1,
    n_inserts: int = 0,
) -> DataFrame:
    """MERGE source: ~update_pct% of existing keys with modified text and a
    later ts, plus optional brand-new conversations (insert path).

    Reference analog: late-arriving file re-processed through MERGE
    `whenMatchedUpdateAll/whenNotMatchedInsertAll`
    (`/root/reference/src/glue_jobs/orders_etl.py:179-188`).
    """
    s = F.lit(seed)
    pick = (
        F.abs(F.xxhash64(s, F.lit("corr"), F.col("conv_id"), F.col("turn_idx"))) % 100
        < update_pct
    )
    updates = (
        transcripts.where(pick)
        .withColumn("text", F.concat(F.lit("[corrected] "), F.col("text")))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    if n_inserts <= 0:
        return updates
    ins = spark.range(0, n_inserts, 1, 4).select(
        F.format_string("conv-new-%08d", F.floor(F.col("id") / 4)).alias("conv_id"),
        (F.col("id") % 4).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.md5(F.concat_ws("|", s, F.lit("ins"), F.col("id"))).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.timestamp_seconds(F.lit(1_710_000_000) + F.col("id")).alias("ts"),
    )
    return updates.unionByName(ins)


def expected_schema():
    return TRANSCRIPTS_SCHEMA
