"""Op-5: MERGE INTO — copy-on-write upsert for late-arriving corrections.

Reference analog: Delta MERGE `whenMatchedUpdateAll /
whenNotMatchedInsertAll` keyed on the PK
(`/root/reference/src/glue_jobs/orders_etl.py:179-188`,
`products_etl.py:79-88`, `order_items_etl.py:74-81`). Semantics kept:
every source row ends up in the table (matched keys overwritten, new keys
inserted); source-internal duplicates collapse keep-latest-by-ts with a
DETERMINISTIC tiebreak (the reference's window dedup `orders_etl.py:150-160`
ties nondeterministically — SURVEY.md §2.5 W1).

Physical plan, Spark-first:

1. TOUCHED-FILE PRUNING: join the source's distinct keys against the
   manifest's per-file [conv_id_min, conv_id_max] (a broadcast range
   join — the file-stats side is manifest-sized, always broadcastable).
   Only overlapping files are rewritten; a 0.01% correction batch on a
   100 TB table rewrites ~0.01% of file groups, not the table.
2. REWRITE: anti-join the touched rows against source keys (drops stale
   versions), union the deduped source, write new files.
3. COMMIT one atomic snapshot (removed = touched files, added = new).
"""

from __future__ import annotations

import math
import os
import uuid
from time import monotonic

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import TRANSCRIPTS_STAT_COLUMNS
from ..table.meta import Table
from ..table.stats import collect_entries, list_parquet_files
from ..table.writer import DEFAULT_TARGET_FILE_BYTES

DEFAULT_KEYS = ("conv_id", "turn_idx")


def dedup_keep_latest(
    df: DataFrame,
    keys: list[str] | tuple[str, ...],
    order_col: str = "ts",
) -> DataFrame:
    """Keep the latest row per key — the reference's W1 window dedup
    (`orders_etl.py:150-160`) with a deterministic content-hash tiebreak."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(order_col), F.xxhash64(*[F.col(c) for c in df.columns]).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert_dataframes(
    target: DataFrame,
    source: DataFrame,
    keys=DEFAULT_KEYS,
    order_col: str | None = "ts",
) -> DataFrame:
    """Pure dataflow MERGE semantics (whenMatchedUpdateAll +
    whenNotMatchedInsertAll): target rows whose key is absent from source,
    plus all (deduped) source rows. Used standalone as an operator and by
    ``merge_into`` for the touched-file rewrite."""
    if order_col is not None:
        source = dedup_keep_latest(source, keys, order_col)
    return target.join(source.select(*keys).distinct(), list(keys), "left_anti").unionByName(
        source
    )


def _touched_paths(
    spark: SparkSession, table: Table, source: DataFrame, key: str,
    entries=None,
) -> list[str]:
    """Manifest-stat pruning: files whose [min,max] range of ``key``
    overlaps any source key. Files lacking stats are conservatively touched.
    ``entries`` restricts the candidate set (seq-aware materialize prunes
    per tombstone-applicability class); default = the whole current
    snapshot.

    The range compare runs in the stat values' NATIVE type (schema inferred
    from the manifest values): casting a numeric key to string would order
    lexicographically ('10' < '9') and silently miss touched files.
    Timestamp keys are compared as epoch micros (the manifest's normalized
    stat form, table/stats.py)."""
    from pyspark.sql import types as T

    if entries is None:
        entries = table.entries()
    stat_rows, no_stats = [], []
    for e in entries:
        rng = e.stats.get(key)
        if rng is None:
            no_stats.append(e.path)
        else:
            stat_rows.append((e.path, rng[0], rng[1]))
    if not stat_rows:
        return no_stats
    files_df = spark.createDataFrame(stat_rows, ["path", "lo", "hi"])  # native types
    k = F.col(key)
    if isinstance(source.schema[key].dataType, T.TimestampType) and isinstance(
        files_df.schema["lo"].dataType, (T.LongType, T.IntegerType)
    ):
        k = F.unix_micros(k)
    touched = (
        source.select(k.alias("k"))
        .distinct()
        .join(
            F.broadcast(files_df),
            (F.col("k") >= F.col("lo")) & (F.col("k") <= F.col("hi")),
            "inner",
        )
        .select("path")
        .distinct()
        .collect()
    )
    return no_stats + [r["path"] for r in touched]


def merge_into(
    spark: SparkSession,
    table: Table,
    source: DataFrame,
    keys=DEFAULT_KEYS,
    order_col: str | None = "ts",
    target_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    schema=None,
    stat_columns=TRANSCRIPTS_STAT_COLUMNS,
) -> dict:
    base_snapshot = table.current_snapshot_id()
    if base_snapshot is None:
        raise ValueError("cannot merge into an empty table")
    from ..table.scan import resolve_schema

    schema = resolve_schema(table, schema=schema)
    sv_plan = table.schema_version_count() or None  # outputs' write version
    # apply pending merge-on-read tombstones first: an upsert of a
    # tombstoned key must RESURRECT it — with the tombstone still live,
    # the scan-side anti-join would silently kill the fresh row
    from .rowlevel import materialize_deletes

    materialize_deletes(spark, table, target_bytes=target_bytes, schema=schema,
                        stat_columns=stat_columns)
    t0 = monotonic()
    # align like append_dataframe does (shared helper): a producer not yet
    # updated after add_columns sends the old shape — missing nullable
    # columns fill with NULL instead of failing analysis (review finding)
    from ..table.writer import align_to_schema

    source = align_to_schema(source, schema)
    if order_col is not None:  # None: caller guarantees unique keys
        source = dedup_keep_latest(source, keys, order_col)
    from .constraints import enforce_constraints

    source = enforce_constraints(source, table, context="merge")  # O(batch), no-op w/o constraints

    touched = _touched_paths(spark, table, source, keys[0])
    entries_by_path = {e.path: e for e in table.entries()}
    touched_bytes = sum(entries_by_path[p].bytes for p in touched)

    if touched:
        # vintage-aware read: pre-rename files resolve their written
        # column names onto the current schema by field id
        from ..table.scan import read_entries

        target_df = read_entries(
            spark, table, [entries_by_path[p] for p in touched], schema
        )
    else:
        target_df = spark.createDataFrame([], schema)
    merged = merge_upsert_dataframes(target_df, source, keys, order_col=None)

    # collision-free output dir (append-{uuid} rule): a concurrent merge
    # planned from the same snapshot must lose at COMMIT time, not by
    # rmtree'ing the winner's committed files (review finding)
    subdir = f"merge-{base_snapshot:08d}-{uuid.uuid4().hex[:12]}"
    out_dir = os.path.join(table.data_dir, subdir)
    n_out = max(1, math.ceil(touched_bytes / target_bytes) or 1)
    from ..table.writer import write_rewrite_files

    added = write_rewrite_files(spark, table, merged, n_out, out_dir, stat_columns)
    for e in added:  # written under the PLAN-time schema version
        e.sv = sv_plan

    snap = table.commit_rewrite(
        touched,
        added,
        operation="merge",
        summary={"op": "merge", "touched_files": len(touched), "added_files": len(added)},
        # planned right after materialize (empty tombstone list): a
        # concurrent MoR delete must conflict — this rewrite's freshly
        # stamped outputs would be exempt from it (review finding)
        expected_tombstones=[],
    )
    return {
        "base_snapshot": base_snapshot,
        "committed_snapshot": snap.snapshot_id,
        "touched_files": len(touched),
        "total_files": len(entries_by_path),
        "added_files": len(added),
        "wall_ms": int((monotonic() - t0) * 1000),
    }
