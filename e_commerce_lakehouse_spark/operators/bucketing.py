"""Bucketed writes and shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Spark's writer-side bucketing (`bucketBy(n, key)` +
`sortBy(key)` on `saveAsTable`) pre-partitions the data ON DISK by
`hash(key) % n`, so a later SortMergeJoin between two tables bucketed
on the same key with the same bucket count needs NO Exchange on either
side — the scan itself satisfies the join's distribution requirement
(`HashClusteredDistribution`), and with `sortBy` the per-bucket sort is
free too. This is the standard Hive/Spark co-location contract; the
same idea underlies Iceberg's `bucket[n]` partition transform used by
this repo's own table format (`table/meta.py` PartitionField).

Reference analog: none — the reference joins via Glue-managed Delta
tables and always pays the shuffle (`/root/reference/src/glue_jobs/
orders_etl.py`). This module is the engine's answer to the "co-locate
joins via bucketing" scale requirement.

Scale notes:
- bucket count is a physical-layout decision made ONCE at write time;
  every subsequent join/aggregate on the bucket key is shuffle-free,
  which is exactly the amortization a 1000-executor recurring pipeline
  wants (write once, join daily).
- `spark.sql.sources.v1BucketingEnabled` semantics: Spark only elides
  the Exchange when BOTH sides report the same `HashPartitioning`; a
  mismatched bucket count still elides one side (the larger), which is
  why `bucketed_join` forces equal counts.
- bucket pruning: an equality filter on the bucket key prunes the scan
  to 1/n of the files with no index — `SELECT ... WHERE key = k` reads
  one bucket. Caveat: Spark's DisableUnnecessaryBucketedScan rule
  turns the bucketed read off for pure-filter queries (it only weighs
  distribution needs); set
  `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` around
  point lookups to keep the pruning (tests/test_bucketing.py pins
  `SelectedBucketsCount: 1 out of 8`).
- catalog scope: the session catalog here is in-memory, so the table
  NAMES die with the session while the parquet files persist; a real
  deployment fronts this with Hive/Glue/Unity metastore. Within one
  job (write → join) nothing else is needed, which is the shape
  `bucketed_join` provides.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_bucketed",
    "read_bucketed",
    "bucketed_join",
    "exchange_count",
]

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan.

    Counts only `Exchange hashpartitioning/rangepartitioning/...`
    shuffles — `BroadcastExchange` is not a shuffle and is excluded.
    AQE note: on an un-executed plan Spark reports the initial physical
    plan, which is what we want to pin (AQE can only REMOVE exchanges
    at runtime, never add them).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(
        [m for m in re.finditer(r"\bExchange ", plan)]
    )


def _check_ident(name: str, what: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(f"invalid {what} identifier: {name!r}")
    return name


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    database: str = "bucketed",
    location: str | None = None,
    sort: bool = True,
) -> str:
    """Persist ``df`` as a bucketed parquet table; returns the qualified
    table name.

    The table lands in ``database`` (created if absent, rooted at
    ``location`` when given, so bucketed artifacts never pollute the
    caller's cwd warehouse). ``mode=overwrite`` makes the write
    idempotent for re-runs.
    """
    _check_ident(table_name, "table")
    _check_ident(database, "database")
    _check_ident(key, "column")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    qualified = f"{database}.{table_name}"
    # mode=overwrite is idempotent only while the table is REGISTERED:
    # a fresh session whose predecessor was killed mid-write (or whose
    # catalog died with the session) can find the bare directory still
    # on disk and fail CREATE with LOCATION_ALREADY_EXISTS. Clear the
    # stale local location when the catalog has no such table. The base
    # comes from the catalog's OWN database location (a pre-existing
    # database pins its original root — the ``location`` argument is
    # ignored by CREATE IF NOT EXISTS), so the guard clears the path
    # saveAsTable will actually use. Single-writer assumption: this is
    # the bench/query helper, not a concurrent ingest path.
    if not spark.catalog.tableExists(qualified):
        import os
        import shutil
        from urllib.parse import urlparse

        db_loc = spark.catalog.getDatabase(database).locationUri
        parsed = urlparse(db_loc)
        if parsed.scheme in ("", "file"):
            stale = os.path.join(parsed.path or db_loc, table_name)
            if os.path.isdir(stale):
                shutil.rmtree(stale, ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(qualified)
    return qualified


def read_bucketed(spark: SparkSession, qualified: str) -> DataFrame:
    return spark.table(qualified)


def bucketed_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_buckets: int,
    names: tuple[str, str] = ("bj_left", "bj_right"),
    database: str = "bucketed",
    location: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Write both sides bucketed on their join keys (same bucket count),
    then join the bucketed tables with a merge-join hint.

    The resulting plan has ZERO shuffle Exchanges for the join itself
    (pinned by `tests/test_bucketing.py`): each side's scan already
    satisfies the SortMergeJoin's distribution AND ordering. The
    `merge` hint suppresses broadcast so the plan shape is the one a
    100 TB fact-fact join would take, where neither side broadcasts.

    When ``left_key != right_key`` the right side is renamed to the
    left key for the bucket layout and restored in the output — Spark's
    bucket co-location matches on the hash of the column VALUE, which
    is name-independent, but keeping one name makes the join condition
    trivially `USING`-shaped.
    """
    lt = write_bucketed(
        spark, left, names[0], left_key, n_buckets,
        database=database, location=location,
    )
    rdf = right
    if right_key != left_key:
        rdf = right.withColumnRenamed(right_key, left_key)
    rt = write_bucketed(
        spark, rdf, names[1], left_key, n_buckets,
        database=database, location=location,
    )
    lb = read_bucketed(spark, lt)
    rb = read_bucketed(spark, rt)
    joined = lb.hint("merge").join(rb, on=left_key, how=how)
    return joined
