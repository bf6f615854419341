"""SparkSession factory.

Reference analog: the Glue jobs build a SparkSession with Delta extensions
(`/root/reference/config/aws_config.py:64-69`). We build a plain Spark 4
session tuned for the lakehouse engine: AQE on (runtime coalesce +
skew-join split), Arrow on (vectorized pandas UDF path), UTC session
timezone (stable oracle comparison), shuffle partitions sized to cores
rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "e_commerce_lakehouse_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cores`` sets ``local[N]``; default comes from $SPARK_GRAFT_CPUS or
    ``local[*]``. In bench mode callers stop the session and rebuild with a
    different core count to evidence N→4N scaling (BASELINE.md).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 timestamps carry no parquet min/max stats; the manifest
        # stat layer (table/stats.py) needs TIMESTAMP_MICROS for ts skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # concurrent maintenance jobs (file-group rewrites) share the cluster
        .config("spark.scheduler.mode", "FAIR")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Stop the active session (bench uses this to switch core counts)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
