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
_DRIVER_MEM = os.environ.get("SPARK_DRIVER_MEMORY", "16g")


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
        # scan parallelism: default 128MB partitions + 4MB open-cost pack
        # small files into too few map tasks to feed a wide executor pool;
        # 32MB/1MB keeps map waves ≥ cores both for small-file tables
        # (pre-compaction) and for row-group splits of 128MB target files
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        # INT96 timestamps carry no parquet min/max stats; the manifest
        # stat layer (table/stats.py) needs TIMESTAMP_MICROS for ts skipping
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", _DRIVER_MEM)
        # Xms=Xmx: G1 never shrinks the heap below Xms, so pages fault in
        # once and stay — under virtualization, heap grow/shrink re-faults
        # pages through the hypervisor mid-job (measured multi-second
        # stalls at high parallelism). Lazy faulting (no AlwaysPreTouch)
        # avoids forcing the host to back the full heap upfront.
        .config("spark.driver.extraJavaOptions", f"-Xms{_DRIVER_MEM}")
        # concurrent maintenance jobs (file-group rewrites) share the cluster
        .config("spark.scheduler.mode", "FAIR")
    )
    # Shuffle spill dir: this sandbox has ONE virtio disk (~460 MB/s) shared
    # by all executor threads — a real cluster's shuffle bandwidth scales
    # with executors. RAM-backed local dir keeps the scaling benchmark
    # measuring the engine, not the single disk.
    shm = os.environ.get("SPARK_LOCAL_SHM", "/dev/shm/spark_local")
    if os.path.isdir("/dev/shm"):
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
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
