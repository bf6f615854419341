"""Capture .explain('formatted') for a list of queries into plans/<tag>/.

Usage: python tools/capture_plans.py <out_subdir> <suffix> q191_... q189_...
Writes plans/<out_subdir>/<query>_<suffix>.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    out_sub, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", out_sub)
    os.makedirs(out_dir, exist_ok=True)
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name="capture-plans", cores=8, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from e_commerce_lakehouse_spark.queries import ALL

    # results are localCheckpoint'ed (lineage cut -> the final plan would
    # read "Scan ExistingRDD", vacuous); capture the REAL plan instead
    try:  # Spark 4 classic: the concrete subclass defines the method
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame
    DataFrame.localCheckpoint = lambda self, eager=True: self

    for name in names:
        try:
            df = ALL[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            txt = f"EXPLAIN FAILED: {e!r}"
        lines = txt.splitlines(keepends=True)
        if len(lines) > 4000:  # unrolled iterative lineage: keep the shape
            lines = lines[:3500] + [
                f"\n... TRUNCATED: {len(lines) - 3500} further lines of "
                "repeated per-round lineage ...\n"]
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.writelines(lines)
        print("wrote", name, flush=True)
    stop_spark()


if __name__ == "__main__":
    main()
