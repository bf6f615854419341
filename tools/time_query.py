"""Quick A/B timer: run named queries N times in one bench-shaped session.

Usage: python tools/time_query.py [-n 3] q191_tfidf_cosine_pairs [...]
Prints per-run seconds and the min (bench methodology uses a warm session,
so min-of-N is the comparable steady-state figure).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark

    stop_spark()
    spark = get_spark(app_name="time-query", cores=CPUS,
                      shuffle_partitions=max(CPUS, 32))
    from e_commerce_lakehouse_spark.queries import ALL

    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).limit(1).count()
    for name in args:
        times = []
        for _ in range(n):
            t0 = time.monotonic()
            ALL[name](spark, SF_DIR).count()
            times.append(round(time.monotonic() - t0, 3))
        print(f"{name}: min={min(times)} runs={times}", flush=True)
    stop_spark()


if __name__ == "__main__":
    main()
