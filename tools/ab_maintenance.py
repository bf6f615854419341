"""In-process A/B of maintenance-cycle variants under bench conditions
(page-reporting guard, warm workers/cycle, reset table) — guide §1.

Usage: python tools/ab_maintenance.py [cores] [n_turns] [reps]
Alternates the variants rep by rep (like bench's interleaved A/B) so host
windows bias both equally; reports per-variant min.

Variants come from SPARK_GRAFT_AB_ENV, a JSON dict name -> {env: value}.
Default: cluster zstd level 3 vs 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    variants = json.loads(os.environ.get(
        "SPARK_GRAFT_AB_ENV",
        '{"z3": {"SPARK_GRAFT_CLUSTER_ZSTD_LEVEL": "3"},'
        ' "z1": {"SPARK_GRAFT_CLUSTER_ZSTD_LEVEL": "1"}}',
    ))

    import bench
    from e_commerce_lakehouse_spark.operators.cluster import cluster
    from e_commerce_lakehouse_spark.operators.compact import compact
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark
    from e_commerce_lakehouse_spark.table.meta import Table

    root = bench.build_shared_table(n_turns)
    results: dict[str, list[dict]] = {k: [] for k in variants}
    with bench.page_reporting_guard():
        stop_spark()
        spark = get_spark(app_name="ab-maint", cores=cores,
                          shuffle_partitions=max(cores, 32))
        bench._warm_workers(spark, cores)
        bench._warm_cycle(spark, cores)
        for rep in range(reps):
            for name, env in variants.items():
                for k, v in env.items():
                    os.environ[k] = str(v)
                table = Table.load(root)
                base = table.entries(1)
                table.commit_manifests([table.write_manifest_for(base)],
                                       operation="reset")
                tb = table.total_bytes()
                t0 = time.monotonic()
                compact(spark, table, target_bytes=max(1 << 20, tb // 64),
                        max_concurrent_groups=max(8, cores))
                t_c = time.monotonic() - t0
                t0 = time.monotonic()
                cluster(spark, table, curve="zorder",
                        target_bytes=max(1 << 19, tb // 96))
                t_z = time.monotonic() - t0
                results[name].append(
                    {"compact": round(t_c, 2), "cluster": round(t_z, 2)})
                print(f"rep{rep} {name}: compact={t_c:.2f} cluster={t_z:.2f}",
                      flush=True)
                bench._cleanup_cycle_outputs(table)
        stop_spark()
    for name, rs in results.items():
        print(f"{name}: cluster_min={min(r['cluster'] for r in rs)} "
              f"compact_min={min(r['compact'] for r in rs)} all={rs}")


if __name__ == "__main__":
    main()
