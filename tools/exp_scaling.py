"""Scaling experiment harness (dev tool, not part of the bench contract).

Usage: python tools/exp_scaling.py [n_turns] [cores ...]
Builds the deterministic bench table ONCE (untimed, full-width session),
then measures compact+cluster at each core level on the identical input,
resetting the table to its pre-maintenance file set between runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_TMP = "/dev/shm/spark_graft_exp"


def build_shared(n_turns: int) -> str:
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark
    from e_commerce_lakehouse_spark.synth import transcripts_df
    from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

    root = os.path.join(BENCH_TMP, f"tbl-shared-{n_turns}")
    if os.path.isdir(os.path.join(root, "metadata")):
        return root
    shutil.rmtree(root, ignore_errors=True)
    stop_spark()
    spark = get_spark(app_name="exp-build", cores=16, shuffle_partitions=64)
    t0 = time.monotonic()
    df = transcripts_df(spark, n_turns, seed=42)
    create_transcripts_table(spark, root, df, rows_per_file=max(2_000, n_turns // 256))
    print(json.dumps({"built": root, "gen_sec": round(time.monotonic() - t0, 1)}), flush=True)
    stop_spark()
    return root


def run_level(root: str, cores: int, n_turns: int, reps: int = 2) -> dict:
    from e_commerce_lakehouse_spark.operators.cluster import cluster
    from e_commerce_lakehouse_spark.operators.compact import compact
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark
    from e_commerce_lakehouse_spark.table.meta import Table

    stop_spark()
    spark = get_spark(app_name=f"exp-c{cores}", cores=cores, shuffle_partitions=max(cores, 32))

    def _w(_):
        import pyarrow  # noqa

        from e_commerce_lakehouse_spark import _footer_stats  # noqa
        return 0

    spark.sparkContext.parallelize(range(cores * 2), cores * 2).map(_w).count()

    table = Table.load(root)
    best = None
    for rep in range(reps):
        base = table.entries(1)
        table.commit_manifests([table.write_manifest_for(base)], operation="reset")
        tb = table.total_bytes()
        t0 = time.monotonic()
        m_c = compact(spark, table, target_bytes=max(1 << 20, tb // 64),
                      max_concurrent_groups=max(8, cores))
        t_compact = time.monotonic() - t0
        t0 = time.monotonic()
        m_z = cluster(spark, table, curve="zorder", target_bytes=max(1 << 19, tb // 96))
        t_cluster = time.monotonic() - t0
        rec = {
            "cores": cores, "rep": rep, "n_turns": n_turns,
            "table_mb": round(tb / 1e6, 1),
            "compact_sec": round(t_compact, 2), "cluster_sec": round(t_cluster, 2),
            "wall_sec": round(t_compact + t_cluster, 2),
            "compact_groups": m_c.get("planned_groups"),
            "cluster_files": m_z.get("output_files"),
            "turns_per_sec": round(n_turns / (t_compact + t_cluster), 1),
        }
        print(json.dumps(rec), flush=True)
        if best is None or rec["wall_sec"] < best["wall_sec"]:
            best = rec
    stop_spark()
    return best


def main():
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    levels = [int(c) for c in sys.argv[2:]] or [4, 16]
    root = build_shared(n_turns)
    best = {}
    for cores in levels:
        best[cores] = run_level(root, cores, n_turns)
    if len(levels) == 2:
        a, b = levels
        sp = best[a]["wall_sec"] / best[b]["wall_sec"]
        print(json.dumps({"speedup": round(sp, 3),
                          "efficiency": round(sp / (b / a), 3)}), flush=True)


if __name__ == "__main__":
    main()
