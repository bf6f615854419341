"""Pure-pyarrow A/B: same compact rewrite work, no Spark.

Builds (once) a bench table at /dev/shm/spark_graft_exp/tbl-pure via a
16-core Spark session, then runs the 64-group read/concat/write with
mp.Pool at each requested proc count. Prints per-level wall + per-task
percentiles. Isolates allocator/host effects from Spark overhead.

Usage: python tools/exp_pure_arrow.py [n_turns] [procs ...] [--codec snappy|zstd]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = "/dev/shm/spark_graft_exp/tbl-pure"
CODEC = "zstd" if "--codec" in sys.argv and "zstd" in sys.argv else "snappy"


def build_table(n_turns: int):
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark
    from e_commerce_lakehouse_spark.synth import transcripts_df
    from e_commerce_lakehouse_spark.table.meta import Table
    from e_commerce_lakehouse_spark.table.writer import create_transcripts_table

    if os.path.isdir(os.path.join(ROOT, "metadata")):
        return Table.load(ROOT)
    shutil.rmtree(ROOT, ignore_errors=True)
    spark = get_spark(app_name="exp-build", cores=16, shuffle_partitions=32)
    df = transcripts_df(spark, n_turns, seed=42)
    t = create_transcripts_table(spark, ROOT, df, rows_per_file=max(2_000, n_turns // 256))
    stop_spark()
    return t


def _task(spec):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)
    try:
        pa.jemalloc_set_decay_ms(-1)
    except (NotImplementedError, AttributeError):
        pass
    t0 = time.monotonic()
    parts = [pq.read_table(os.path.join(ROOT, p)) for p in spec["paths"]]
    t1 = time.monotonic()
    merged = pa.concat_tables(parts, promote_options="none")
    out = os.path.join(spec["out_dir"], f"g{spec['gid']:05d}.parquet")
    # same timestamp pinning as the production rewrite (compact.py): the
    # A/B must measure identical work
    pq.write_table(merged, out, compression=spec["codec"],
                   coerce_timestamps="us", allow_truncated_timestamps=True)
    t2 = time.monotonic()
    return {"gid": spec["gid"], "read_ms": int((t1 - t0) * 1000),
            "write_ms": int((t2 - t1) * 1000), "pid": os.getpid()}


def pct(vals, p):
    vals = sorted(vals)
    return vals[min(len(vals) - 1, int(p / 100 * len(vals)))]


def run_level(table, procs: int, codec: str, rep: int) -> dict:
    from e_commerce_lakehouse_spark.plans.binpack import plan_bin_packing

    entries = table.entries(1)
    tb = sum(e.bytes for e in entries)
    groups, _ = plan_bin_packing(entries, max(1 << 20, tb // 64), 0.75)
    out_dir = f"/dev/shm/spark_graft_exp/pure-out-{procs}-{rep}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    specs = [{"gid": g.group_id, "paths": g.paths, "out_dir": out_dir, "codec": codec}
             for g in groups]
    with mp.Pool(procs) as pool:
        pool.map(_task, specs[:procs])  # warm forks + page pools (untimed)
        t0 = time.monotonic()
        res = pool.map(_task, specs, chunksize=1)
        wall = time.monotonic() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    reads = [r["read_ms"] for r in res]
    writes = [r["write_ms"] for r in res]
    return {"procs": procs, "codec": codec, "groups": len(specs),
            "wall_sec": round(wall, 2), "mb": round(tb / 1e6, 1),
            "read_ms": {"p50": pct(reads, 50), "p90": pct(reads, 90), "sum": sum(reads)},
            "write_ms": {"p50": pct(writes, 50), "p90": pct(writes, 90), "sum": sum(writes)}}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--") and a not in ("snappy", "zstd")]
    n_turns = int(args[0]) if args else 3_000_000
    levels = [int(c) for c in args[1:]] or [4, 16]
    table = build_table(n_turns)
    best = {}
    for rep in range(2):
        for procs in levels:
            rec = run_level(table, procs, CODEC, rep)
            rec["rep"] = rep
            print(json.dumps(rec), flush=True)
            if procs not in best or rec["wall_sec"] < best[procs]["wall_sec"]:
                best[procs] = rec
    if len(levels) == 2:
        a, b = levels
        sp = best[a]["wall_sec"] / best[b]["wall_sec"]
        print(json.dumps({"speedup": round(sp, 3), "efficiency": round(sp / (b / a), 3)}))


if __name__ == "__main__":
    main()
