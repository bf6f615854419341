"""Profile one compact+cluster cycle at bench scale (guide §1).

Builds (or reuses) the bench's shared 12M-turn table in /dev/shm, runs one
warm + one timed cycle at the given core count with the event log on, and
prints per-stage wall/task breakdown for the cluster phase.

Usage: python tools/profile_maintenance.py [cores] [n_turns]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EVDIR = "/tmp/spark-events-maint"


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 12_000_000
    import shutil

    import bench
    from e_commerce_lakehouse_spark.operators.cluster import cluster
    from e_commerce_lakehouse_spark.operators.compact import compact
    from e_commerce_lakehouse_spark.session import get_spark, stop_spark
    from e_commerce_lakehouse_spark.table.meta import Table

    root = bench.build_shared_table(n_turns)
    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    stop_spark()
    spark = get_spark(
        app_name=f"maint-profile-c{cores}",
        cores=cores,
        shuffle_partitions=max(cores, 32),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    bench._warm_workers(spark, cores)
    bench._warm_cycle(spark, cores)
    table = Table.load(root)
    base = table.entries(1)
    table.commit_manifests([table.write_manifest_for(base)], operation="reset")
    tb = table.total_bytes()

    spark.sparkContext.setJobDescription("compact")
    t0 = time.monotonic()
    compact(spark, table, target_bytes=max(1 << 20, tb // 64),
            max_concurrent_groups=max(8, cores))
    t_compact = time.monotonic() - t0
    spark.sparkContext.setJobDescription("cluster")
    t0 = time.monotonic()
    m = cluster(spark, table, curve="zorder", target_bytes=max(1 << 19, tb // 96))
    t_cluster = time.monotonic() - t0
    spark.sparkContext.setJobDescription(None)
    print(f"compact={t_compact:.2f}s cluster={t_cluster:.2f}s "
          f"files={m.get('output_files')}", flush=True)
    bench._cleanup_cycle_outputs(table)
    stop_spark()

    jobs, stages = {}, {}
    for dirpath, _dn, fns in os.walk(EVDIR):
        for f in fns:
            if f.startswith(".") or "appstatus" in f:
                continue
            with open(os.path.join(dirpath, f)) as fh:
                for line in fh:
                    try:
                        e = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    et = e.get("Event")
                    if et == "SparkListenerJobStart":
                        jobs[e["Job ID"]] = {
                            "start": e["Submission Time"] / 1000.0,
                            "desc": (e.get("Properties") or {}).get(
                                "spark.job.description", ""
                            ),
                            "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                        }
                    elif et == "SparkListenerJobEnd":
                        if e["Job ID"] in jobs:
                            jobs[e["Job ID"]]["end"] = e["Completion Time"] / 1000.0
                    elif et == "SparkListenerStageCompleted":
                        si = e["Stage Info"]
                        sub, com = si.get("Submission Time"), si.get("Completion Time")
                        stages.setdefault(si["Stage ID"], {}).update({
                            "name": si.get("Stage Name", "")[:70],
                            "wall": ((com - sub) / 1000.0) if sub and com else None,
                            "tasks": si.get("Number of Tasks"),
                        })
                    elif et == "SparkListenerTaskEnd":
                        st = stages.setdefault(e["Stage ID"], {})
                        m_ = e.get("Task Metrics") or {}
                        st["task_sec"] = st.get("task_sec", 0) + m_.get(
                            "Executor Run Time", 0) / 1000.0
                        inm = m_.get("Input Metrics") or {}
                        st["input_mb"] = st.get("input_mb", 0) + inm.get(
                            "Bytes Read", 0) / 1e6
                        srm = m_.get("Shuffle Read Metrics") or {}
                        st["sr_mb"] = st.get("sr_mb", 0) + (
                            srm.get("Remote Bytes Read", 0)
                            + srm.get("Local Bytes Read", 0)) / 1e6
                        swm = m_.get("Shuffle Write Metrics") or {}
                        st["sw_mb"] = st.get("sw_mb", 0) + swm.get(
                            "Shuffle Bytes Written", 0) / 1e6

    for phase in ("compact", "cluster"):
        pj = sorted((j for j in jobs.values() if j.get("desc") == phase
                     and "end" in j), key=lambda j: j["start"])
        print(f"--- {phase}: {len(pj)} jobs, "
              f"job wall sum {sum(j['end']-j['start'] for j in pj):.2f}s")
        for j in pj:
            for sid in sorted(j["stages"]):
                st = stages.get(sid) or {}
                if st.get("wall") is None:
                    continue
                print(f"  job@{j['start']%1000:7.2f} stage {sid:4d} "
                      f"wall={st['wall']:6.2f} task={st.get('task_sec', 0):7.2f} "
                      f"n={st.get('tasks'):4} in={st.get('input_mb', 0):7.1f}MB "
                      f"sr={st.get('sr_mb', 0):7.1f} sw={st.get('sw_mb', 0):7.1f}  "
                      f"{st.get('name', '')[:45]}")


if __name__ == "__main__":
    main()
