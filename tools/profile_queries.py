"""Per-query profiling harness (OPTIMIZATION r06, guide §1).

Runs a subset of headline queries exactly like bench.py (same session
shape, same _consume = .count()) but with the Spark event log enabled,
then parses the log to attribute each query's wall time to:
  - job execution (per job: wall, task-time sum, stage count)
  - driver-side gaps (planning/collect/persist between jobs)

Usage: python tools/profile_queries.py q191_tfidf_cosine_pairs q203_ann_recall_eval
With no args: the full bench HEADLINE list.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    from bench import HEADLINE

    from e_commerce_lakehouse_spark.session import get_spark, stop_spark

    names = sys.argv[1:] or HEADLINE
    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    stop_spark()
    spark = get_spark(
        app_name="profile-queries",
        cores=CPUS,
        shuffle_partitions=max(CPUS, 32),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    from e_commerce_lakehouse_spark.queries import ALL

    # warm-up like bench.py
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).limit(1).count()

    spans = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        ALL[name](spark, SF_DIR).count()
        spans[name] = (t0, time.time())
        spark.sparkContext.setJobDescription(None)
    stop_spark()

    # parse event log
    ev_files = []
    for dirpath, _dn, fns in os.walk(EVDIR):
        for f in fns:
            if not f.startswith(".") and "appstatus" not in f:
                ev_files.append(os.path.join(dirpath, f))

    def _open_ev(path):
        import io
        if path.endswith(".zstd"):
            import zstandard

            fh = zstandard.ZstdDecompressor().stream_reader(open(path, "rb"))
            return io.TextIOWrapper(fh, encoding="utf-8")
        return open(path)
    jobs = {}  # job_id -> dict
    stages = {}  # stage_id -> dict
    for evf in ev_files:
        with _open_ev(evf) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                et = e.get("Event")
                if et == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    jobs[jid] = {
                        "start": e["Submission Time"] / 1000.0,
                        "desc": (e.get("Properties") or {}).get(
                            "spark.job.description", ""
                        ),
                        "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    }
                elif et == "SparkListenerJobEnd":
                    jid = e["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = e["Completion Time"] / 1000.0
                elif et == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    stages[sid] = {
                        "name": si.get("Stage Name", "")[:60],
                        "wall": ((com - sub) / 1000.0) if sub and com else None,
                        "tasks": si.get("Number of Tasks"),
                    }
                elif et == "SparkListenerTaskEnd":
                    sid = e["Stage ID"]
                    st = stages.setdefault(sid, {})
                    m = e.get("Task Metrics") or {}
                    st["task_time"] = st.get("task_time", 0) + m.get(
                        "Executor Run Time", 0
                    ) / 1000.0
                    st["gc"] = st.get("gc", 0) + m.get("JVM GC Time", 0) / 1000.0
                    sr = (m.get("Shuffle Read Metrics") or {})
                    st["fetch_wait"] = st.get("fetch_wait", 0) + sr.get(
                        "Fetch Wait Time", 0
                    ) / 1000.0
                    st["shuffle_read_mb"] = st.get("shuffle_read_mb", 0) + (
                        sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
                    ) / 1e6
                    sw = (m.get("Shuffle Write Metrics") or {})
                    st["shuffle_write_mb"] = st.get("shuffle_write_mb", 0) + sw.get(
                        "Shuffle Bytes Written", 0
                    ) / 1e6

    out = {}
    for name, (t0, t1) in spans.items():
        qjobs = sorted(
            (j for j in jobs.values() if j.get("desc") == name and "end" in j),
            key=lambda j: j["start"],
        )
        job_wall = sum(j["end"] - j["start"] for j in qjobs)
        # driver gaps: wall not covered by any job interval
        covered = 0.0
        cur = t0
        for j in qjobs:
            s, e = max(j["start"], cur), max(j["end"], cur)
            if s < e:
                covered += e - s
                cur = e
            elif j["end"] > cur:
                cur = j["end"]
        qstages = []
        for j in qjobs:
            for sid in j["stages"]:
                st = stages.get(sid)
                if st and st.get("wall") is not None:
                    qstages.append((sid, st))
        out[name] = {
            "wall": round(t1 - t0, 2),
            "n_jobs": len(qjobs),
            "job_wall_sum": round(job_wall, 2),
            "driver_gap": round((t1 - t0) - covered, 2),
            "n_stages_run": len(qstages),
            "top_stages": [
                {
                    "id": sid,
                    "wall": round(st.get("wall") or 0, 2),
                    "task_time": round(st.get("task_time", 0), 2),
                    "tasks": st.get("tasks"),
                    "sr_mb": round(st.get("shuffle_read_mb", 0), 1),
                    "sw_mb": round(st.get("shuffle_write_mb", 0), 1),
                    "name": st.get("name", ""),
                }
                for sid, st in sorted(
                    qstages, key=lambda x: -(x[1].get("wall") or 0)
                )[:8]
            ],
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
