"""Profile declared queries job-by-job (guide §1: measure first).

Starts the SAME session shape as bench.py (master local[N], shuffle
partitions = N, AQE on) plus event logging, runs the named queries via
``entry.queries()[name](spark, SF_DIR).count()`` with a job description per
query, then parses the event log into a per-query breakdown:

  per query: wall seconds, #jobs, #stages, #tasks, sum of task time,
             and the top stages by wall clock (submission→completion).

Usage:
  python tools/profile_query.py dedup_incremental dedup_stream_ingest
  PROFILE_REPEAT=2 python tools/profile_query.py corpus_curate

This is a dev-only tool; bench.py stays the frozen measurement.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EVDIR = "/tmp/spark_graft_eventlog"
REPEAT = int(os.environ.get("PROFILE_REPEAT", "1"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: profile_query.py <query> [<query> ...]")
        sys.exit(2)

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("profile")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", EVDIR)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    walls: dict[str, list[float]] = defaultdict(list)
    for rep in range(REPEAT):
        for name in names:
            spark.sparkContext.setJobDescription(f"Q::{name}::{rep}")
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            walls[name].append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # ---- parse the event log ----
    ev_path = None
    for p in Path(EVDIR).iterdir():
        if app_id in p.name:
            ev_path = p
    assert ev_path, f"no event log for {app_id}"
    if ev_path.is_dir():  # Spark 4 rolling event log: events_*_<appid> files
        import io

        def _read(f: Path) -> str:
            raw = f.read_bytes()
            if f.suffix == ".zstd":
                import zstandard
                raw = zstandard.ZstdDecompressor().decompressobj() \
                    .decompress(raw)
            return raw.decode("utf-8", errors="replace")

        parts = sorted(
            (int(f.name.split("_")[1]), f) for f in ev_path.iterdir()
            if f.name.startswith("events_"))
        assert parts, f"no event files under {ev_path}"
        ev_path = io.StringIO("".join(_read(f) for _, f in parts))

    jobs = {}          # job_id -> dict
    stages = {}        # stage_id -> dict
    job_of_stage = {}
    fh_src = ev_path if hasattr(ev_path, "read") else open(ev_path)
    with fh_src as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", "")
                jid = ev["Job ID"]
                jobs[jid] = {"desc": desc, "t0": ev["Submission Time"],
                             "stages": [s["Stage ID"]
                                        for s in ev["Stage Infos"]]}
                for s in ev["Stage Infos"]:
                    job_of_stage[s["Stage ID"]] = jid
            elif kind == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time"),
                }
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {})
                m = ev.get("Task Metrics") or {}
                st["task_ms"] = st.get("task_ms", 0) + \
                    m.get("Executor Run Time", 0)
                st["task_n"] = st.get("task_n", 0) + 1

    per_q = defaultdict(lambda: {"jobs": 0, "stages": 0, "tasks": 0,
                                 "job_wall_ms": 0, "task_ms": 0,
                                 "top": []})
    for jid, j in sorted(jobs.items()):
        q = j["desc"].split("::")[1] if j["desc"].startswith("Q::") else "_"
        agg = per_q[q]
        agg["jobs"] += 1
        agg["job_wall_ms"] += j.get("t1", j["t0"]) - j["t0"]
        for sid in j["stages"]:
            st = stages.get(sid)
            if not st or st.get("t0") is None:
                continue   # skipped (reused) stage
            agg["stages"] += 1
            agg["tasks"] += st.get("task_n", 0)
            agg["task_ms"] += st.get("task_ms", 0)
            wall = (st.get("t1") or st["t0"]) - st["t0"]
            agg["top"].append((wall, sid, st.get("tasks", 0),
                               st.get("task_ms", 0), st.get("name", "?")))

    for name in names:
        agg = per_q.get(name)
        print(f"\n=== {name}: walls={walls[name]} ===")
        if not agg:
            print("  (no jobs recorded)")
            continue
        print(f"  jobs={agg['jobs']} stages={agg['stages']} "
              f"tasks={agg['tasks']} job_wall={agg['job_wall_ms']/1e3:.2f}s "
              f"task_time={agg['task_ms']/1e3:.2f}s")
        for wall, sid, ntask, task_ms, sname in sorted(agg["top"])[::-1][:12]:
            print(f"   stage {sid:>4} wall={wall/1e3:6.2f}s tasks={ntask:>3} "
                  f"taskt={task_ms/1e3:6.2f}s  {sname}")
    if "_" in per_q:
        a = per_q["_"]
        print(f"\n(unlabelled: jobs={a['jobs']} wall={a['job_wall_ms']/1e3:.2f}s)")


if __name__ == "__main__":
    main()
