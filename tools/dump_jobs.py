"""Dump every job of the last profile_query.py event log: submission order,
duration, #stages, first-stage callsite — to find out where a query's job
count comes from."""

from __future__ import annotations

import io
import json
import sys
from collections import Counter
from pathlib import Path

EVDIR = Path("/tmp/spark_graft_eventlog")


def load() -> io.StringIO:
    logs = sorted(EVDIR.iterdir(), key=lambda p: p.stat().st_mtime)
    p = logs[-1]
    if p.is_dir():
        parts = sorted((int(f.name.split("_")[1]), f) for f in p.iterdir()
                       if f.name.startswith("events_"))
        return io.StringIO("".join(f.read_text() for _, f in parts))
    return io.StringIO(p.read_text())


def main() -> None:
    want = sys.argv[1] if len(sys.argv) > 1 else None
    jobs, stage_names = {}, {}
    for line in load():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        k = ev.get("Event")
        if k == "SparkListenerJobStart":
            desc = (ev.get("Properties") or {}).get("spark.job.description",
                                                    "")
            cs = (ev.get("Properties") or {}).get("callSite.short", "")
            jobs[ev["Job ID"]] = {
                "desc": desc, "cs": cs, "t0": ev["Submission Time"],
                "stages": [(s["Stage ID"], s["Stage Name"].split("\n")[0],
                            s["Number of Tasks"],
                            s.get("Details", "").split("\n")[0])
                           for s in ev["Stage Infos"]]}
        elif k == "SparkListenerJobEnd" and ev["Job ID"] in jobs:
            jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]

    t_base = min(j["t0"] for j in jobs.values())
    cnt = Counter()
    for jid, j in sorted(jobs.items()):
        q = j["desc"].split("::")[1] if j["desc"].startswith("Q::") else "_"
        if want and q != want:
            continue
        dur = (j.get("t1", j["t0"]) - j["t0"]) / 1e3
        cnt[j["cs"]] += 1
        sts = "; ".join(f"{sid}:{n}x{nt}" for sid, n, nt, _ in j["stages"])
        print(f"job {jid:>4} +{(j['t0']-t_base)/1e3:8.2f}s dur={dur:6.2f}s "
              f"cs={j['cs'][:60]:<60} stages=[{sts[:110]}]")
    print("\n-- callsite counts --")
    for cs, n in cnt.most_common(20):
        print(f"{n:>5}  {cs}")


if __name__ == "__main__":
    main()
