"""Summarize a Spark event log: per-stage wall, task-time skew, shuffle I/O.

Prints one line per completed stage (submission-ordered):
  stage id | wall s | tasks | max/med task s | shuffle read/write MB | name

Usage: python scripts/analyze_eventlog.py /tmp/spark-events [min_wall_s]
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict


def main() -> None:
    d = sys.argv[1]
    min_wall = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    files = []
    for root, _dirs, names in os.walk(d):
        files.extend(
            os.path.join(root, n)
            for n in names
            if not n.startswith(".") and "appstatus" not in n
        )
    stages = {}
    task_times = defaultdict(list)
    sread = defaultdict(int)
    swrite = defaultdict(int)
    spill = defaultdict(int)
    gc = defaultdict(int)
    run = defaultdict(int)
    for path in files:
        if path.endswith(".zstd"):
            import io

            import pyarrow as pa

            f = io.TextIOWrapper(
                io.BufferedReader(pa.input_stream(path, compression="zstd"))
            )
        else:
            f = open(path)
        with f:
            # an in-progress app's .zstd log ends mid-frame — iterate
            # manually and treat the truncation as end-of-log
            it = iter(f)
            while True:
                try:
                    line = next(it)
                except StopIteration:
                    break
                except OSError:  # "Truncated compressed stream"
                    break
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages[si["Stage ID"]] = si
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    ti = ev.get("Task Info", {})
                    dur = (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3
                    task_times[sid].append(dur)
                    tm = ev.get("Task Metrics") or {}
                    srm = tm.get("Shuffle Read Metrics") or {}
                    sread[sid] += srm.get("Remote Bytes Read", 0) + srm.get(
                        "Local Bytes Read", 0
                    )
                    swm = tm.get("Shuffle Write Metrics") or {}
                    swrite[sid] += swm.get("Shuffle Bytes Written", 0)
                    spill[sid] += tm.get("Disk Bytes Spilled", 0)
                    gc[sid] += tm.get("JVM GC Time", 0)
                    run[sid] += tm.get("Executor Run Time", 0)
    rows = []
    for sid, si in stages.items():
        sub = si.get("Submission Time")
        comp = si.get("Completion Time")
        if not sub or not comp:
            continue
        wall = (comp - sub) / 1e3
        tt = sorted(task_times.get(sid, [0]))
        rows.append(
            (
                sub,
                sid,
                wall,
                len(tt),
                tt[-1],
                tt[len(tt) // 2],
                sread[sid] / 2**20,
                swrite[sid] / 2**20,
                spill[sid] / 2**20,
                (si.get("Stage Name") or "")[:60],
            )
        )
    rows.sort()
    print(
        "stage  wall_s  tasks  max_t  med_t  shRd_MB  shWr_MB  spill_MB  name"
    )
    for sub, sid, wall, n, mx, md, rd, wr, sp, name in rows:
        if wall < min_wall:
            continue
        print(
            f"{sid:>5}  {wall:6.1f}  {n:5}  {mx:5.1f}  {md:5.1f}  "
            f"{rd:7.0f}  {wr:7.0f}  {sp:8.0f}  {name}"
        )
    tot_run_s = sum(run.values()) / 1e3
    tot_gc_s = sum(gc.values()) / 1e3
    print(
        f"TOTAL  stages={len(rows)}  spill_MB={sum(spill.values()) / 2**20:.0f}"
        f"  shRd_MB={sum(sread.values()) / 2**20:.0f}"
        f"  shWr_MB={sum(swrite.values()) / 2**20:.0f}"
        f"  exec_run_s={tot_run_s:.0f}  gc_s={tot_gc_s:.0f}"
        f"  gc_frac={tot_gc_s / tot_run_s if tot_run_s else 0:.3f}"
    )


if __name__ == "__main__":
    main()
