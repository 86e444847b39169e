#!/usr/bin/env python
"""Per-stage profile of one registered query (guide §1: measure first).

Runs the named query to the noop sink in THIS process with the Spark
event log enabled, then parses the log and prints per-stage task-time
totals (executor run time, shuffle read/write bytes, input bytes) plus
job wall times — the local[N] stand-in for the Spark UI stage page
(spark.ui is disabled in the session factory).

Usage: python scripts/profile_query.py <query> [sf_dir] [--repeat N]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])

    log_dir = tempfile.mkdtemp(prefix="eventlog_")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    walls = []
    for i in range(repeat):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"{name} pass {i}")
        t0 = time.time()
        qs[name].build(spark, sf_dir).write.mode("overwrite").format("noop").save()
        walls.append(round(time.time() - t0, 3))
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush the event log

    # Spark 4 rolling event logs: eventlog_v2_<appid>/events_*_<appid>;
    # older layout is a single file named <appid>.
    path = os.path.join(log_dir, app_id)
    if not os.path.isfile(path):
        v2 = os.path.join(log_dir, f"eventlog_v2_{app_id}")
        paths = [
            os.path.join(v2, f)
            for f in sorted(os.listdir(v2))
            if f.startswith("events_")
        ]
    else:
        paths = [path]
    stages: dict[tuple, dict] = {}
    jobs: dict[int, dict] = {}
    import itertools

    with open(paths[0]) as first:
        lines_iter = list(first)
    for p in paths[1:]:
        with open(p) as fh:
            lines_iter.extend(fh)
    for line in lines_iter:
        if True:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = (si["Stage ID"], si.get("Stage Attempt ID", si.get("Attempt ID", 0)))
                sub = si.get("Submission Time")
                com = si.get("Completion Time")
                stages[key] = {
                    "name": si["Stage Name"].split("\n")[0][:80],
                    "tasks": si["Number of Tasks"],
                    "wall_ms": (com - sub) if sub and com else None,
                    "run_ms": 0,
                    "cpu_ms": 0,
                    "gc_ms": 0,
                    "in_mb": 0.0,
                    "sr_mb": 0.0,
                    "sw_mb": 0.0,
                    "spill_mb": 0.0,
                    "rows_out": 0,
                    "fetch_ms": 0,
                    "pyser_ms": 0,
                }
            elif e == "SparkListenerTaskEnd":
                key = (ev["Stage ID"], ev["Stage Attempt ID"])
                m = ev.get("Task Metrics") or {}
                st = stages.get(key)
                if st is None:
                    st = stages[key] = {
                        "name": "?", "tasks": 0, "wall_ms": None, "run_ms": 0,
                        "cpu_ms": 0, "gc_ms": 0, "in_mb": 0.0, "sr_mb": 0.0,
                        "sw_mb": 0.0, "spill_mb": 0.0, "rows_out": 0,
                        "fetch_ms": 0, "pyser_ms": 0,
                    }
                st["run_ms"] += m.get("Executor Run Time", 0)
                st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                st["gc_ms"] += m.get("JVM GC Time", 0)
                st["in_mb"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                ) / 1e6
                sr = m.get("Shuffle Read Metrics") or {}
                st["sr_mb"] += (
                    sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0)
                ) / 1e6
                st["fetch_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                st["sw_mb"] += sw.get("Shuffle Bytes Written", 0) / 1e6
                st["spill_mb"] += m.get("Disk Bytes Spilled", 0) / 1e6
                st["rows_out"] += (m.get("Output Metrics") or {}).get(
                    "Records Written", 0
                )
            elif e == "SparkListenerJobStart":
                jobs[ev["Job ID"]] = {
                    "t0": ev["Submission Time"],
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                }
            elif e == "SparkListenerJobEnd":
                j = jobs.get(ev["Job ID"])
                if j:
                    j["wall_ms"] = ev["Completion Time"] - j["t0"]

    print(f"query={name} sf_dir={sf_dir} walls={walls}")
    print(f"\n== jobs ({len(jobs)}) ==")
    for jid, j in sorted(jobs.items()):
        print(f"job {jid:3d}  {j.get('wall_ms', '?'):>8} ms  {j['desc'][:70]}")
    print(f"\n== stages by executor run time (top 25 of {len(stages)}) ==")
    print(
        f"{'stage':>7} {'tasks':>5} {'wall_ms':>8} {'run_ms':>8} {'cpu_ms':>8} "
        f"{'gc':>5} {'in_mb':>8} {'sr_mb':>7} {'sw_mb':>7} {'spill':>6}  name"
    )
    for key, st in sorted(stages.items(), key=lambda kv: -kv[1]["run_ms"])[:25]:
        print(
            f"{key[0]:>7} {st['tasks']:>5} {str(st['wall_ms']):>8} "
            f"{st['run_ms']:>8} {st['cpu_ms']:>8} {st['gc_ms']:>5} "
            f"{st['in_mb']:>8.1f} {st['sr_mb']:>7.1f} {st['sw_mb']:>7.1f} "
            f"{st['spill_mb']:>6.1f}  {st['name']}"
        )
    shutil.rmtree(log_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
