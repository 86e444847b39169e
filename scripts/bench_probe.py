#!/usr/bin/env python
"""Per-query isolated bench probe for scale-stress runs (r9 verdict #1).

Runs each named query in its OWN subprocess (fresh JVM) against a given
sf dir, with a wall timeout and a free-disk guard: a query that blows
up its shuffle spill (the failure mode that killed the first monolithic
sf1 run with ENOSPC at ~79 GB of spill) is killed and recorded as
`disk_blowup` instead of taking the whole seal down; a hung query is
recorded as `timeout`. Healthy queries record wall seconds (single
pass — probe numbers are for SCALING diagnosis, not the adopted seal).

Usage:
  python scripts/bench_probe.py SF_DIR OUT.json q1 q2 ...
        [--timeout SEC] [--min-free-gb G]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark

name, sf_dir, passes = {name!r}, {sf_dir!r}, {passes}
spark = get_spark()
q = all_queries()[name]
walls = []
for _ in range(passes):
    spark.catalog.clearCache()
    t0 = time.time()
    q.build(spark, sf_dir).write.mode("overwrite").format("noop").save()
    walls.append(round(time.time() - t0, 3))
print("PROBE_OK " + " ".join(str(w) for w in walls), flush=True)
"""


def free_gb(path: str = "/") -> float:
    return shutil.disk_usage(path).free / 1e9


def probe(
    name: str, sf_dir: str, timeout: float, min_free: float, passes: int = 1
) -> dict:
    code = _CHILD.format(root=HERE, name=name, sf_dir=sf_dir, passes=passes)
    t0 = time.time()
    # Per-probe scratch dir, passed as SPARK_LOCAL_DIRS: a SIGKILLed
    # JVM never runs its shutdown hooks, so its blockmgr/spill dirs
    # survive — sweeping ONLY this dir cleans them without touching the
    # scratch of any other live Spark session on the host. Child stdout
    # goes to a temp FILE, not a PIPE: a child that prints >64KB of
    # ivy/py4j banners would otherwise block on the full pipe forever
    # and be misrecorded as `timeout`.
    scratch = tempfile.mkdtemp(prefix="bench-probe-local-")
    env = dict(os.environ, SPARK_LOCAL_DIRS=scratch)
    try:
        with tempfile.TemporaryFile(mode="w+", prefix="bench-probe-out-") as outf:
            child = subprocess.Popen(
                [sys.executable, "-c", code],
                stdout=outf,
                stderr=subprocess.DEVNULL,
                text=True,
                env=env,
            )
            status, wall = "unknown", None
            while True:
                rc = child.poll()
                if rc is not None:
                    break
                if time.time() - t0 > timeout:
                    child.kill()
                    child.wait()
                    return {
                        "status": "timeout",
                        "wall": round(time.time() - t0, 1),
                    }
                if free_gb() < min_free:
                    at_kill = round(free_gb(), 1)
                    child.kill()
                    child.wait()
                    return {
                        "status": "disk_blowup",
                        "wall": round(time.time() - t0, 1),
                        "free_gb_at_kill": at_kill,
                    }
                time.sleep(2.0)
            outf.seek(0)
            out = outf.read()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    walls: list[float] = []
    for line in out.splitlines():
        if line.startswith("PROBE_OK "):
            status = "ok"
            walls = [float(w) for w in line.split()[1:]]
            wall = min(walls)
    if status != "ok":
        status = f"exit_{child.returncode}"
    r = {"status": status, "wall": wall}
    if len(walls) > 1:
        r["walls"] = walls
    return r


def main() -> int:
    args = [a for a in sys.argv[1:]]
    timeout, min_free, passes = 420.0, 15.0, 1
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i : i + 2]
    if "--min-free-gb" in args:
        i = args.index("--min-free-gb")
        min_free = float(args[i + 1])
        del args[i : i + 2]
    if "--passes" in args:
        i = args.index("--passes")
        passes = int(args[i + 1])
        del args[i : i + 2]
    sf_dir, out_path, names = args[0], args[1], args[2:]
    results: dict[str, dict] = {}
    for name in names:
        print(f"== {name} ...", flush=True)
        r = probe(name, sf_dir, timeout, min_free, passes)
        results[name] = r
        print(f"   {r}", flush=True)
        with open(out_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "results": results}, f, indent=1)
    bad = {k: v for k, v in results.items() if v["status"] != "ok"}
    print(f"== {len(results) - len(bad)}/{len(results)} ok; bad: {list(bad)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
