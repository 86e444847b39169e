#!/usr/bin/env python
"""Per-commit oracle-gate log (r10 verdict #8): gate ONE commit's
changed queries and append the evidence to GATELOG.jsonl, so a round's
history shows every commit was gated, not just the round-end seal.

Usage:
  python scripts/gate_commit.py [COMMIT] [--sf-dir DIR] [--also q1 q2 ...]

- COMMIT defaults to HEAD. Changed queries = registered queries whose
  defining module changed in `git diff COMMIT^ COMMIT`.
- Edits under operators/ / functions/ / streaming/ are not traced
  through imports; the entry records those files under `engine_files`
  and the caller names the affected consumers via --also (the same
  honesty contract as check_oracle --changed's docstring).
- The gate runs check_oracle.py in a subprocess at --sf-dir (default
  sf0.001) and the JSONL entry records sha, subject, query list,
  pass/total and wall. Doc-only commits append a zero-query entry —
  the log's completeness is the point.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], capture_output=True, text=True, check=True, cwd=HERE
    ).stdout.strip()


def changed_queries_for_commit(commit: str) -> tuple[list[str], list[str]]:
    """(registered queries whose module changed in the commit,
    changed package .py files NOT mapped to any query module)."""
    from sql_engine_spark.registry import all_queries

    files = _git("diff", "--name-only", f"{commit}^", commit).splitlines()
    changed = {
        os.path.normpath(os.path.join(HERE, p))
        for p in files
        if p.endswith(".py")
    }
    names, mapped = [], set()
    for name, q in all_queries().items():
        mod = sys.modules.get(q.build.__module__)
        src = getattr(mod, "__file__", None)
        if src is None:
            continue
        src = os.path.normpath(os.path.abspath(src))
        if src in changed:
            names.append(name)
            mapped.add(src)
    engine = sorted(
        os.path.relpath(p, HERE)
        for p in changed - mapped
        if os.sep + "sql_engine_spark" + os.sep in p
    )
    return sorted(names), engine


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    also: list[str] = []
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--also" in args:
        i = args.index("--also")
        also = args[i + 1 :]
        del args[i:]
    commit = args[0] if args else "HEAD"
    sha = _git("rev-parse", "--short", commit)
    subject = _git("log", "-1", "--format=%s", commit)
    names, engine = changed_queries_for_commit(commit)
    gate = sorted(set(names) | set(also))
    entry = {
        "commit": sha,
        "subject": subject,
        "sf_dir": sf_dir,
        "changed_queries": names,
        "engine_files": engine,
        "also_gated": sorted(set(also) - set(names)),
    }
    if gate:
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
            out_json = tf.name
        t0 = time.time()
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "scripts", "check_oracle.py"),
                "--json",
                out_json,
                sf_dir,
                *gate,
            ],
            capture_output=True,
            text=True,
        )
        entry["elapsed_sec"] = round(time.time() - t0, 1)
        try:
            with open(out_json) as fh:
                res = json.load(fh)
            entry["passed"] = res["passed"]
            entry["total"] = res["total"]
            entry["ok"] = res["passed"] == res["total"]
            bad = {
                n: r["problems"]
                for n, r in res["queries"].items()
                if not r["ok"]
            }
            if bad:
                entry["failures"] = bad
        except (OSError, ValueError, KeyError):
            entry["ok"] = False
            entry["error"] = proc.stdout[-500:] + proc.stderr[-500:]
        finally:
            try:
                os.unlink(out_json)
            except OSError:
                pass
    else:
        entry["passed"] = entry["total"] = 0
        entry["ok"] = True
        entry["note"] = "no query modules changed (doc/tooling-only commit)"
    log = os.path.join(HERE, "GATELOG.jsonl")
    with open(log, "a") as fh:
        fh.write(json.dumps(entry, sort_keys=True) + "\n")
    print(json.dumps(entry, sort_keys=True))
    return 0 if entry["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
