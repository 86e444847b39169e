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


def hook_src_path() -> str:
    return os.path.join(HERE, "scripts", "hooks", "post-commit")


def hook_dst_path() -> str:
    return os.path.join(HERE, ".git", "hooks", "post-commit")


def install_hook() -> None:
    """Copy scripts/hooks/post-commit into .git/hooks (executable).
    The hook runs this script with --hook after EVERY commit, so
    GATELOG.jsonl entries are written by the gate itself at commit
    time — never reconstructed by hand (r11 verdict #4)."""
    import shutil
    import stat

    shutil.copyfile(hook_src_path(), hook_dst_path())
    os.chmod(
        hook_dst_path(),
        os.stat(hook_dst_path()).st_mode
        | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH,
    )
    print(f"installed {hook_dst_path()}")


def hook_installed() -> bool:
    try:
        with open(hook_src_path()) as a, open(hook_dst_path()) as b:
            return a.read() == b.read() and os.access(hook_dst_path(), os.X_OK)
    except OSError:
        return False


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    also: list[str] = []
    via_hook = False
    if "--install-hook" in args:
        install_hook()
        return 0
    if "--hook" in args:
        via_hook = True
        args.remove("--hook")
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
    if via_hook:
        entry["via"] = "post-commit-hook"
        entry["at"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    if via_hook and os.environ.get("SQE_SKIP_GATE"):
        entry["passed"] = entry["total"] = 0
        entry["ok"] = True
        entry["note"] = "gate explicitly skipped (SQE_SKIP_GATE set)"
        gate = []
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
    elif "note" not in entry:
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
