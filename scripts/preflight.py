#!/usr/bin/env python
"""No-Spark preflight gate (r10 verdict #1): the sync checks that must
pass before any seal/bench artifact is produced from the working tree.
Each takes seconds and needs no JVM, so there is no excuse to skip them
— round 10 shipped a red test suite because REGISTRY.md went stale
AFTER its last regeneration and nothing between that commit and the
seal re-ran the check.

1. registry-sync : committed REGISTRY.md == a fresh regeneration
2. plans-sync    : committed PLANS.md covers exactly the bench sections
3. compileall    : package + scripts byte-compile with
                   DeprecationWarning promoted to error

`bench.py --seal` runs this automatically and refuses to seal a stale
tree; it is also the cheap pre-commit gate (`python scripts/preflight.py`).
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def checks() -> list[tuple[str, list[str]]]:
    py = sys.executable
    return [
        (
            "registry-sync",
            [py, os.path.join(HERE, "scripts", "gen_registry.py"), "--check"],
        ),
        (
            "plans-sync",
            [py, os.path.join(HERE, "scripts", "dump_plans.py"), "--check"],
        ),
        (
            "compileall",
            [
                py,
                "-W",
                "error::DeprecationWarning",
                "-m",
                "compileall",
                "-q",
                "-f",
                os.path.join(HERE, "sql_engine_spark"),
                os.path.join(HERE, "scripts"),
                os.path.join(HERE, "bench.py"),
                os.path.join(HERE, "__spark_entry__.py"),
            ],
        ),
    ]


def main() -> int:
    bad = []
    # gatelog-hook: the per-commit gate must be the .git/hooks copy of
    # scripts/hooks/post-commit (r11 verdict #4 — entries written by the
    # gate itself, never back-filled). Cheap local check, no subprocess.
    sys.path.insert(0, os.path.join(HERE, "scripts"))
    from gate_commit import hook_installed

    ok = hook_installed()
    print(f"{'OK  ' if ok else 'FAIL'} gatelog-hook", flush=True)
    if not ok:
        bad.append("gatelog-hook")
        print(
            "post-commit hook missing/stale: run "
            "`python scripts/gate_commit.py --install-hook`",
            flush=True,
        )
    for name, cmd in checks():
        p = subprocess.run(cmd, capture_output=True, text=True)
        ok = p.returncode == 0
        print(f"{'OK  ' if ok else 'FAIL'} {name}", flush=True)
        if not ok:
            bad.append(name)
            tail = (p.stdout + p.stderr)[-2000:]
            print(tail, flush=True)
    if bad:
        print(f"preflight FAILED: {bad}", flush=True)
        return 1
    print("preflight clean", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
