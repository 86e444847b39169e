"""REGISTRY.md regeneration pin: the committed index must match a fresh
generation from the live registry (same contract as PLANS.md) — name
set, module:line anchors, oracle kinds, and bench-section assignments
all current."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_md_in_sync():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_registry.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr


def test_registry_md_counts_match_registry():
    from sql_engine_spark.registry import all_queries

    qs = all_queries()
    with open(os.path.join(REPO, "REGISTRY.md")) as fh:
        content = fh.read()
    assert f"Total queries: **{len(qs)}**" in content
    # every registered name appears exactly once as a table row
    for name in qs:
        assert f"| `{name}` |" in content
