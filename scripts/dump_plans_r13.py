#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r13/.

The round-12 optimization evidence: for each query touched this round,
a `<query>_before.txt` captured at the pre-change commit and a
`<query>_after.txt` at the post-change commit.

Usage: python scripts/dump_plans_r13.py before q1 q2 ... [--sf DIR]
       python scripts/dump_plans_r13.py after  q1 q2 ... [--sf DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql_engine_spark.plans.audit import explain_str
from sql_engine_spark.registry import all_queries
from sql_engine_spark.session import get_spark


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    suffix, names = argv[0], argv[1:]
    assert suffix in ("before", "after"), suffix
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans-r13")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name].build(spark, sf_dir)
        txt = explain_str(df, "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            fh.write(txt + "\n")
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
