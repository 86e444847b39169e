#!/usr/bin/env python
"""Per-query scale-up exponent table for the sf1 stress seal
(r9 verdict "Next round" #1: the 100-TB design claims were argued from
plan shape; this measures them).

Given two bench artifacts produced by bench.py (any mix of the standard
sections and the SPARK_GRAFT_BENCH_QUERIES custom path) and their scale
factors, prints a markdown table of per-query wall times and the
empirical scaling exponent  alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)
— alpha ~1.0 is linear, <1 sub-linear (fixed costs amortizing), >1
super-linear. Queries with t_lo under FLOOR seconds get no exponent
(JVM/session fixed costs dominate and the ratio is noise).

Usage: python scripts/sf_scaling.py LO.json SF_LO HI.json SF_HI [FLOOR]
"""

from __future__ import annotations

import json
import math
import sys


def _all_queries(artifact: dict) -> dict[str, float]:
    out: dict[str, float] = {}
    for v in artifact.values():
        if isinstance(v, dict):
            out.update({k: t for k, t in v.items() if isinstance(t, (int, float))})
    return out


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    lo = _all_queries(json.load(open(sys.argv[1])))
    sf_lo = float(sys.argv[2])
    hi = _all_queries(json.load(open(sys.argv[3])))
    sf_hi = float(sys.argv[4])
    floor = float(sys.argv[5]) if len(sys.argv) > 5 else 0.4
    ratio = sf_hi / sf_lo

    rows = []
    for name, t_hi in hi.items():
        t_lo = lo.get(name)
        if t_lo is None:
            continue
        if t_lo >= floor:
            alpha = math.log(t_hi / t_lo) / math.log(ratio)
            rows.append((alpha, name, t_lo, t_hi))
        else:
            rows.append((None, name, t_lo, t_hi))

    rows.sort(key=lambda r: (r[0] is None, -(r[0] or 0)))
    print(f"| query | sf{sf_lo} | sf{sf_hi} | ratio | alpha |")
    print("|---|---|---|---|---|")
    for alpha, name, t_lo, t_hi in rows:
        a = f"{alpha:.2f}" if alpha is not None else "(fixed-cost)"
        print(f"| {name} | {t_lo:.2f}s | {t_hi:.2f}s | {t_hi / t_lo:.1f}x | {a} |")
    meas = [r[0] for r in rows if r[0] is not None]
    if meas:
        meas.sort()
        print(
            f"\nmeasured {len(meas)} queries: median alpha "
            f"{meas[len(meas) // 2]:.2f}, max {meas[-1]:.2f}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
