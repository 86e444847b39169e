#!/usr/bin/env python
"""Select the r12 sf1 correctness-seal query set (r11 verdict #1).

The r11 sf1 seal covered 47 queries and caught a real scale bug in the
single most-exercised query (tpch_q1's dsum double->decimal .5-boundary
seam), so the untested ~500 are the biggest remaining risk. This script
picks a >=150-query set that covers every operator family, prioritized
by the shapes that plausibly hide the same seam class:

1. VULNERABLE SHAPE: queries whose ORACLE text reduces a computed
   double expression through DECIMAL(27,6) (dsum/davg over a product,
   quotient, power or other arithmetic — not a bare column). A bare
   column's decimal cast is boundary-stable at our data magnitudes; a
   product's is exactly where tpch_q1 broke at 6M rows.
2. MEASURED COST: every family's top-3 most expensive members by
   (spark_sec + oracle_sec) from the per-query-timed sf0.1 gate
   artifact — expensive usually means most data touched, i.e. most
   rows through any seam.
3. CONTINUITY: the full r11 47-query stress set (regression anchor).

Usage:
  python scripts/plan_sf1_seal.py ORACLE_LOCAL_r12_sf0.1.json [--out FILE]

Prints the selected names (one per line) to --out (default
/tmp/sf1_seal_set.txt) plus a per-family summary to stdout.
"""

from __future__ import annotations

import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Inside SUM(CAST((expr) AS DECIMAL(27,6))): flag when expr contains
# arithmetic beyond a bare identifier/cast. Conservative: a false
# positive only adds a query to the seal.
_DEC_SUM = re.compile(
    r"SUM\s*\(\s*CAST\s*\(\s*(.*?)\s+AS\s+DECIMAL\(27,\s*6\)\s*\)",
    re.IGNORECASE | re.DOTALL,
)
_ARITH = re.compile(r"[*/+]|pow\s*\(|exp\s*\(|ln\s*\(|log\s*\(", re.IGNORECASE)


def vulnerable(oracle: str | None) -> bool:
    if not oracle:
        return False
    for m in _DEC_SUM.finditer(oracle):
        inner = m.group(1)
        # strip a leading CAST(x AS DOUBLE) wrapper before testing
        if _ARITH.search(inner):
            return True
    return False


R11_SET_FILE = os.path.join(HERE, "ORACLE_LOCAL_r11_sf1.json")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = "/tmp/sf1_seal_set.txt"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    timing_path = args[0]
    with open(timing_path) as fh:
        timing = json.load(fh)["queries"]

    from sql_engine_spark.registry import all_queries

    qs = all_queries()
    picked: dict[str, str] = {}

    with open(R11_SET_FILE) as fh:
        r11 = json.load(fh)
    for n in r11["queries"]:
        picked.setdefault(n, "r11-stress-set")

    for n, q in qs.items():
        oracle = q.oracle if isinstance(q.oracle, str) else None
        if vulnerable(oracle):
            picked.setdefault(n, "dsum-product-shape")

    fams: dict[str, list[tuple[float, str]]] = {}
    for n in qs:
        t = timing.get(n, {})
        cost = float(t.get("spark_sec", 0)) + float(t.get("oracle_sec", 0))
        fams.setdefault(n.split("_", 1)[0], []).append((cost, n))
    for fam, members in fams.items():
        for _cost, n in sorted(members, reverse=True)[:3]:
            picked.setdefault(n, f"family-top3:{fam}")

    # Streaming twins were sf1-stressed in r11 (32/32, exact recovery);
    # their oracle gate at sf1 re-runs the replay per twin, so cap the
    # family to its top-3 (already included above) rather than all 32.
    by_reason: dict[str, int] = {}
    for r in picked.values():
        key = r.split(":")[0]
        by_reason[key] = by_reason.get(key, 0) + 1
    fam_cov: dict[str, int] = {}
    for n in picked:
        fam_cov[n.split("_", 1)[0]] = fam_cov.get(n.split("_", 1)[0], 0) + 1

    names = sorted(picked)
    with open(out_path, "w") as fh:
        fh.write("\n".join(names) + "\n")
    print(f"selected {len(names)} queries -> {out_path}")
    print("by reason:", json.dumps(by_reason, sort_keys=True))
    print("families covered:", len(fam_cov), "/", len(fams))
    missing = sorted(set(fams) - set(fam_cov))
    if missing:
        print("FAMILIES MISSING:", missing)
    for n in names:
        print(" ", n, "<-", picked[n])
    return 0


if __name__ == "__main__":
    sys.exit(main())
