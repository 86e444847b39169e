#!/usr/bin/env python
"""Fast iteration loop: run the oracle gate over all registered queries.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from sql_engine_spark.oracle import run_all
from sql_engine_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or None
    spark = get_spark("oracle-check")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    results = run_all(spark, sf_dir, names)
    bad = 0
    for r in results:
        status = "OK  " if r.ok else "FAIL"
        extra = f" ({r.spark_rows} rows)" if r.ok else ""
        print(f"{status} {r.name}{extra}")
        if not r.ok:
            bad += 1
            for p in r.problems:
                print(f"     {p[:500]}")
        elif r.problems:
            print(f"     note: {r.problems[0]}")
    print(f"== {len(results) - bad}/{len(results)} passed in {time.time() - t0:.1f}s at {sf_dir}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
