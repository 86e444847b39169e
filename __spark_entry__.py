"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship TPC-H-Q1-style aggregation at sf0.001;
`queries()` / `oracle_sql()` expose every operator registered in
sql_engine_spark.registry (one entry per SURVEY.md §2 item + extensions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sql_engine_spark.registry import all_queries, resolve_oracle  # noqa: E402

# The driver's correctness gate runs at sf0.01 (TESTDATA.md); callable
# oracles (SQL parameterized by a data-derived size, e.g. derived LSH
# plane counts or the kmeans training-sample threshold) are rendered
# against the gate's directory — overridable via SPARK_GRAFT_SF_DIR so
# a gate run at another scale factor renders the matching SQL.
_DRIVER_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["tpch_q1"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query.

    Callable oracles read the dataset (a DuckDB parquet COUNT) at
    render time; guard each individually so a missing/odd dataset
    degrades only the derived entries to rows-only checks instead of
    raising for the whole oracle map. The degradation is LOUD (names
    on stderr) and the except is narrowed to dataset-shaped failures —
    a genuine bug in a render callable still raises (r7 advice: a bare
    swallow silently demoted exact-compare to rows-only)."""
    import duckdb

    out = {}
    skipped = []
    for name, q in all_queries().items():
        try:
            sql = resolve_oracle(q.oracle, _DRIVER_SF_DIR)
        except (OSError, duckdb.Error) as exc:
            skipped.append(f"{name} ({type(exc).__name__})")
            continue
        if sql is not None:
            out[name] = sql
    if skipped:
        print(
            "oracle_sql: degraded to rows-only (dataset unreadable at "
            f"{_DRIVER_SF_DIR}): {', '.join(sorted(skipped))}",
            file=sys.stderr,
        )
    return out
