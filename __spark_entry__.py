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
# plane counts) are rendered against that directory.
_DRIVER_SF_DIR = "/root/testdata/sf0.01"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["tpch_q1"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query."""
    out = {}
    for name, q in all_queries().items():
        sql = resolve_oracle(q.oracle, _DRIVER_SF_DIR)
        if sql is not None:
            out[name] = sql
    return out
