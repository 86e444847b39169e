"""Order-independent floating aggregation.

Summing doubles is not associative: Spark's partial/final aggregation adds
in partition order (nondeterministic), a single-threaded engine adds in scan
order, so the last ulp can differ run-to-run and engine-to-engine. For
oracle-exact (and rerun-stable!) results we aggregate through
DECIMAL(27,6) — exact arithmetic in both Spark and DuckDB — and cast the
final value back to double. Per-row double arithmetic (products etc.) stays
IEEE-deterministic and bit-identical across engines; only the *reduction*
needs the decimal detour.

This also matters at 100 TB: decimal partial aggregation is still
map-side-combinable JVM codegen — no Python, no extra shuffle.

(The reference has the same class of issue in miniature: its `avg` is
f32-cast sum / f32 count, /root/reference/src/executor/aggregation.rs:414-426.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def dsum(col: Column | str) -> Column:
    """Deterministic SUM over a double column (exact decimal reduction)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB spelling of `dsum` for oracle queries."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr}))"
