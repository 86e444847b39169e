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


def ssum(col: Column, *, scale: float = 1_000_000.0) -> Column:
    """Deterministic SUM for WIDE-RANGE per-row doubles (x^3, x^4 moment
    terms): round to 6 decimals IN IEEE DOUBLE arithmetic (round(x*1e6),
    ties away from zero in both engines), sum the resulting integers
    exactly in DECIMAL(38,0), scale back once. `dsum`'s CAST(double AS
    DECIMAL) delegates the rounding to each engine's decimal converter —
    Spark rounds the double's shortest decimal representation, DuckDB
    the exact binary expansion, and for high-power terms the two sit on
    opposite sides of the .5 boundary often enough to move the sum
    (observed on SUM(value^4) at sf0.01). Doing the rounding in shared
    double arithmetic removes the seam; the reduction stays map-side
    combinable JVM codegen."""
    return F.sum(
        F.round(col * F.lit(scale)).cast("decimal(38,0)")
    ).cast("double") / F.lit(scale)


def sql_ssum(expr: str, *, scale: str = "1000000.0") -> str:
    """DuckDB spelling of `ssum`."""
    return (
        f"(CAST(SUM(CAST(round(({expr}) * {scale}) AS DECIMAL(38,0))) "
        f"AS DOUBLE) / {scale})"
    )
