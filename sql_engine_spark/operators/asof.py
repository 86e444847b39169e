"""As-of and range joins (absent in both the reference and core Spark).

`asof_join` uses the union+ordered-window technique rather than a
range-predicate join: tag both sides, union, sort each key partition by
(ts, side, right-id), and carry the last right-side row forward with
`last(..., ignorenulls=True)`. Cost is ONE shuffle on the key and a sort —
O(n log n) — versus the O(n*m)-per-key fallback Spark would plan for a
`l.ts >= r.ts` join condition. This is the shape that survives 100 TB.

`range_join_buckets` joins a fact column into a small interval table; the
interval side is broadcast so the plan is a map-side BNL against a
handful of rows, not a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts
    (per key). Right-side ties on ts break to the greatest payload tuple.

    Returns all left columns plus `asof_<payload>` columns (NULL when no
    earlier right row exists or it falls outside `tolerance_seconds`).
    """
    lcols = left.columns
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_payload]).alias(
            "__payload"
        ),
    ).withColumn("__side", F.lit(0))

    l2 = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1).alias("__side"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    r2 = r.select(
        F.col(key),
        "__ts",
        "__payload",
        "__side",
        *[F.lit(None).cast(l2.schema[f"__l_{c}"].dataType).alias(f"__l_{c}") for c in lcols],
    )
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1) so an
    # exactly-simultaneous right row matches; ties among right rows break
    # by the payload struct (ts first), making the result deterministic.
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side", "__payload")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l2.unionByName(r2)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        # MICROSECOND diff: exact duration comparison. SECOND-granularity
        # diffs truncate and DuckDB's date_diff counts boundary crossings
        # instead — the two disagree on sub-second offsets.
        in_tol = F.expr(
            f"timestampdiff(MICROSECOND, __match.__rts, __ts)"
            f" <= {tolerance_seconds}L * 1000000L"
        )
        matched = matched.withColumn(
            "__match", F.when(in_tol, F.col("__match")).otherwise(F.lit(None))
        )
    out = matched.select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.col("__match.__rts").alias("asof_ts"),
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in right_payload],
    )
    return out


def range_join_buckets(
    fact: DataFrame,
    buckets: DataFrame,
    *,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join fact rows to [lo, hi) intervals; bucket side is broadcast."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(buckets), cond, "left")
