"""Distributed prefix sums: the two-level (bucketed) running total.

A running sum ordered within a partition key is the natural spelling of
token-budget cuts and sequence packing, but the naive
`Window.partitionBy(key).orderBy(ord)` sorts EVERY row of a key through
ONE task — with a handful of sources over 100 TB each source's entire
document set funnels through a single executor thread. The classic fix
is the two-level scan (vector prefix-sum):

1. bucket rows by an ORDER-CONSISTENT coarsening of the order column
   (a range bucket: bucket(a) < bucket(b) implies a < b in the order);
2. run the running sum WITHIN (key, bucket) — parallel width becomes
   keys x buckets instead of keys;
3. aggregate one total per (key, bucket) — a tiny relation the same
   (key, bucket) exchange already clusters, so no extra corpus shuffle;
4. prefix-sum those totals per key (tiny: buckets rows per key) and
   broadcast-join each bucket's cumulative offset back, adding
   offset + within-bucket running sum.

Integer/decimal addition is associative, so the result is IDENTICAL to
the single-window spelling for any bucket count — the same SQL oracle
stays green while the plan's widest window is (key, bucket)-partitioned.

The reference engine has no window functions at all (SURVEY.md §2.5);
this is the scale spelling of an operation it could not express.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def derived_rank_buckets(
    n_rows: int, *, target_rows: int = 1_000_000, floor: int = 32
) -> int:
    """Bucket count for a two-level rank sized to the DATA: each bucket's
    within-bucket window sorts ~target_rows through one task, so the
    count must grow with the corpus (a fixed 32 puts corpus/32 through
    one task at 100x — the funnel the two-level scan exists to avoid).
    Floored at 32 so small corpora keep the multi-bucket plan shape the
    tests pin."""
    import math

    return max(floor, math.ceil(max(n_rows, 1) / target_rows))


def hex_prefix_bucket(order_col: Column | str, n_buckets: int) -> Column:
    """Range bucket for a lowercase-hex order column (e.g. an md5 hash):
    monotone non-decreasing in the column's lexicographic order, uniform
    for hash-distributed values. Uses the first two hex chars (256 cells
    folded into `n_buckets` contiguous ranges)."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    val = F.conv(F.substring(c, 1, 2), 16, 10).cast("int")
    return ((val * n_buckets) / 256).cast("int")


def range_bucket(order_col: Column | str, lo: Column, hi: Column, n_buckets: int) -> Column:
    """Range bucket for a numeric order column with known per-key bounds:
    floor((x - lo) * n / (hi - lo + 1)) — monotone non-decreasing in x
    (all that correctness needs; double rounding can only blur bucket
    BOUNDARIES, never reorder them), ~uniform for dense ids."""
    c = F.col(order_col) if isinstance(order_col, str) else order_col
    span = (hi - lo + F.lit(1)).cast("double")
    return F.floor(((c - lo) * F.lit(n_buckets)) / span).cast("int")


def bucketed_value_rank(
    df: DataFrame,
    *,
    part_cols: list[str],
    value_col: str,
    tie_col: str,
    n_rows: int,
    out_col: str = "__rank",
    weight_col: str | None = None,
) -> DataFrame:
    """Rank every row by `value_col` (ties broken by `tie_col`) within
    `part_cols` — or the cumulative `weight_col` at each row, when given
    — WITHOUT a per-key global window: the two-level bucketed scan over
    a range bucket of the value (bounds from one global aggregate,
    bucket count derived from `n_rows`). The caller should persist `df`
    when it feeds multiple passes (bounds + ranked base).

    This is the engine behind exact percentiles, trimmed means, and
    weighted medians: all of them need only values AT RANKS, never a
    per-group materialized list."""
    bounds = df.agg(
        F.min(value_col).alias("__vr_lo"), F.max(value_col).alias("__vr_hi")
    )
    wcol = weight_col
    base = df.crossJoin(F.broadcast(bounds)).withColumn(
        "__vr_ord", F.struct(F.col(value_col), F.col(tie_col))
    )
    if wcol is None:
        base = base.withColumn("__vr_w", F.lit(1).cast("long"))
        wcol = "__vr_w"
    nb = derived_rank_buckets(n_rows)
    ranked = bucketed_running_sum(
        base,
        part_cols=part_cols,
        order_col="__vr_ord",
        value_col=wcol,
        bucket=range_bucket(
            F.col(value_col), F.col("__vr_lo"), F.col("__vr_hi"), nb
        ),
        out_col=out_col,
    )
    return ranked.drop("__vr_lo", "__vr_hi", "__vr_ord", "__vr_w")


def bucketed_running_sum(
    df: DataFrame,
    *,
    part_cols: list[str],
    order_col: str,
    value_col: str,
    bucket: Column,
    out_col: str,
) -> DataFrame:
    """Running SUM(value_col) over (PARTITION BY part_cols ORDER BY
    order_col ROWS UNBOUNDED PRECEDING), computed as a two-level scan.

    `bucket` must be an order-consistent range bucket of `order_col`
    (see module docstring). The corpus shuffles ONCE, by
    (part_cols, bucket); the cross-bucket carry is a per-(key, bucket)
    totals relation (tiny) prefix-summed per key and broadcast back.
    """
    b = df.withColumn("__bkt", bucket)
    w_in = (
        Window.partitionBy(*part_cols, "__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win = b.withColumn("__cum_in", F.sum(value_col).over(w_in))
    # Per-bucket totals: grouped on the window's own (key, bucket)
    # clustering, so Catalyst inserts no new exchange and AQE reuses the
    # corpus shuffle for this branch.
    totals = win.groupBy(*part_cols, "__bkt").agg(F.sum(value_col).alias("__tot"))
    # Cross-bucket carry: prefix-sum the totals per key. This window IS
    # partitioned by the bare key — but over `buckets` rows per key, not
    # the corpus.
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *part_cols, "__bkt", F.sum("__tot").over(w_off).alias("__off")
    )
    return (
        win.join(F.broadcast(offsets), [*part_cols, "__bkt"], "left")
        .withColumn(
            out_col,
            F.col("__cum_in") + F.coalesce(F.col("__off"), F.lit(0).cast("long")),
        )
        .drop("__bkt", "__cum_in", "__off")
    )
