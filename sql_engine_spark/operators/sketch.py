"""Count-Min Sketch heavy hitters (Cormode & Muthukrishnan, J. Alg 2005).

The streaming-sketch answer to "which keys are hot?" at 100 TB: a
d x w counter matrix replaces a full per-key count. Here the sketch is
BUILT distributively in ONE corpus pass — the d bucket ids are computed
as sibling columns (one md5 each, shared via CSE), stack()ed into
(row, bucket) pairs and hash-aggregated map-side — so the whole sketch
is a bounded d*w-row relation no matter the corpus size, and is then
queried by broadcasting it back against the distinct keys.

The defining CMS guarantee — estimates never UNDERcount — is emitted as
a deterministic boolean column (est >= exact) so the property itself is
oracle-checked, the pattern the project uses for every sketch (see
approx_count_distinct).

Hashing is md5-derived (identical in Spark and DuckDB); everything is
integer arithmetic, so the whole operator hash-matches cross-engine.

In production the per-key exact verify join is dropped and the sketch
alone answers point queries; it's kept here because the operator's
contract (the overcount bound) is the thing under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 3
CMS_WIDTH = 64


def _bucket(key_expr: str, row: int, width: int) -> F.Column:
    """Row-`row` CMS bucket of a (string) key: md5-derived, 0..width-1."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), F.expr(key_expr))), 1, 8),
            16,
            10,
        ).cast("long")
        % width
    )


def _sql_bucket(key_expr: str, row: int, width: int) -> str:
    h = (
        f"list_reduce(list_transform(range(1, 9), "
        f"i -> CAST(instr('0123456789abcdef', "
        f"substring(md5(concat('{row}:', {key_expr})), i, 1)) - 1 AS BIGINT)), "
        f"(a, b) -> a * 16 + b)"
    )
    return f"({h} % {width})"


def countmin_heavy_hitters(
    df: DataFrame,
    *,
    key_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est_count, exact_count, never_undercounts) for keys whose
    CMS estimate >= threshold. est = min over depth rows of the key's
    counter; the boolean pins the CMS overcount-only guarantee."""
    key = F.col(key_col).cast("string")
    base = df.select(key.alias("__k"))
    # Build: ONE corpus pass. The depth buckets are computed as explicit
    # columns (shared md5 evaluation via CSE), stack()ed into
    # (row, bucket) pairs — depth x rows of 16-byte tuples — and hash-
    # aggregated once. A union of per-row aggregates would re-scan the
    # corpus `depth` times.
    bucket_cols = [_bucket("__k", r, width).alias(f"__b{r}") for r in range(depth)]
    stack = (
        f"stack({depth}, "
        + ", ".join(f"{r}, __b{r}" for r in range(depth))
        + ") as (__r, __b)"
    )
    counters = (
        base.select(*bucket_cols)
        .selectExpr(stack)
        .groupBy("__r", "__b")
        .agg(F.count("*").alias("__n"))
    )
    # Query: distinct keys (one corpus aggregate) -> stack the depth
    # probes from the DISTINCT relation -> min counter.
    keys = base.groupBy("__k").agg(F.count("*").cast("long").alias("exact_count"))
    return cms_estimate(keys, counters, threshold=threshold, depth=depth, width=width)


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    *,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Serve side of the sketch, shared by the batch and streaming
    variants: probe each key's depth buckets against the (broadcast)
    counter relation, estimate = min counter, emit the overcount-bound
    boolean. `keys` must have columns (__k, exact_count)."""
    bucket_cols = [_bucket("__k", r, width).alias(f"__b{r}") for r in range(depth)]
    stack = (
        f"stack({depth}, "
        + ", ".join(f"{r}, __b{r}" for r in range(depth))
        + ") as (__r, __b)"
    )
    est = keys.select("__k", "exact_count", *bucket_cols).selectExpr(
        "__k", "exact_count", stack
    )
    return (
        est.join(F.broadcast(counters), ["__r", "__b"])
        .groupBy("__k", "exact_count")
        .agg(F.min("__n").cast("long").alias("est_count"))
        .where(F.col("est_count") >= threshold)
        .select(
            F.col("__k").alias("key"),
            "est_count",
            "exact_count",
            (F.col("est_count") >= F.col("exact_count")).alias("never_undercounts"),
        )
    )


def sql_countmin_heavy_hitters(
    key_expr: str,
    source: str,
    *,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    counter_branches = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_sql_bucket('k', r, width)} AS b, COUNT(*) AS n "
        f"FROM base GROUP BY 2"
        for r in range(depth)
    )
    key_branches = "\nUNION ALL\n".join(
        f"SELECT k, exact_count, {r} AS r, {_sql_bucket('k', r, width)} AS b FROM keys"
        for r in range(depth)
    )
    return f"""
        WITH base AS (
            SELECT CAST({key_expr} AS VARCHAR) AS k FROM {source}
        ),
        counters AS (
            {counter_branches}
        ),
        keys AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_count FROM base GROUP BY k
        ),
        probes AS (
            {key_branches}
        )
        SELECT k AS key,
               CAST(MIN(n) AS BIGINT) AS est_count,
               exact_count,
               CAST(MIN(n) AS BIGINT) >= exact_count AS never_undercounts
        FROM probes JOIN counters USING (r, b)
        GROUP BY k, exact_count
        HAVING CAST(MIN(n) AS BIGINT) >= {threshold}
    """
