"""Skew mitigation: salted aggregation and salted shuffle joins.

At 100 TB a handful of hot keys (a viral user, a dominant event type)
can pin an entire stage on one reducer. AQE's skew-join splitting
(enabled in session.py) handles most cases at runtime; these operators
are the explicit, plan-level form for when the skew is known up front:

- salted aggregation: shuffle on (key, salt) so a hot key spreads over
  `buckets` reducers, then a cheap second aggregate over ~buckets rows
  per key merges the partials.
- salted join: the fact side salts deterministically from a unique
  column; the (small-ish, but too big to broadcast) dim side replicates
  each row `buckets` times so every (key, salt) pair finds its match.

Salt must be DETERMINISTIC (hash of a unique column, not rand()):
recomputation after a lost task must land rows in the same bucket.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def with_salt(df: DataFrame, unique_col: str | Sequence[str], buckets: int) -> DataFrame:
    cols = [unique_col] if isinstance(unique_col, str) else list(unique_col)
    return df.withColumn(SALT, F.pmod(F.xxhash64(*cols), F.lit(buckets)))


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_col: str | Column,
    *,
    unique_col: str,
    buckets: int = 16,
) -> DataFrame:
    """GROUP BY `keys` computing count(*), sum, min, max — in two salted
    stages. Result columns: keys + (n, sum_<v>, min_<v>, max_<v>).

    The value sum stays in DECIMAL(27,6) between the stages so the
    two-stage reduction is bit-identical to a single-stage one.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    name = value_col if isinstance(value_col, str) else "value"
    partial = (
        with_salt(df, unique_col, buckets)
        .groupBy(*keys, SALT)
        .agg(
            F.count("*").alias("__n"),
            F.sum(v.cast("decimal(27,6)")).alias("__s"),
            F.min(v).alias("__mn"),
            F.max(v).alias("__mx"),
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        F.sum("__s").cast("double").alias(f"sum_{name}"),
        F.min("__mn").alias(f"min_{name}"),
        F.max("__mx").alias(f"max_{name}"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    unique_col: str | Sequence[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join on `on` with the fact side spread over `buckets`
    reducers per key. The dim side is replicated xbuckets (use only when
    the dim is too large to broadcast but far smaller than the fact)."""
    salted_fact = with_salt(fact, unique_col, buckets)
    replicated = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(buckets).select(F.col("id").cast("long").alias(SALT))
        )
    )
    joined = salted_fact.join(replicated.hint("shuffle_hash"), [on, SALT], how)
    return joined.drop(SALT)
