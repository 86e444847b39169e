"""Shared text preparation: tokenization and shingling, JVM-side.

Everything here is built from Spark higher-order functions (transform /
slice / array_join) so it runs inside whole-stage codegen — no Python in
the hot path. At 100 TB these are pure map stages: no shuffle, prune to
the text column only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens(text_col: str) -> Column:
    """Lowercase whitespace tokenization."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def shingles_expr(tokens_col: str, k: int) -> str:
    """Spark-SQL string form of `shingles` (for embedding in larger exprs)."""
    return (
        f"CASE WHEN size({tokens_col}) < {k} THEN array(array_join({tokens_col}, ' ')) "
        f"ELSE transform(sequence(1, size({tokens_col}) - {k - 1}), "
        f"     i -> array_join(slice({tokens_col}, i, {k}), ' ')) END"
    )


def shingles(tokens_col: str, k: int) -> Column:
    """k-gram word shingles joined by single spaces.

    Guarded for short docs: Spark's `sequence(1, n)` happily produces a
    DESCENDING sequence when n < 1, so the size guard is load-bearing.
    """
    return F.expr(shingles_expr(tokens_col, k))


def with_shingles(df: DataFrame, text_col: str, k: int, out: str = "shingles") -> DataFrame:
    return df.withColumn("__tokens", tokens(text_col)).withColumn(
        out, shingles("__tokens", k)
    ).drop("__tokens")


# DuckDB spellings of the same transforms (for oracle SQL). DuckDB's
# range(a, b) is end-EXCLUSIVE vs Spark's inclusive sequence, and list
# slicing t[i:j] is inclusive of both ends.
def sql_tokens(text_expr: str) -> str:
    return f"string_split_regex(lower(trim({text_expr})), '\\s+')"


def sql_shingles(tokens_expr: str, k: int) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) < {k} THEN [array_to_string({tokens_expr}, ' ')] "
        f"ELSE list_transform(range(1, len({tokens_expr}) - {k - 2}), "
        f"     i -> array_to_string(({tokens_expr})[i:i+{k - 1}], ' ')) END"
    )
