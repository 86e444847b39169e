"""Round-7 curation set 2: the skyline (Pareto-dominance) operator over
(token count, lexical-diversity ratio) — the classic multi-objective
selection the SQL standard never got (Borzsonyi, Kossmann & Stocker,
ICDE 2001 proposed SKYLINE OF; no engine shipped it) — and systematic
(every-k-th) sampling in deterministic hash order with the stride
DERIVED from the corpus count.

Determinism: skyline membership compares exact integers and single
exact integer divisions on the distinct-token-count domain relation;
systematic sampling strides an md5-ordered exact rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import (
    bucketed_running_sum,
    derived_rank_buckets,
    hex_prefix_bucket,
)
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register


@register(
    "curation_skyline_2d",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, list_filter({sql_tokens('text')}, t -> t <> '') AS tk
            FROM documents
        ),
        pts AS (
            SELECT doc_id,
                   CAST(len(tk) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(tk)) AS DOUBLE)
                   / CAST(len(tk) AS DOUBLE) AS distinct_ratio
            FROM toks WHERE len(tk) > 0
        ),
        lvl AS (
            SELECT n_tokens, MAX(distinct_ratio) AS level_max
            FROM pts GROUP BY n_tokens
        ),
        sfx AS (
            SELECT n_tokens, level_max,
                   MAX(level_max) OVER (
                       ORDER BY n_tokens DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) AS suffix_strict
            FROM lvl
        )
        SELECT p.doc_id, p.n_tokens, p.distinct_ratio
        FROM pts p JOIN sfx s ON p.n_tokens = s.n_tokens
        WHERE p.distinct_ratio = s.level_max
          AND (s.suffix_strict IS NULL OR s.suffix_strict < p.distinct_ratio)
    """,
    doc="Skyline / Pareto-frontier query maximizing (n_tokens, "
    "distinct-token ratio) — length vs lexical diversity, the "
    "anticorrelated pair every curation trade-off walks — a document "
    "survives iff no other is >= in both dimensions and > in one: the "
    "SKYLINE OF operator of Borzsonyi et al. (ICDE 2001) that SQL "
    "never standardized. Spelled by domain decomposition: per "
    "distinct token count, the max ratio (one grouped aggregate); a "
    "suffix max over the DISTINCT-COUNT relation (domain-sized "
    "window, the roc_auc device) gives the best ratio at any strictly "
    "greater length; a row is on the skyline iff it is its level's "
    "max and strictly beats that suffix. The ratio is a single exact "
    "integer division; equal duplicate points are mutually "
    "non-dominating and both kept, per the paper's definition.",
)
def curation_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tk = F.filter(tokens("text"), lambda t: t != "")
    pts = _persist(
        docs.select(
            "doc_id",
            F.size(tk).cast("long").alias("n_tokens"),
            (
                F.size(F.array_distinct(tk)).cast("double")
                / F.size(tk).cast("double")
            ).alias("distinct_ratio"),
        ).where(F.col("n_tokens") > 0)
    )
    lvl = pts.groupBy("n_tokens").agg(
        F.max("distinct_ratio").alias("level_max")
    )
    w = Window.orderBy(F.desc("n_tokens")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    sfx = lvl.select(
        "n_tokens", "level_max", F.max("level_max").over(w).alias("suffix_strict")
    )
    return (
        pts.join(sfx, "n_tokens")
        .where(
            (F.col("distinct_ratio") == F.col("level_max"))
            & (
                F.col("suffix_strict").isNull()
                | (F.col("suffix_strict") < F.col("distinct_ratio"))
            )
        )
        .select("doc_id", "n_tokens", "distinct_ratio")
    )


_SYS_TARGET = 100


def derived_stride(n_rows: int, target: int = _SYS_TARGET) -> int:
    """Systematic-sampling stride k = ceil(n / target): grows with the
    corpus so the sample stays ~target rows at any scale (the derived_*
    sizing convention — never a fixed constant)."""
    import math

    return max(1, math.ceil(max(n_rows, 1) / target))


def _systematic_oracle(sf_dir: str) -> str:
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    k = derived_stride(n)
    return f"""
        WITH h AS (
            SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx
            FROM documents
        ),
        ranked AS (
            SELECT doc_id, source,
                   CAST(row_number() OVER (ORDER BY hx, doc_id) AS BIGINT) AS rk
            FROM h
        )
        SELECT doc_id, source, rk FROM ranked WHERE (rk - 1) % {k} = 0
    """


@register(
    "sample_systematic",
    oracle=_systematic_oracle,
    doc="Systematic (every-k-th) sampling in deterministic hash order "
    "(Madow 1944): rank all documents by md5(doc_id) — a reproducible "
    "shuffle, so the stride hits an effectively random but replayable "
    f"subset — and keep ranks 1, k+1, 2k+1, ... with k = ceil(n/"
    f"{_SYS_TARGET}) DERIVED from the corpus count (the derived_* "
    "convention; the callable oracle re-derives k from a DuckDB "
    "count). The rank runs through the two-level bucketed scan, never "
    "one global window; guarantees exactly-even coverage of the hash "
    "space, unlike Bernoulli sampling's variance.",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _persist(
        load(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("hx"),
        )
    )
    n = docs.count()
    k = derived_stride(n)
    base = docs.withColumn(
        "__ord", F.struct(F.col("hx"), F.col("doc_id"))
    ).withColumn("__one", F.lit(1).cast("long"))
    ranked = bucketed_running_sum(
        base,
        part_cols=[],
        order_col="__ord",
        value_col="__one",
        bucket=hex_prefix_bucket("hx", derived_rank_buckets(n)),
        out_col="rk",
    )
    return (
        ranked.where((F.col("rk") - 1) % k == 0)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )
