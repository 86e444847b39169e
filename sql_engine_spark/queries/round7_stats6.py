"""Round-7 stats set 6: the one-pass covariance matrix over the four
lineitem measures (the EDA primitive behind every feature audit), and
temperature-smoothed source-mixture weights (tau = 2 i.e. p^(1/2) — the
multilingual upsampling rule of mBERT/XLM-R, spelled with sqrt so it
stays inside the libm-free house rules).

Determinism: all ten co-moments reduce through ssum/dsum in ONE
map-side-combinable aggregate (zero joins, zero shuffles beyond the
single global agg); mixture weights are sqrt (IEEE-exact) over exact
counts with dsum for the tiny cross-source normalizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import (
    dsum,
    sql_dsum,
    sql_ssum,
    ssum,
)
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_COV_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_COV_SCALE = "1000000.0"


def _cov_oracle() -> str:
    sums = [sql_dsum(c) + f" AS s_{c}" for c in _COV_COLS]
    prods = []
    for a in range(len(_COV_COLS)):
        for b in range(a, len(_COV_COLS)):
            ca, cb = _COV_COLS[a], _COV_COLS[b]
            prods.append(
                sql_ssum(f"{ca} * {cb}", scale=_COV_SCALE) + f" AS p_{a}_{b}"
            )
    pair_rows = []
    for a in range(len(_COV_COLS)):
        for b in range(a, len(_COV_COLS)):
            pair_rows.append(
                f"SELECT '{_COV_COLS[a]}' AS x, '{_COV_COLS[b]}' AS y, "
                f"(p_{a}_{b} - s_{_COV_COLS[a]} * s_{_COV_COLS[b]} "
                f"/ CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS cov "
                f"FROM s"
            )
    return f"""
        WITH s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {", ".join(sums)},
                   {", ".join(prods)}
            FROM lineitem
        )
        {" UNION ALL ".join(pair_rows)}
    """


@register(
    "agg_covariance_matrix",
    oracle=_cov_oracle(),
    doc="Population covariance matrix of the four lineitem measures "
    "(quantity, extendedprice, discount, tax) in ONE map-side- "
    "combinable aggregate — 4 linear sums through the DECIMAL detour "
    "+ 10 product sums through ssum's shared rounding, then cov(x,y) "
    "= (Sxy - Sx*Sy/n)/n per upper-triangle pair. Zero joins and zero "
    "shuffles beyond the single global agg: the co-moment pass is the "
    "textbook distributed-EDA spelling (one scan feeds the whole "
    "matrix), vs. 10 separate corr() scans. Emitted tidy as (x, y, "
    "cov) rows.",
)
def agg_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    scale = float(_COV_SCALE)
    aggs = [F.count("*").cast("long").alias("n")]
    for c in _COV_COLS:
        aggs.append(dsum(c).alias(f"s_{c}"))
    for a in range(len(_COV_COLS)):
        for b in range(a, len(_COV_COLS)):
            aggs.append(
                ssum(
                    F.col(_COV_COLS[a]) * F.col(_COV_COLS[b]), scale=scale
                ).alias(f"p_{a}_{b}")
            )
    s = li.agg(*aggs)
    out = None
    for a in range(len(_COV_COLS)):
        for b in range(a, len(_COV_COLS)):
            ca, cb = _COV_COLS[a], _COV_COLS[b]
            row = s.select(
                F.lit(ca).alias("x"),
                F.lit(cb).alias("y"),
                (
                    (
                        F.col(f"p_{a}_{b}")
                        - F.col(f"s_{ca}") * F.col(f"s_{cb}") / F.col("n").cast("double")
                    )
                    / F.col("n").cast("double")
                ).alias("cov"),
            )
            out = row if out is None else out.unionAll(row)
    return out


@register(
    "curation_temperature_mixture",
    oracle=f"""
        WITH per_source AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
                   {sql_dsum("sqrt(CAST(n_docs AS DOUBLE))")} AS z
            FROM per_source
        )
        SELECT source, n_docs,
               CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE) AS raw_share,
               sqrt(CAST(n_docs AS DOUBLE)) / z AS smoothed_share,
               (sqrt(CAST(n_docs AS DOUBLE)) / z)
               / (CAST(n_docs AS DOUBLE) / CAST(n AS DOUBLE))
                   AS upsample_factor
        FROM per_source CROSS JOIN tot
    """,
    doc="Temperature-smoothed mixture weights at tau = 2: sampling "
    "share proportional to n_s^(1/2) instead of n_s — the standard "
    "low-resource upsampling rule (mBERT / XLM-R exponential "
    "smoothing, alpha = 0.5 chosen because sqrt is IEEE-correctly- "
    "rounded and thus the one smoothing exponent the libm-free house "
    "rules allow exactly). One corpus grouped count; the source-sized "
    "normalizer reduces through the DECIMAL detour; upsample_factor "
    "= smoothed/raw shows how much each tail source gets boosted. "
    "Complements curation_mixture_reweight (target-share spelling) "
    "and curation_source_cap (hard ceilings).",
)
def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    tot = per_source.agg(
        F.sum("n_docs").cast("long").alias("n"),
        dsum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
    )
    raw = F.col("n_docs").cast("double") / F.col("n").cast("double")
    smooth = F.sqrt(F.col("n_docs").cast("double")) / F.col("z")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        raw.alias("raw_share"),
        smooth.alias("smoothed_share"),
        (smooth / raw).alias("upsample_factor"),
    )
