"""Round-10 quality/sampling batch: equalized-odds audit (Hardt,
Price & Srebro NeurIPS 2016 — per-group TPR/FPR gaps, the
error-rate-conditional fairness criterion complementing r9's
quality_selection_rate_parity demographic-parity check) and Neyman
optimal stratified allocation (Neyman 1934 — the allocation that
minimizes the stratified estimator's variance for a fixed budget).

Pseudo-classifier conventions follow quality_roc_auc: score =
document length (n_chars), positive label = (lang = 'en'); the
threshold is the exact lower-median length (the percentile_exact
convention). Groups = source for the fairness audit, lang for the
allocation strata.

The reference engine has no CASE/percentile/window surface
(/root/reference/src/executor/aggregation.rs:168-427).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# quality_equalized_odds_gap — per-source TPR/FPR vs the pooled rates
# ---------------------------------------------------------------------------

_SQL_MEDIAN_THRESH = """thresh AS (
            SELECT n_chars AS t FROM (
                SELECT n_chars,
                       row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
                       COUNT(*) OVER () AS n
                FROM documents
            ) WHERE rn = (n + 1) // 2
        )"""


@register(
    "quality_equalized_odds_gap",
    oracle=f"""
        WITH {_SQL_MEDIAN_THRESH},
        scored AS (
            SELECT source,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                   CASE WHEN n_chars >= t THEN 1 ELSE 0 END AS yhat
            FROM documents CROSS JOIN thresh
        ),
        pooled AS (
            SELECT CASE WHEN SUM(y) = 0 THEN NULL ELSE
                   CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE)
                   / CAST(SUM(y) AS DOUBLE) END AS tpr_all,
                   CASE WHEN SUM(1 - y) = 0 THEN NULL ELSE
                   CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE)
                   / CAST(SUM(1 - y) AS DOUBLE) END AS fpr_all
            FROM scored
        ),
        per_group AS (
            SELECT source,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS n_neg,
                   CASE WHEN SUM(y) = 0 THEN NULL ELSE
                   CAST(SUM(CASE WHEN y = 1 AND yhat = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(SUM(y) AS DOUBLE) END AS tpr,
                   CASE WHEN SUM(1 - y) = 0 THEN NULL ELSE
                   CAST(SUM(CASE WHEN y = 0 AND yhat = 1 THEN 1 ELSE 0 END)
                        AS DOUBLE) / CAST(SUM(1 - y) AS DOUBLE) END AS fpr
            FROM scored GROUP BY source
        )
        SELECT g.source, g.n_pos, g.n_neg, g.tpr, g.fpr,
               g.tpr - p.tpr_all AS tpr_gap,
               g.fpr - p.fpr_all AS fpr_gap,
               GREATEST(ABS(g.tpr - p.tpr_all), ABS(g.fpr - p.fpr_all))
                   AS eo_gap
        FROM per_group g CROSS JOIN pooled p
    """,
    doc="Equalized-odds audit (Hardt, Price & Srebro NeurIPS 2016) of "
    "the house pseudo-classifier (predict 'en' when n_chars >= the "
    "exact lower-median length, quality_roc_auc's score/label "
    "convention) across sources: per source, TPR and FPR with their "
    "gaps to the POOLED rates, and eo_gap = max(|tpr_gap|, "
    "|fpr_gap|) — zero iff the classifier's error profile is "
    "group-independent (the criterion demographic parity misses "
    "when base rates differ; complements r9's selection-rate "
    "parity). All counts integer-exact; the divisions are final. "
    "One corpus aggregate after a broadcast 1-row threshold join — "
    "the per-slice error audit every dataset card should carry.",
)
def quality_equalized_odds_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # Median n_chars WITHOUT ranking every document through one global
    # window (r11 window sweep): the n_chars at global rank (n+1)//2
    # under (n_chars, doc_id) order is the smallest n_chars whose
    # cumulative document count reaches that rank — the doc_id
    # tie-break never changes which VALUE sits at the rank. So the
    # corpus aggregates per distinct n_chars (value-domain-bounded,
    # like the score-grid quality ops) and one tiny cumulative window
    # finds the crossing group. Identical threshold, no corpus-sized
    # single-task sort.
    per = docs.groupBy("n_chars").agg(F.count("*").cast("long").alias("cnt"))
    wc = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ntot = docs.agg(F.count("*").cast("long").alias("n"))
    # integer division parity: (n + 1) // 2 in both engines
    thresh = (
        per.withColumn("cum", F.sum("cnt").over(wc))
        .crossJoin(F.broadcast(ntot))
        .where(
            (F.col("cum") >= F.floor((F.col("n") + 1) / 2))
            & (
                F.col("cum") - F.col("cnt")
                < F.floor((F.col("n") + 1) / 2)
            )
        )
        .select(F.col("n_chars").alias("t"))
    )
    scored = docs.crossJoin(F.broadcast(thresh)).select(
        "source",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.when(F.col("n_chars") >= F.col("t"), 1).otherwise(0).alias("yhat"),
    )
    # Explicit zero-denominator guards: a single-class group must yield
    # NULL in BOTH engines (DuckDB IEEE floats would give inf/NaN).
    def _rate(hit_cond, denom_col):
        denom = F.sum(denom_col).cast("double")
        return F.when(
            denom == 0, F.lit(None).cast("double")
        ).otherwise(
            F.sum(F.when(hit_cond, 1).otherwise(0)).cast("double") / denom
        )

    _tp = (F.col("y") == 1) & (F.col("yhat") == 1)
    _fp = (F.col("y") == 0) & (F.col("yhat") == 1)
    pooled = scored.agg(
        _rate(_tp, F.col("y")).alias("tpr_all"),
        _rate(_fp, F.lit(1) - F.col("y")).alias("fpr_all"),
    )
    per_group = scored.groupBy("source").agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg"),
        _rate(_tp, F.col("y")).alias("tpr"),
        _rate(_fp, F.lit(1) - F.col("y")).alias("fpr"),
    )
    return per_group.crossJoin(F.broadcast(pooled)).select(
        "source",
        "n_pos",
        "n_neg",
        "tpr",
        "fpr",
        (F.col("tpr") - F.col("tpr_all")).alias("tpr_gap"),
        (F.col("fpr") - F.col("fpr_all")).alias("fpr_gap"),
        F.greatest(
            F.abs(F.col("tpr") - F.col("tpr_all")),
            F.abs(F.col("fpr") - F.col("fpr_all")),
        ).alias("eo_gap"),
    )


# ---------------------------------------------------------------------------
# sample_neyman_allocation — variance-optimal stratified budget split
# ---------------------------------------------------------------------------

_NEYMAN_BUDGET = 1000


@register(
    "sample_neyman_allocation",
    oracle=f"""
        WITH strata AS (
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_h,
                   sqrt((CAST(COUNT(*) AS DOUBLE)
                             * SUM(CAST(n_chars AS DOUBLE)
                                   * CAST(n_chars AS DOUBLE))
                         - SUM(CAST(n_chars AS DOUBLE))
                             * SUM(CAST(n_chars AS DOUBLE)))
                        / (CAST(COUNT(*) AS DOUBLE)
                           * CAST(COUNT(*) - 1 AS DOUBLE))) AS sd_h
            FROM documents GROUP BY lang
        ),
        tot AS (
            SELECT CAST(SUM(CAST(CAST(n_h AS DOUBLE) * sd_h
                        AS DECIMAL(27,6))) AS DOUBLE) AS mass
            FROM strata
        ),
        alloc AS (
            SELECT s.lang, s.n_h, s.sd_h,
                   CAST(n_h AS DOUBLE) * sd_h / mass AS weight,
                   CAST(round({_NEYMAN_BUDGET}.0 * CAST(n_h AS DOUBLE)
                              * sd_h / mass) AS BIGINT) AS n_alloc
            FROM strata s CROSS JOIN tot
        )
        SELECT lang, n_h, sd_h, weight, n_alloc,
               CAST(n_alloc AS DOUBLE) / CAST(n_h AS DOUBLE)
                   AS sampling_rate
        FROM alloc
    """,
    doc=f"Neyman optimal stratified allocation (Neyman 1934) of a "
    f"{_NEYMAN_BUDGET}-row sampling budget across language strata, "
    "proportional to N_h * sd_h of the document-length variable: "
    "the allocation that minimizes the stratified mean estimator's "
    "variance for a fixed budget — high-variance strata get more "
    "than proportional share (vs sample_stratified's equal-rate "
    "design). Per stratum: size, exact-identity standard deviation "
    "(integer sum/sumsq — n_chars is integral, so the sums are "
    "exact in double; one correctly-rounded sqrt), Neyman weight, "
    "rounded allocation, realized sampling rate. ONE corpus "
    "aggregate + a 5-row broadcast normalization — the planning "
    "table a 100 TB labeling/eval budget starts from.",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("double")
    strata = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sqrt(
            (
                F.count("*").cast("double") * F.sum(x * x)
                - F.sum(x) * F.sum(x)
            )
            / (
                F.count("*").cast("double")
                * (F.count("*") - 1).cast("double")
            )
        ).alias("sd_h"),
    )
    from sql_engine_spark.functions.numeric import dsum

    tot = strata.agg(
        dsum(F.col("n_h").cast("double") * F.col("sd_h")).alias("mass")
    )
    alloc = strata.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_h",
        "sd_h",
        (F.col("n_h").cast("double") * F.col("sd_h") / F.col("mass")).alias(
            "weight"
        ),
        F.round(
            F.lit(float(_NEYMAN_BUDGET))
            * F.col("n_h").cast("double")
            * F.col("sd_h")
            / F.col("mass"),
            0,
        )
        .cast("long")
        .alias("n_alloc"),
    )
    return alloc.select(
        "lang",
        "n_h",
        "sd_h",
        "weight",
        "n_alloc",
        (F.col("n_alloc").cast("double") / F.col("n_h").cast("double")).alias(
            "sampling_rate"
        ),
    )
