"""Round-7 stats set 7: the sample-ratio-mismatch (SRM) check every
experimentation platform runs before trusting an A/B readout, and
Welch's unequal-variance t-test (the recommended default over Student's
t — Welch 1947, Ruxton 2006) comparing purchase vs click values.

Determinism: SRM's chi-square goodness-of-fit is exact integer algebra
over the two cohort counts with one final division; Welch's statistic
and Welch-Satterthwaite dof use DECIMAL/ssum moment sums with the
closed form evaluated once in shared-order double arithmetic (divisions
and sqrt only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_dsum, sql_ssum, dsum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# chi2(1 dof) critical value at alpha = 0.05, shared literal.
_SRM_CRIT = "3.841458820694124"


@register(
    "events_ab_srm_check",
    oracle=f"""
        WITH u AS (
            SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_a,
                   CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_b
            FROM u
        )
        SELECT n_a, n_b,
               CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
               / CAST(n_a + n_b AS DOUBLE) AS chi2,
               (CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                / CAST(n_a + n_b AS DOUBLE))
               > CAST({_SRM_CRIT} AS DOUBLE) AS srm_detected
        FROM c
    """,
    doc="Sample-ratio-mismatch check for the user_id%2 cohort split "
    "(the assignment events_abtest_ztest reads out): chi-square "
    "goodness-of-fit against the designed 50/50 ratio, which for two "
    "cells reduces EXACTLY to (n_a - n_b)^2/(n_a + n_b) — exact "
    "integer algebra, one division — compared to the 1-dof 5% "
    "critical value embedded as a shared literal (no p-value, no "
    "erf/libm). SRM is the first gate of every experiment readout "
    "(Fabijan et al. 2019): a triggered check means the assignment "
    "itself is broken and the z-test readout is void. One corpus "
    "grouped distinct pass; everything after is a 1-row relation.",
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.first(F.col("user_id") % 2).cast("long").alias("cohort")
    )
    c = u.agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    chi2 = ((F.col("n_a") - F.col("n_b")) * (F.col("n_a") - F.col("n_b"))).cast(
        "double"
    ) / (F.col("n_a") + F.col("n_b")).cast("double")
    return c.select(
        "n_a",
        "n_b",
        chi2.alias("chi2"),
        (chi2 > F.lit(float(_SRM_CRIT))).alias("srm_detected"),
    )


_WELCH_A, _WELCH_B = "purchase", "click"


@register(
    "agg_welch_ttest",
    oracle=f"""
        WITH s AS (
            SELECT CAST(SUM(CASE WHEN event_type = '{_WELCH_A}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   {sql_dsum(f"CASE WHEN event_type = '{_WELCH_A}' THEN value END")}
                       AS s1,
                   {sql_ssum(
                       f"CASE WHEN event_type = '{_WELCH_A}' "
                       "THEN value * value END"
                   )} AS q1,
                   CAST(SUM(CASE WHEN event_type = '{_WELCH_B}'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                   {sql_dsum(f"CASE WHEN event_type = '{_WELCH_B}' THEN value END")}
                       AS s2,
                   {sql_ssum(
                       f"CASE WHEN event_type = '{_WELCH_B}' "
                       "THEN value * value END"
                   )} AS q2
            FROM events
        ),
        v AS (
            SELECT n1, n2,
                   s1 / CAST(n1 AS DOUBLE) AS m1,
                   s2 / CAST(n2 AS DOUBLE) AS m2,
                   (q1 - s1 * s1 / CAST(n1 AS DOUBLE))
                   / CAST(n1 - 1 AS DOUBLE) AS v1,
                   (q2 - s2 * s2 / CAST(n2 AS DOUBLE))
                   / CAST(n2 - 1 AS DOUBLE) AS v2
            FROM s
        )
        SELECT n1, n2, m1, m2,
               (m1 - m2)
               / sqrt(v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)) AS t,
               ((v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE))
                * (v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE)))
               / ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE))
                  / CAST(n1 - 1 AS DOUBLE)
                  + (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE))
                    / CAST(n2 - 1 AS DOUBLE)) AS dof
        FROM v
    """,
    doc=f"Welch's unequal-variance t-test comparing '{_WELCH_A}' vs "
    f"'{_WELCH_B}' event values (Welch 1947; Ruxton 2006 argues it "
    "should be the default over Student's t), with the Welch- "
    "Satterthwaite effective degrees of freedom: both groups' moments "
    "come from ONE conditional-aggregate corpus pass (dsum linear "
    "sums, ssum squares — map-side combinable, zero joins), and the "
    "statistic + dof are closed forms with divisions and one sqrt. "
    "Complements agg_cohens_d (effect size, same two-group device) "
    "and agg_mannwhitney_u (the rank-based alternative).",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_a = F.col("event_type") == _WELCH_A
    is_b = F.col("event_type") == _WELCH_B
    s = ev.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("n1"),
        dsum(F.when(is_a, F.col("value"))).alias("s1"),
        ssum(F.when(is_a, F.col("value") * F.col("value"))).alias("q1"),
        F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("n2"),
        dsum(F.when(is_b, F.col("value"))).alias("s2"),
        ssum(F.when(is_b, F.col("value") * F.col("value"))).alias("q2"),
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    v = s.select(
        "n1",
        "n2",
        (F.col("s1") / n1d).alias("m1"),
        (F.col("s2") / n2d).alias("m2"),
        (
            (F.col("q1") - F.col("s1") * F.col("s1") / n1d)
            / (F.col("n1") - 1).cast("double")
        ).alias("v1"),
        (
            (F.col("q2") - F.col("s2") * F.col("s2") / n2d)
            / (F.col("n2") - 1).cast("double")
        ).alias("v2"),
    )
    se1 = F.col("v1") / F.col("n1").cast("double")
    se2 = F.col("v2") / F.col("n2").cast("double")
    return v.select(
        "n1",
        "n2",
        "m1",
        "m2",
        ((F.col("m1") - F.col("m2")) / F.sqrt(se1 + se2)).alias("t"),
        (
            ((se1 + se2) * (se1 + se2))
            / (
                se1 * se1 / (F.col("n1") - 1).cast("double")
                + se2 * se2 / (F.col("n2") - 1).cast("double")
            )
        ).alias("dof"),
    )
