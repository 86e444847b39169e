"""Round-8 statistics: k-sample and paired rank tests plus
non-parametric trend/change-point estimators over the events table —
Kruskal-Wallis, Mann-Kendall (with tau-b), Brown-Forsythe, Wilcoxon
signed-rank, Pettitt, and the Hodges-Lehmann shift estimator.

House discipline (see round7_stats module docstring): every
corpus-sized ranking goes through operators/prefix.bucketed_value_rank
(two-level bucketed scan — no global single-task sort at any scale);
day-granular tests reduce the corpus to the BOUNDED day relation with
one counting aggregate and do their O(days^2) pair algebra there;
statistics assemble from EXACT INTEGER (or decimal-exact) sums through
fixed-literal-order double expressions + sqrt only (no libm
transcendentals in hashed outputs — cross-engine bit-stability).
Tie handling is spelled identically in both engines and documented per
operator. The reference engine has no statistics surface (SURVEY.md §2
caps at avg); these extend the LLM-data-pipeline analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

_G1, _G2, _G3 = "click", "purchase", "error"

_DAILY_SQL = """
        daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        )"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(d, c): the bounded day relation — ONE corpus counting aggregate."""
    return (
        load(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count("*").cast("long").alias("c"))
    )


@register(
    "agg_kruskal_wallis",
    oracle=f"""
        WITH s AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('{_G1}', '{_G2}', '{_G3}')
        ),
        r AS (
            SELECT event_type,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rk
            FROM s
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                   CAST(COUNT(CASE WHEN event_type = '{_G1}' THEN 1 END)
                        AS BIGINT) AS n_1,
                   CAST(COUNT(CASE WHEN event_type = '{_G2}' THEN 1 END)
                        AS BIGINT) AS n_2,
                   CAST(COUNT(CASE WHEN event_type = '{_G3}' THEN 1 END)
                        AS BIGINT) AS n_3,
                   CAST(SUM(CASE WHEN event_type = '{_G1}' THEN rk ELSE 0 END)
                        AS BIGINT) AS r_1,
                   CAST(SUM(CASE WHEN event_type = '{_G2}' THEN rk ELSE 0 END)
                        AS BIGINT) AS r_2,
                   CAST(SUM(CASE WHEN event_type = '{_G3}' THEN rk ELSE 0 END)
                        AS BIGINT) AS r_3
            FROM r
        )
        SELECT n_total, n_1, n_2, n_3, r_1, r_2, r_3,
               (12.0 / (CAST(n_total AS DOUBLE)
                        * CAST(n_total + 1 AS DOUBLE)))
               * ((CAST(r_1 AS DOUBLE) * CAST(r_1 AS DOUBLE)
                       / CAST(n_1 AS DOUBLE))
                  + (CAST(r_2 AS DOUBLE) * CAST(r_2 AS DOUBLE)
                       / CAST(n_2 AS DOUBLE))
                  + (CAST(r_3 AS DOUBLE) * CAST(r_3 AS DOUBLE)
                       / CAST(n_3 AS DOUBLE)))
               - (3.0 * CAST(n_total + 1 AS DOUBLE)) AS h_stat
        FROM g
    """,
    doc="Kruskal-Wallis H test across the click/purchase/error value "
    "cohorts (Kruskal & Wallis 1952) — the k-sample extension of "
    "agg_mannwhitney_u: one COMBINED ranking of all three cohorts "
    "(the bucketed two-level scan, empty partition key — no global "
    "single-task sort), exact integer rank sums per cohort, and "
    "H = 12/(N(N+1)) * sum R_j^2/n_j - 3(N+1) assembled in ONE "
    "fixed-literal-order double expression (k=3 terms spelled out, "
    "so the addition order is identical cross-engine). Ties break "
    "deterministically by event_id (values are continuous doubles; "
    "the midrank/tie correction is deliberately omitted and shared "
    "by the oracle, same documented convention as Mann-Whitney).",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(_G1, _G2, _G3))
        .select("event_id", "event_type", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="__rank",
    )

    def npart(g):
        return F.count(F.when(F.col("event_type") == g, F.lit(1))).cast("long")

    def rpart(g):
        return (
            F.sum(F.when(F.col("event_type") == g, F.col("__rank")).otherwise(0))
            .cast("long")
        )

    agg = ranked.agg(
        F.count("*").cast("long").alias("n_total"),
        npart(_G1).alias("n_1"),
        npart(_G2).alias("n_2"),
        npart(_G3).alias("n_3"),
        rpart(_G1).alias("r_1"),
        rpart(_G2).alias("r_2"),
        rpart(_G3).alias("r_3"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    term = lambda r, n: d(r) * d(r) / d(n)  # noqa: E731
    h = (
        F.lit(12.0)
        / (d("n_total") * (F.col("n_total") + 1).cast("double"))
    ) * (
        term("r_1", "n_1") + term("r_2", "n_2") + term("r_3", "n_3")
    ) - F.lit(3.0) * (F.col("n_total") + 1).cast("double")
    return agg.select(
        "n_total", "n_1", "n_2", "n_3", "r_1", "r_2", "r_3", h.alias("h_stat")
    )


@register(
    "agg_mann_kendall_trend",
    oracle=f"""
        WITH {_DAILY_SQL},
        pr AS (
            SELECT CASE WHEN b.c > a.c THEN 1
                        WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
            FROM daily a JOIN daily b ON b.d > a.d
        ),
        sagg AS (
            SELECT CAST(SUM(sgn) AS BIGINT) AS s_stat FROM pr
        ),
        nagg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        ties AS (
            SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
                       AS tie_var_term,
                   COALESCE(CAST(SUM(t * (t - 1)) AS BIGINT), 0) AS tie_pair2
            FROM (
                SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c
            ) WHERE t > 1
        ),
        m AS (
            SELECT n_days, s_stat, tie_var_term, tie_pair2,
                   n_days * (n_days - 1) * (2 * n_days + 5) - tie_var_term
                       AS var18_num,
                   n_days * (n_days - 1) AS d2
            FROM sagg CROSS JOIN nagg CROSS JOIN ties
        )
        SELECT n_days, s_stat, var18_num,
               CASE WHEN s_stat > 0 THEN
                        (CAST(s_stat AS DOUBLE) - 1.0)
                        / sqrt(CAST(var18_num AS DOUBLE) / 18.0)
                    WHEN s_stat < 0 THEN
                        (CAST(s_stat AS DOUBLE) + 1.0)
                        / sqrt(CAST(var18_num AS DOUBLE) / 18.0)
                    ELSE 0.0 END AS z,
               CAST(s_stat AS DOUBLE)
                   / sqrt((CAST(d2 AS DOUBLE) / 2.0
                           - CAST(tie_pair2 AS DOUBLE) / 2.0)
                          * (CAST(d2 AS DOUBLE) / 2.0)) AS tau_b
        FROM m
    """,
    doc="Mann-Kendall trend test on the daily event-count series "
    "(Mann 1945; Kendall's S over time-ordered pairs) with the tie-"
    "corrected variance and Kendall tau-b — the non-parametric "
    "monotone-trend screen next to agg_theil_sen_trend's slope. The "
    "corpus collapses to the 30-row day relation in one counting "
    "aggregate; S, the tie terms, and the variance NUMERATOR "
    "(var*18, before the only division) are exact integers from the "
    "O(days^2) pair join on that bounded relation; z applies the "
    "standard continuity correction and tau-b divides S by "
    "sqrt((D - T_counts) * D) — time has no ties, counts may. Only "
    "fixed-order double ops + sqrt touch the hashed doubles.",
)
def agg_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _persist(_daily(spark, sf_dir))
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
    )
    sagg = (
        a.join(b, F.col("b.d") > F.col("a.d"))
        .agg(F.sum(sgn).cast("long").alias("s_stat"))
    )
    nagg = daily.agg(F.count("*").cast("long").alias("n_days"))
    ties = (
        daily.groupBy("c")
        .agg(F.count("*").cast("long").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tie_var_term"),
            F.coalesce(F.sum(F.col("t") * (F.col("t") - 1)), F.lit(0))
            .cast("long")
            .alias("tie_pair2"),
        )
    )
    m = (
        sagg.crossJoin(F.broadcast(nagg))
        .crossJoin(F.broadcast(ties))
        .withColumn(
            "var18_num",
            F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
            - F.col("tie_var_term"),
        )
        .withColumn("d2", F.col("n_days") * (F.col("n_days") - 1))
    )
    sd = F.col("s_stat").cast("double")
    denom = F.sqrt(F.col("var18_num").cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s_stat") > 0, (sd - F.lit(1.0)) / denom)
        .when(F.col("s_stat") < 0, (sd + F.lit(1.0)) / denom)
        .otherwise(F.lit(0.0))
    )
    d2d = F.col("d2").cast("double")
    tau_b = sd / F.sqrt(
        (d2d / F.lit(2.0) - F.col("tie_pair2").cast("double") / F.lit(2.0))
        * (d2d / F.lit(2.0))
    )
    return m.select(
        "n_days", "s_stat", "var18_num", z.alias("z"), tau_b.alias("tau_b")
    )


@register(
    "agg_brown_forsythe",
    oracle=f"""
        WITH s AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('{_G1}', '{_G2}', '{_G3}')
        ),
        rk AS (
            SELECT event_type, value,
                   CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS BIGINT) AS r,
                   CAST(COUNT(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM s
        ),
        med AS (
            SELECT event_type, value AS med
            FROM rk WHERE r = (n + 1) // 2
        ),
        z AS (
            SELECT s.event_type, abs(s.value - m.med) AS z
            FROM s JOIN med m ON s.event_type = m.event_type
        ),
        g AS (
            SELECT
                CAST(COUNT(CASE WHEN event_type = '{_G1}' THEN 1 END)
                     AS BIGINT) AS n_1,
                CAST(COUNT(CASE WHEN event_type = '{_G2}' THEN 1 END)
                     AS BIGINT) AS n_2,
                CAST(COUNT(CASE WHEN event_type = '{_G3}' THEN 1 END)
                     AS BIGINT) AS n_3,
                {sql_dsum(f"CASE WHEN event_type = '{_G1}' THEN z ELSE 0.0 END")} AS s_1,
                {sql_dsum(f"CASE WHEN event_type = '{_G2}' THEN z ELSE 0.0 END")} AS s_2,
                {sql_dsum(f"CASE WHEN event_type = '{_G3}' THEN z ELSE 0.0 END")} AS s_3,
                {sql_ssum(f"CASE WHEN event_type = '{_G1}' THEN z * z ELSE 0.0 END")} AS q_1,
                {sql_ssum(f"CASE WHEN event_type = '{_G2}' THEN z * z ELSE 0.0 END")} AS q_2,
                {sql_ssum(f"CASE WHEN event_type = '{_G3}' THEN z * z ELSE 0.0 END")} AS q_3
            FROM z
        ),
        f AS (
            SELECT n_1, n_2, n_3, s_1, s_2, s_3, q_1, q_2, q_3,
                   (s_1 + s_2 + s_3)
                       / CAST(n_1 + n_2 + n_3 AS DOUBLE) AS gm
            FROM g
        )
        SELECT n_1, n_2, n_3,
               (((CAST(n_1 AS DOUBLE)
                  * ((s_1 / CAST(n_1 AS DOUBLE)) - gm)
                  * ((s_1 / CAST(n_1 AS DOUBLE)) - gm))
                 + (CAST(n_2 AS DOUBLE)
                    * ((s_2 / CAST(n_2 AS DOUBLE)) - gm)
                    * ((s_2 / CAST(n_2 AS DOUBLE)) - gm))
                 + (CAST(n_3 AS DOUBLE)
                    * ((s_3 / CAST(n_3 AS DOUBLE)) - gm)
                    * ((s_3 / CAST(n_3 AS DOUBLE)) - gm))) / 2.0)
               / (((q_1 - ((s_1 * s_1) / CAST(n_1 AS DOUBLE)))
                   + (q_2 - ((s_2 * s_2) / CAST(n_2 AS DOUBLE)))
                   + (q_3 - ((s_3 * s_3) / CAST(n_3 AS DOUBLE))))
                  / CAST(n_1 + n_2 + n_3 - 3 AS DOUBLE)) AS f_stat
        FROM f
    """,
    doc="Brown-Forsythe equality-of-variance test across the click/"
    "purchase/error value cohorts (Brown & Forsythe 1974: the Levene "
    "test centered at the MEDIAN — robust to non-normality): one-way "
    "ANOVA F on the absolute deviations z = |x - median_g|. Group "
    "medians are the LOWER median (value at rank (n+1) div 2, ties "
    "by event_id — an actual data value, no interpolation, spelled "
    "identically in both engines); at scale the per-group rank runs "
    "through the bucketed two-level scan (the _ranked_group_median "
    "machinery). Deviation sums go through the DECIMAL detour (dsum) "
    "and their squares through shared-IEEE rounding (ssum); the F "
    "statistic assembles k=3 terms in one fixed-literal-order "
    "expression.",
)
def agg_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(_G1, _G2, _G3))
        .select("event_id", "event_type", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="__r",
    )
    counts = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("__n"))
    med = (
        ranked.join(F.broadcast(counts), "event_type")
        .where(F.col("__r") == F.expr("(__n + 1) div 2"))
        .select("event_type", F.col("value").alias("__med"))
    )
    z = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("__med")).alias("z")
    )

    def npart(g):
        return F.count(F.when(F.col("event_type") == g, F.lit(1))).cast("long")

    def spart(g):
        return dsum(F.when(F.col("event_type") == g, F.col("z")).otherwise(0.0))

    def qpart(g):
        return ssum(
            F.when(F.col("event_type") == g, F.col("z") * F.col("z")).otherwise(0.0)
        )

    gagg = z.agg(
        npart(_G1).alias("n_1"),
        npart(_G2).alias("n_2"),
        npart(_G3).alias("n_3"),
        spart(_G1).alias("s_1"),
        spart(_G2).alias("s_2"),
        spart(_G3).alias("s_3"),
        qpart(_G1).alias("q_1"),
        qpart(_G2).alias("q_2"),
        qpart(_G3).alias("q_3"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    n_tot = (F.col("n_1") + F.col("n_2") + F.col("n_3")).cast("double")
    grand = (F.col("s_1") + F.col("s_2") + F.col("s_3")) / n_tot

    def ssb_term(n, s):
        dev = (F.col(s) / dd(n)) - grand
        return dd(n) * dev * dev

    def ssw_term(n, s, q):
        return F.col(q) - ((F.col(s) * F.col(s)) / dd(n))

    ssb = ssb_term("n_1", "s_1") + ssb_term("n_2", "s_2") + ssb_term("n_3", "s_3")
    ssw = (
        ssw_term("n_1", "s_1", "q_1")
        + ssw_term("n_2", "s_2", "q_2")
        + ssw_term("n_3", "s_3", "q_3")
    )
    n_tot_m3 = (F.col("n_1") + F.col("n_2") + F.col("n_3") - 3).cast("double")
    f_stat = (ssb / F.lit(2.0)) / (ssw / n_tot_m3)
    return gagg.select("n_1", "n_2", "n_3", f_stat.alias("f_stat"))


@register(
    "agg_wilcoxon_signed_rank",
    oracle=f"""
        WITH {_DAILY_SQL.replace("CAST(COUNT(*) AS BIGINT) AS c",
            f"CAST(COUNT(CASE WHEN event_type = '{_G1}' THEN 1 END) AS BIGINT) AS c1, "
            f"CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS c2")},
        diffs AS (
            SELECT d, c1 - c2 AS diff, abs(c1 - c2) AS ad
            FROM daily WHERE c1 <> c2
        ),
        dom AS (
            SELECT ad, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM diffs GROUP BY ad
        ),
        cum AS (
            SELECT ad, cnt,
                   CAST(COALESCE(SUM(cnt) OVER (ORDER BY ad
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS below
            FROM dom
        ),
        scored AS (
            SELECT f.d, f.diff, 2 * c.below + c.cnt + 1 AS mid2
            FROM diffs f JOIN cum c ON f.ad = c.ad
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_nonzero,
                   CAST(SUM(CASE WHEN diff > 0 THEN mid2 ELSE 0 END)
                        AS BIGINT) AS w2_plus,
                   CAST(SUM(CASE WHEN diff < 0 THEN mid2 ELSE 0 END)
                        AS BIGINT) AS w2_minus
            FROM scored
        ),
        tie AS (
            SELECT COALESCE(CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT), 0)
                       AS tie_cubed
            FROM dom WHERE cnt > 1
        )
        SELECT n_nonzero, w2_plus, w2_minus, tie_cubed,
               (CAST(w2_plus AS DOUBLE)
                - (CAST(n_nonzero AS DOUBLE)
                   * CAST(n_nonzero + 1 AS DOUBLE)) / 2.0)
               / sqrt((CAST(n_nonzero AS DOUBLE)
                       * CAST(n_nonzero + 1 AS DOUBLE)
                       * CAST(2 * n_nonzero + 1 AS DOUBLE)) / 6.0
                      - CAST(tie_cubed AS DOUBLE) / 12.0) AS z
        FROM agg CROSS JOIN tie
    """,
    doc="Wilcoxon signed-rank test pairing each day's click count "
    "against its view count (Wilcoxon 1945) — the paired counterpart "
    "of agg_mannwhitney_u for 'did channel A systematically beat "
    "channel B day by day'. The corpus reduces to the 30-row day "
    "relation with one conditional counting aggregate; zero "
    "differences drop (standard practice); |diff| ranks use exact "
    "integer DOUBLED midranks (2*below + cnt + 1 over the distinct-"
    "|diff| domain — the integer-midrank house device, so W+ and W- "
    "are exact integers in doubled units, mean n(n+1)/2 and variance "
    "n(n+1)(2n+1)/6 - ties/12 scale accordingly); z assembles from "
    "those integers with fixed-order double ops + sqrt.",
)
def agg_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _persist(
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        ).agg(
            F.count(F.when(F.col("event_type") == _G1, F.lit(1)))
            .cast("long")
            .alias("c1"),
            F.count(F.when(F.col("event_type") == "view", F.lit(1)))
            .cast("long")
            .alias("c2"),
        )
    )
    diffs = _persist(
        daily.where(F.col("c1") != F.col("c2")).select(
            "d",
            (F.col("c1") - F.col("c2")).alias("diff"),
            F.abs(F.col("c1") - F.col("c2")).alias("ad"),
        )
    )
    dom = diffs.groupBy("ad").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    cum = dom.withColumn(
        "below", F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long")
    )
    scored = diffs.join(cum, "ad").select(
        "d", "diff", (2 * F.col("below") + F.col("cnt") + 1).alias("mid2")
    )
    agg = scored.agg(
        F.count("*").cast("long").alias("n_nonzero"),
        F.sum(F.when(F.col("diff") > 0, F.col("mid2")).otherwise(0))
        .cast("long")
        .alias("w2_plus"),
        F.sum(F.when(F.col("diff") < 0, F.col("mid2")).otherwise(0))
        .cast("long")
        .alias("w2_minus"),
    )
    tie = (
        dom.where(F.col("cnt") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_cubed")
        )
    )
    m = agg.crossJoin(F.broadcast(tie))
    nd = F.col("n_nonzero").cast("double")
    z = (
        F.col("w2_plus").cast("double")
        - (nd * (F.col("n_nonzero") + 1).cast("double")) / F.lit(2.0)
    ) / F.sqrt(
        (nd * (F.col("n_nonzero") + 1).cast("double")
         * (2 * F.col("n_nonzero") + 1).cast("double")) / F.lit(6.0)
        - F.col("tie_cubed").cast("double") / F.lit(12.0)
    )
    return m.select("n_nonzero", "w2_plus", "w2_minus", "tie_cubed", z.alias("z"))


@register(
    "events_pettitt_changepoint",
    oracle=f"""
        WITH {_DAILY_SQL},
        pr AS (
            SELECT a.d AS i, b.d AS j,
                   CASE WHEN b.c > a.c THEN 1
                        WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
            FROM daily a JOIN daily b ON b.d > a.d
        ),
        grid AS (
            SELECT d AS t FROM daily
            WHERE d < (SELECT MAX(d) FROM daily)
        ),
        u AS (
            SELECT g.t,
                   CAST(COALESCE(SUM(CASE WHEN p.i <= g.t AND p.j > g.t
                                          THEN p.sgn END), 0) AS BIGINT) AS u_t
            FROM grid g LEFT JOIN pr p ON p.i <= g.t AND p.j > g.t
            GROUP BY g.t
        ),
        best AS (
            SELECT t, u_t, abs(u_t) AS k
            FROM u
            ORDER BY abs(u_t) DESC, t ASC
            LIMIT 1
        )
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
               t AS t_star, u_t AS u_at_tstar, k AS k_stat
        FROM best
    """,
    doc="Pettitt change-point test on the daily event-count series "
    "(Pettitt 1979): U_t = sum over pairs (i <= t < j) of "
    "sign(c_j - c_i) — the rank-based single-change-point locator "
    "(a Mann-Whitney statistic at every candidate split); the test "
    "statistic K = max|U_t| and its argmax day t* (ties to the "
    "earliest day, both engines). The corpus reduces to the bounded "
    "day relation in one counting aggregate; the O(days^2) pair "
    "relation and the O(days) split grid do all remaining work — "
    "exact integers end to end, no approximation p-value (exp is "
    "libm, excluded from hashed outputs by house rule; K and n are "
    "sufficient for the caller to look up significance).",
)
def events_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _persist(_daily(spark, sf_dir))
    a, b = daily.alias("a"), daily.alias("b")
    pr = a.join(b, F.col("b.d") > F.col("a.d")).select(
        F.col("a.d").alias("i"),
        F.col("b.d").alias("j"),
        F.when(F.col("b.c") > F.col("a.c"), 1)
        .when(F.col("b.c") < F.col("a.c"), -1)
        .otherwise(0)
        .alias("sgn"),
    )
    mx = daily.agg(F.max("d").alias("__mx"))
    grid = daily.crossJoin(F.broadcast(mx)).where(F.col("d") < F.col("__mx")).select(
        F.col("d").alias("t")
    )
    u = (
        grid.join(pr, (F.col("i") <= F.col("t")) & (F.col("j") > F.col("t")), "left")
        .groupBy("t")
        .agg(F.coalesce(F.sum("sgn"), F.lit(0)).cast("long").alias("u_t"))
    )
    wbest = Window.orderBy(F.desc(F.abs(F.col("u_t"))), F.asc("t"))
    best = (
        u.withColumn("__rk", F.row_number().over(wbest))
        .where(F.col("__rk") == 1)
        .select("t", "u_t", F.abs(F.col("u_t")).alias("k_stat"))
    )
    n = daily.agg(F.count("*").cast("long").alias("n_days"))
    return best.crossJoin(F.broadcast(n)).select(
        "n_days",
        F.col("t").alias("t_star"),
        F.col("u_t").alias("u_at_tstar"),
        "k_stat",
    )


@register(
    "agg_hodges_lehmann_shift",
    oracle=f"""
        WITH base AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(CASE WHEN event_type = '{_G1}' THEN 1 END)
                        AS BIGINT) AS c1,
                   CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                        AS BIGINT) AS c2
            FROM events GROUP BY 1
        ),
        pw AS (
            SELECT a.c1 - b.c2 AS diff, a.d AS i, b.d AS j
            FROM base a JOIN base b ON TRUE
        ),
        r AS (
            SELECT diff,
                   CAST(row_number() OVER (ORDER BY diff, i, j)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM pw
        )
        SELECT m AS n_pairs, diff AS hl_shift
        FROM r WHERE rk = (m + 1) // 2
    """,
    doc="Hodges-Lehmann estimator of the click-vs-view daily-count "
    "shift (Hodges & Lehmann 1963): the median of ALL pairwise "
    "differences c1_i - c2_j — the robust location-shift companion "
    "to the Wilcoxon/Mann-Whitney tests (it estimates WHAT the rank "
    "tests detect). The day relation is bounded (30 rows), so the "
    "Walsh-difference relation is days^2-sized (900 integers); the "
    "median is the LOWER median at rank (m+1) div 2 under the "
    "deterministic (diff, i, j) order — exact integer output, no "
    "interpolation, identical in both engines. At larger day grids "
    "the rank goes through the bucketed two-level scan.",
)
def agg_hodges_lehmann_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = _persist(
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        ).agg(
            F.count(F.when(F.col("event_type") == _G1, F.lit(1)))
            .cast("long")
            .alias("c1"),
            F.count(F.when(F.col("event_type") == "view", F.lit(1)))
            .cast("long")
            .alias("c2"),
        )
    )
    a, b = base.alias("a"), base.alias("b")
    pw = a.crossJoin(b).select(
        (F.col("a.c1") - F.col("b.c2")).alias("diff"),
        F.col("a.d").alias("i"),
        F.col("b.d").alias("j"),
    )
    w = Window.orderBy("diff", "i", "j")
    r = pw.withColumn("rk", F.row_number().over(w).cast("long")).withColumn(
        "m", F.count("*").over(Window.partitionBy()).cast("long")
    )
    return r.where(F.col("rk") == F.expr("(m + 1) div 2")).select(
        F.col("m").alias("n_pairs"), F.col("diff").alias("hl_shift")
    )
