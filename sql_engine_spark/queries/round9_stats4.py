"""Round-9 causal/experimentation statistics batch: Granger lag-1
causality on the daily pair series, the Siegel-Tukey rank-dispersion
test, and the Qini uplift-by-decile curve.

House discipline: base sums are EXACT BIGINTs (counts and count
products) wherever the math allows, the few corpus-sized double folds
cross engines via ssum, every regression coefficient is a fixed-order
rational expression of those sums, ranks come from the bucketed
two-level scan (no global single-task sort), and order statistics are
type-1. No libm transcendentals; sqrt only.

The reference engine has min/max/sum/count/avg only
(/root/reference/src/executor/aggregation.rs:168-427); all three are
engine-beyond-reference coverage per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# events_granger_lag1 — does yesterday's click rate predict purchases?
# ---------------------------------------------------------------------------

_SQL_GRANGER = """
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS y,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS x
            FROM events GROUP BY 1
        ),
        lagged AS (
            SELECT day, y,
                   lag(y) OVER (ORDER BY day) AS y1,
                   lag(x) OVER (ORDER BY day) AS x1
            FROM daily
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(y1) AS BIGINT) AS sy1,
                   CAST(SUM(x1) AS BIGINT) AS sx1,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(y * y1) AS BIGINT) AS syy1,
                   CAST(SUM(y * x1) AS BIGINT) AS syx1,
                   CAST(SUM(y1 * y1) AS BIGINT) AS sy1y1,
                   CAST(SUM(x1 * x1) AS BIGINT) AS sx1x1,
                   CAST(SUM(y1 * x1) AS BIGINT) AS sy1x1
            FROM lagged WHERE y1 IS NOT NULL
        ),
        c AS (
            SELECT n,
                   CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS syy_c,
                   CAST(sy1y1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
                       * CAST(sy1 AS DOUBLE) / CAST(n AS DOUBLE) AS s11,
                   CAST(sx1x1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
                       * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS s22,
                   CAST(sy1x1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
                       * CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE) AS s12,
                   CAST(syy1 AS DOUBLE) - CAST(sy1 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS s1y,
                   CAST(syx1 AS DOUBLE) - CAST(sx1 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS s2y
            FROM s
        ),
        fit AS (
            SELECT n, syy_c, s1y, s2y,
                   syy_c - (s1y / s11) * s1y AS sse_r,
                   (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) AS b1,
                   (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) AS b2
            FROM c
        )
        SELECT n AS n_used, b1 AS b_lag_y, b2 AS b_lag_x, sse_r,
               syy_c - b1 * s1y - b2 * s2y AS sse_f,
               (sse_r - (syy_c - b1 * s1y - b2 * s2y))
                   / ((syy_c - b1 * s1y - b2 * s2y)
                      / CAST(n - 3 AS DOUBLE)) AS f_stat
        FROM fit
"""


@register(
    "events_granger_lag1",
    oracle=f"WITH {_SQL_GRANGER}",
    doc="Granger lag-1 causality probe (Granger 1969): does yesterday's "
    "click count improve the prediction of today's purchase count over "
    "purchases' own lag? Restricted OLS y_t ~ y_{t-1} vs full "
    "y_t ~ y_{t-1} + x_{t-1}, both solved in CLOSED FORM from exact "
    "BIGINT sums (counts and count-products — no double accumulates "
    "anything corpus-sized): centered normal equations via Cramer's "
    "rule, SSE from the fitting identity SSE = Syy_c - b'S_y, and the "
    "nested-model F = (SSE_r - SSE_f) / (SSE_f / (n-3)). The corpus "
    "work is ONE daily two-column aggregate; lags and sums live on the "
    "calendar-bounded day grid. The standard caveat applies and is the "
    "point of the operator name: this is predictive (Granger) "
    "causality, not interventional.",
)
def events_granger_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("y"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("x"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        F.lag("y").over(w).alias("y1"),
        F.lag("x").over(w).alias("x1"),
    ).where(F.col("y1").isNotNull())
    s = lagged.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("y1").cast("long").alias("sy1"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("y") * F.col("y1")).cast("long").alias("syy1"),
        F.sum(F.col("y") * F.col("x1")).cast("long").alias("syx1"),
        F.sum(F.col("y1") * F.col("y1")).cast("long").alias("sy1y1"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("sx1x1"),
        F.sum(F.col("y1") * F.col("x1")).cast("long").alias("sy1x1"),
    )
    nd = F.col("n").cast("double")

    def ctr(sab: str, sa: str, sb: str) -> F.Column:
        return F.col(sab).cast("double") - F.col(sa).cast("double") * F.col(
            sb
        ).cast("double") / nd

    c = s.select(
        "n",
        ctr("syy", "sy", "sy").alias("syy_c"),
        ctr("sy1y1", "sy1", "sy1").alias("s11"),
        ctr("sx1x1", "sx1", "sx1").alias("s22"),
        ctr("sy1x1", "sy1", "sx1").alias("s12"),
        ctr("syy1", "sy1", "sy").alias("s1y"),
        ctr("syx1", "sx1", "sy").alias("s2y"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    fit = c.select(
        "n",
        "syy_c",
        "s1y",
        "s2y",
        (F.col("syy_c") - (F.col("s1y") / F.col("s11")) * F.col("s1y")).alias(
            "sse_r"
        ),
        ((F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det).alias(
            "b1"
        ),
        ((F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det).alias(
            "b2"
        ),
    )
    sse_f = F.col("syy_c") - F.col("b1") * F.col("s1y") - F.col("b2") * F.col(
        "s2y"
    )
    return fit.select(
        F.col("n").alias("n_used"),
        F.col("b1").alias("b_lag_y"),
        F.col("b2").alias("b_lag_x"),
        "sse_r",
        sse_f.alias("sse_f"),
        (
            (F.col("sse_r") - sse_f)
            / (sse_f / (F.col("n") - 3).cast("double"))
        ).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# agg_siegel_tukey — rank test for dispersion differences
# ---------------------------------------------------------------------------


@register(
    "agg_siegel_tukey",
    oracle="""
        WITH v AS (
            SELECT event_id, event_type, value,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS p,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM events WHERE event_type IN ('purchase', 'click')
        ),
        st AS (
            SELECT event_type,
                   CASE WHEN p <= n - p + 1
                        THEN CASE WHEN p % 2 = 1 THEN 2 * p - 1
                                  ELSE 2 * p END
                        ELSE CASE WHEN (n - p + 1) % 2 = 1
                                  THEN 2 * (n - p + 1)
                                  ELSE 2 * (n - p + 1) - 1 END
                   END AS st_rank
            FROM v
            WHERE NOT (n % 2 = 1 AND p = (n + 1) // 2)
        ),
        g AS (
            SELECT CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN st_rank ELSE 0 END) AS BIGINT) AS w_a,
                   CAST(SUM(CASE WHEN event_type = 'purchase'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN event_type = 'click'
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM st
        )
        SELECT n_a, n_b, w_a,
               CAST(w_a - n_a * (n_a + 1) / 2 AS BIGINT) AS u_a,
               (CAST(w_a - n_a * (n_a + 1) / 2 AS DOUBLE)
                - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0)
               / sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                      * CAST(n_a + n_b + 1 AS DOUBLE) / 12.0) AS z_stat
        FROM g
    """,
    doc="Siegel-Tukey test for dispersion differences (Siegel & Tukey, "
    "JASA 1960): pool purchase vs click values, sort, and assign ranks "
    "ALTERNATING FROM THE EXTREMES (1 to the min, 2-3 to the two maxes, "
    "4-5 to the next two mins, ...) so low ranks mark extreme values; "
    "the Mann-Whitney U on these ranks then tests spread instead of "
    "location. The alternation is a pure integer function of the "
    "position p and depth-from-nearer-end d = min(p, n+1-p): bottom "
    "side 2d-1 if d odd else 2d, top side 2d if d odd else 2d-1; the "
    "odd middle observation is discarded (the textbook convention). "
    "Position comes from the bucketed two-level rank; everything is "
    "exact integers until the final normal-approximation z. "
    "Complements Brown-Forsythe/Levene (moment-based) with a fully "
    "rank-based spread test.",
)
def agg_siegel_tukey(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .select("event_id", "event_type", "value")
    )
    n_rows = count_two_types(sf_dir)
    ranked = bucketed_value_rank(
        ev,
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=n_rows,
        out_col="p",
    )
    n = n_rows
    depth = F.least(F.col("p"), F.lit(n) - F.col("p") + 1)
    bottom = F.col("p") <= F.lit(n) - F.col("p") + 1
    st_rank = F.when(
        bottom,
        F.when(depth % 2 == 1, 2 * depth - 1).otherwise(2 * depth),
    ).otherwise(
        F.when(depth % 2 == 1, 2 * depth).otherwise(2 * depth - 1)
    )
    st = ranked.where(
        ~((F.lit(n % 2) == 1) & (F.col("p") == F.lit((n + 1) // 2)))
    ).select("event_type", st_rank.cast("long").alias("st_rank"))
    g = st.agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("st_rank")).otherwise(
                0
            )
        )
        .cast("long")
        .alias("w_a"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
    )
    u_a = F.col("w_a") - F.col("n_a") * (F.col("n_a") + 1) / 2
    return g.select(
        "n_a",
        "n_b",
        "w_a",
        u_a.cast("long").alias("u_a"),
        (
            (
                u_a.cast("double")
                - F.col("n_a").cast("double") * F.col("n_b").cast("double") / F.lit(2.0)
            )
            / F.sqrt(
                F.col("n_a").cast("double")
                * F.col("n_b").cast("double")
                * (F.col("n_a") + F.col("n_b") + 1).cast("double")
                / F.lit(12.0)
            )
        ).alias("z_stat"),
    )


def count_two_types(sf_dir: str) -> int:
    """Exact row count of the purchase+click slice, cached per
    (process, dataset) — the derived-path count discipline
    (io.count_cached)."""
    import duckdb

    from sql_engine_spark.io import count_cached

    def compute() -> int:
        con = duckdb.connect()
        try:
            return con.execute(
                "SELECT COUNT(*) FROM "
                f"'{sf_dir}/events.parquet' "
                "WHERE event_type IN ('purchase', 'click')"
            ).fetchone()[0]
        finally:
            con.close()

    return count_cached(sf_dir, "events", "event_type in purchase,click", compute)


# ---------------------------------------------------------------------------
# events_qini_uplift_deciles — uplift curve for the A/B cohorts
# ---------------------------------------------------------------------------

_QINI_BINS = 10
_QINI_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"

_SQL_QINI = f"""
        u AS (
            SELECT user_id, CAST(user_id % 2 AS BIGINT) AS treated,
                   CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                                > SUM(CASE WHEN event_type = 'view'
                                      THEN 1 ELSE 0 END)
                             THEN 1 ELSE 0 END AS BIGINT) AS converted,
                   CAST(SUM(CASE WHEN ts < {_QINI_SPLIT} THEN 1 ELSE 0 END)
                        AS BIGINT) AS score
            FROM events GROUP BY user_id
        ),
        r AS (
            SELECT treated, converted,
                   ((CAST(row_number() OVER (ORDER BY score DESC, user_id)
                        AS BIGINT) - 1) * {_QINI_BINS})
                       // (SELECT COUNT(*) FROM u) + 1 AS decile
            FROM u
        ),
        d AS (
            SELECT decile,
                   CAST(SUM(treated) AS BIGINT) AS n_t,
                   CAST(SUM(CASE WHEN treated = 1 THEN converted ELSE 0 END)
                        AS BIGINT) AS conv_t,
                   CAST(SUM(1 - treated) AS BIGINT) AS n_c,
                   CAST(SUM(CASE WHEN treated = 0 THEN converted ELSE 0 END)
                        AS BIGINT) AS conv_c
            FROM r GROUP BY decile
        ),
        c AS (
            SELECT decile, n_t, conv_t, n_c, conv_c,
                   CAST(SUM(conv_t) OVER wd AS BIGINT) AS cum_conv_t,
                   CAST(SUM(conv_c) OVER wd AS BIGINT) AS cum_conv_c,
                   CAST(SUM(n_t) OVER wd AS BIGINT) AS cum_n_t,
                   CAST(SUM(n_c) OVER wd AS BIGINT) AS cum_n_c
            FROM d
            WINDOW wd AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
        )
        SELECT decile, n_t, conv_t, n_c, conv_c,
               CASE WHEN n_t > 0 AND n_c > 0
                    THEN CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                         - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE)
               END AS uplift,
               CASE WHEN cum_n_c > 0
                    THEN CAST(cum_conv_t AS DOUBLE)
                         - CAST(cum_conv_c AS DOUBLE)
                           * (CAST(cum_n_t AS DOUBLE)
                              / CAST(cum_n_c AS DOUBLE))
               END AS qini
        FROM c
"""


@register(
    "events_qini_uplift_deciles",
    oracle=f"WITH {_SQL_QINI}",
    doc="Qini uplift curve by targeting decile (Radcliffe 2007, 'Using "
    "control groups to target on predicted lift'): users decile-ranked "
    "by a targeting score (pre-period activity — deterministic "
    "(score DESC, user_id) order through the bucketed two-level rank), "
    "per-decile incremental conversion uplift (treated rate minus "
    "control rate, cohorts as in events_abtest_ztest), and the "
    "cumulative Qini coefficient Q(d) = cumconv_t - cumconv_c * "
    "cumN_t/cumN_c — the uplift-model evaluation standard. All counts "
    "exact BIGINTs; the cumulative window runs on the 10-row decile "
    "grid. At 100 TB: one user rollup, one bounded rank, one 10-row "
    "window.",
)
def events_qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("long")
        .alias("converted"),
        F.sum(F.when(F.col("ts") < split, 1).otherwise(0))
        .cast("long")
        .alias("score"),
    ).select(
        "user_id",
        (F.col("user_id") % 2).cast("long").alias("treated"),
        "converted",
        "score",
    )
    n_users = count_distinct_users(sf_dir)
    ranked = bucketed_value_rank(
        u.withColumn("neg_score", -F.col("score")),
        part_cols=[],
        value_col="neg_score",
        tie_col="user_id",
        n_rows=n_users,
        out_col="rk",
    )
    r = ranked.select(
        "treated",
        "converted",
        (F.floor((F.col("rk") - 1) * _QINI_BINS / n_users) + 1)
        .cast("long")
        .alias("decile"),
    )
    d = r.groupBy("decile").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_c"),
    )
    wd = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    c = d.select(
        "decile",
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.sum("conv_t").over(wd).cast("long").alias("cum_conv_t"),
        F.sum("conv_c").over(wd).cast("long").alias("cum_conv_c"),
        F.sum("n_t").over(wd).cast("long").alias("cum_n_t"),
        F.sum("n_c").over(wd).cast("long").alias("cum_n_c"),
    )
    return c.select(
        "decile",
        "n_t",
        "conv_t",
        "n_c",
        "conv_c",
        F.when(
            (F.col("n_t") > 0) & (F.col("n_c") > 0),
            F.col("conv_t").cast("double") / F.col("n_t").cast("double")
            - F.col("conv_c").cast("double") / F.col("n_c").cast("double"),
        ).alias("uplift"),
        F.when(
            F.col("cum_n_c") > 0,
            F.col("cum_conv_t").cast("double")
            - F.col("cum_conv_c").cast("double")
            * (
                F.col("cum_n_t").cast("double")
                / F.col("cum_n_c").cast("double")
            ),
        ).alias("qini"),
    )


def count_distinct_users(sf_dir: str) -> int:
    """Exact distinct-user count, cached per (process, dataset)."""
    import duckdb

    from sql_engine_spark.io import count_cached

    def compute() -> int:
        con = duckdb.connect()
        try:
            return con.execute(
                "SELECT COUNT(DISTINCT user_id) FROM "
                f"'{sf_dir}/events.parquet'"
            ).fetchone()[0]
        finally:
            con.close()

    return count_cached(sf_dir, "events", "distinct user_id", compute)
