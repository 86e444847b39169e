"""Round-9 late statistics batch: Mood's median test, binned Kendall
tau-b, CUPED variance reduction, moving-average seasonal decomposition
(+ the MAD anomaly flag on its remainder), and the Rousseeuw-Croux Sn
robust scale.

House discipline throughout: order statistics are TYPE-1 (row_number
over a fully deterministic sort — no interpolation, no engine-specific
percentile), corpus-sized double reductions cross engines via
ssum/dsum, small-relation double sums also go through ssum (a 5-row
SUM of doubles is still order-dependent), day-of-week is computed as
datediff-from-epoch % 7 (both engines' native dayofweek disagree on
numbering), and every constant that is not binary-exact is pinned with
CAST(... AS DOUBLE). No libm transcendentals; sqrt only.

The reference engine has min/max/sum/count/avg only
(/root/reference/src/executor/aggregation.rs:168-427); everything here
is engine-beyond-reference coverage per SURVEY.md §2.5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load, table_row_count
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

_SQL_DAILY = """daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        )"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))


# ---------------------------------------------------------------------------
# agg_mood_median_test — Mood's median test across event_type groups
# ---------------------------------------------------------------------------


@register(
    "agg_mood_median_test",
    oracle=f"""
        WITH v AS (
            SELECT event_type, value,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM events
        ),
        med AS (
            SELECT value AS grand_median FROM v WHERE rk = (n + 1) // 2
        ),
        cells AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN value > grand_median
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
                   CAST(SUM(CASE WHEN value > grand_median
                                 THEN 0 ELSE 1 END) AS BIGINT) AS n_below
            FROM v CROSS JOIN med GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(n_above) AS BIGINT) AS m_above,
                   CAST(SUM(n_below) AS BIGINT) AS m_below,
                   CAST(SUM(n_above + n_below) AS BIGINT) AS n
            FROM cells
        ),
        terms AS (
            SELECT event_type, n_above, n_below,
                   CAST(n_above + n_below AS DOUBLE) * CAST(m_above AS DOUBLE)
                       / CAST(n AS DOUBLE) AS e_above,
                   CAST(n_above + n_below AS DOUBLE) * CAST(m_below AS DOUBLE)
                       / CAST(n AS DOUBLE) AS e_below
            FROM cells CROSS JOIN tot
        ),
        chi AS (
            SELECT {sql_ssum(
                "(CAST(n_above AS DOUBLE) - e_above)"
                " * (CAST(n_above AS DOUBLE) - e_above) / e_above"
                " + (CAST(n_below AS DOUBLE) - e_below)"
                " * (CAST(n_below AS DOUBLE) - e_below) / e_below"
            )} AS chi2,
                   CAST(COUNT(*) AS BIGINT) - 1 AS dof
            FROM terms
        )
        SELECT event_type, n_above, n_below, e_above, e_below, chi2, dof
        FROM terms CROSS JOIN chi
    """,
    doc="Mood's median test (Mood 1950; the nonparametric k-sample "
    "location test on COUNTS): classify every events.value as above / "
    "not-above the grand lower median (type-1 order statistic, "
    "deterministic (value, event_id) sort), form the 2 x k contingency "
    "table per event_type, and report Pearson chi-square against the "
    "independence expectation. Complements the rank-based "
    "Kruskal-Wallis already in the kit: Mood's statistic needs only "
    "ONE order statistic plus integer cell counts, so at 100 TB it is "
    "a single-pass classify-and-count after a median (no corpus-wide "
    "ranking shuffle). Expected cells are fixed-order double "
    "arithmetic; the chi-square folds the k per-group terms through "
    "ssum (a k-row double SUM is still order-dependent).",
)
def agg_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    n_rows = table_row_count(sf_dir, "events")
    ranked = bucketed_value_rank(
        ev,
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=n_rows,
        out_col="rk",
    )
    med = ranked.where(F.col("rk") == (n_rows + 1) // 2).select(
        F.col("value").alias("grand_median")
    )
    cells = (
        ev.crossJoin(F.broadcast(med))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value") > F.col("grand_median"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
            F.sum(F.when(F.col("value") > F.col("grand_median"), 0).otherwise(1))
            .cast("long")
            .alias("n_below"),
        )
    )
    tot = cells.agg(
        F.sum("n_above").cast("long").alias("m_above"),
        F.sum("n_below").cast("long").alias("m_below"),
        F.sum(F.col("n_above") + F.col("n_below")).cast("long").alias("n"),
    )
    terms = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_above",
        "n_below",
        (
            (F.col("n_above") + F.col("n_below")).cast("double")
            * F.col("m_above").cast("double")
            / F.col("n").cast("double")
        ).alias("e_above"),
        (
            (F.col("n_above") + F.col("n_below")).cast("double")
            * F.col("m_below").cast("double")
            / F.col("n").cast("double")
        ).alias("e_below"),
    )
    chi = terms.agg(
        ssum(
            (F.col("n_above").cast("double") - F.col("e_above"))
            * (F.col("n_above").cast("double") - F.col("e_above"))
            / F.col("e_above")
            + (F.col("n_below").cast("double") - F.col("e_below"))
            * (F.col("n_below").cast("double") - F.col("e_below"))
            / F.col("e_below")
        ).alias("chi2"),
        (F.count("*") - F.lit(1)).cast("long").alias("dof"),
    )
    return terms.crossJoin(F.broadcast(chi))


# ---------------------------------------------------------------------------
# stats_kendall_tau_binned — tau-b on the decile contingency table
# ---------------------------------------------------------------------------

_TAU_BINS = 10

_SQL_TAU = f"""
        base AS (
            SELECT l_quantity, l_extendedprice,
                   l_orderkey * 8 + l_linenumber AS tie,
                   CAST(COUNT(*) OVER () AS BIGINT) AS nn
            FROM lineitem
        ),
        b AS (
            SELECT ((CAST(row_number() OVER (ORDER BY l_quantity, tie)
                       AS BIGINT) - 1) * {_TAU_BINS}) // nn + 1 AS xb,
                   ((CAST(row_number() OVER (ORDER BY l_extendedprice, tie)
                       AS BIGINT) - 1) * {_TAU_BINS}) // nn + 1 AS yb
            FROM base
        ),
        cells AS (
            SELECT xb, yb, CAST(COUNT(*) AS BIGINT) AS n
            FROM b GROUP BY xb, yb
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN c2.xb > c1.xb AND c2.yb > c1.yb
                                 THEN c1.n * c2.n ELSE 0 END) AS BIGINT)
                       AS concordant,
                   CAST(SUM(CASE WHEN c2.xb > c1.xb AND c2.yb < c1.yb
                                 THEN c1.n * c2.n ELSE 0 END) AS BIGINT)
                       AS discordant
            FROM cells c1 CROSS JOIN cells c2
        ),
        marg AS (
            SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS n,
                   (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) FROM (
                        SELECT CAST(SUM(n) AS BIGINT) AS t
                        FROM cells GROUP BY xb)) AS n1,
                   (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) FROM (
                        SELECT CAST(SUM(n) AS BIGINT) AS t
                        FROM cells GROUP BY yb)) AS n2
        )
        SELECT concordant, discordant, n, n1, n2,
               CAST(concordant - discordant AS DOUBLE)
               / sqrt((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
                       - CAST(n1 AS DOUBLE))
                      * (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
                         - CAST(n2 AS DOUBLE))) AS tau_b
        FROM pairs CROSS JOIN marg
"""


@register(
    "stats_kendall_tau_binned",
    oracle=f"WITH {_SQL_TAU}",
    doc="Kendall tau-b between l_quantity and l_extendedprice on the "
    f"{_TAU_BINS}-decile CONTINGENCY TABLE (Kendall 1945 tie-corrected "
    "tau; Agresti's formulation for ordinal contingency tables): decile "
    "each variable from its exact corpus rank (the bucketed two-level "
    "scan — no global single-task sort; ties broken by the "
    "(orderkey, linenumber) physical key — identical total order in "
    "both engines), then count concordant/discordant PAIRS OF CELLS "
    "weighted by cell-count products. Naive Kendall is an O(n^2) "
    "pairwise scan that no engine survives at 100 TB; the binned "
    f"statistic needs one ranking pass plus a {_TAU_BINS}x{_TAU_BINS} "
    "cell cross join (100 x 100 = bounded regardless of corpus size), "
    "which is the standard production trade: tau on the binned ordinal "
    "scale, exact integers until the one tie-corrected division.",
)
def stats_kendall_tau_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_quantity",
        "l_extendedprice",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("tie"),
    )
    n_rows = table_row_count(sf_dir, "lineitem")
    rx = bucketed_value_rank(
        li,
        part_cols=[],
        value_col="l_quantity",
        tie_col="tie",
        n_rows=n_rows,
        out_col="rkx",
    )
    rxy = bucketed_value_rank(
        rx,
        part_cols=[],
        value_col="l_extendedprice",
        tie_col="tie",
        n_rows=n_rows,
        out_col="rky",
    )
    b = rxy.select(
        (F.floor((F.col("rkx") - 1) * _TAU_BINS / n_rows) + 1)
        .cast("long")
        .alias("xb"),
        (F.floor((F.col("rky") - 1) * _TAU_BINS / n_rows) + 1)
        .cast("long")
        .alias("yb"),
    )
    # Persisted (r12, guide §1.2): cells (<= bins^2 rows) feeds FOUR
    # consumers (the concordance cross join twice, the total, and both
    # marginal tie sums); unpersisted, each re-ran the two bucketed
    # corpus rank passes upstream.
    from sql_engine_spark.operators.dedup import _persist

    cells = _persist(
        b.groupBy("xb", "yb").agg(F.count("*").cast("long").alias("n"))
    )
    c1 = cells.select(
        F.col("xb").alias("x1"), F.col("yb").alias("y1"), F.col("n").alias("m1")
    )
    c2 = cells.select(
        F.col("xb").alias("x2"), F.col("yb").alias("y2"), F.col("n").alias("m2")
    )
    pairs = c1.crossJoin(c2).agg(
        F.sum(
            F.when(
                (F.col("x2") > F.col("x1")) & (F.col("y2") > F.col("y1")),
                F.col("m1") * F.col("m2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("concordant"),
        F.sum(
            F.when(
                (F.col("x2") > F.col("x1")) & (F.col("y2") < F.col("y1")),
                F.col("m1") * F.col("m2"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("discordant"),
    )
    n = cells.agg(F.sum("n").cast("long").alias("n"))
    n1 = (
        cells.groupBy("xb")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("n1")
        )
    )
    n2 = (
        cells.groupBy("yb")
        .agg(F.sum("n").cast("long").alias("t"))
        .agg(
            F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("n2")
        )
    )
    m = (
        pairs.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    half = (
        F.col("n").cast("double")
        * (F.col("n") - 1).cast("double")
        / F.lit(2.0)
    )
    return m.select(
        "concordant",
        "discordant",
        "n",
        "n1",
        "n2",
        (
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.sqrt(
                (half - F.col("n1").cast("double"))
                * (half - F.col("n2").cast("double"))
            )
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# events_cuped_adjustment — CUPED variance reduction for the A/B pair
# ---------------------------------------------------------------------------

_CUPED_SPLIT = "TIMESTAMP '2024-01-16 00:00:00'"

_SQL_CUPED = f"""
        u AS (
            SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
                   {sql_ssum(
                       "CASE WHEN ts < " + _CUPED_SPLIT
                       + " THEN value ELSE 0.0 END")} AS pre,
                   {sql_ssum(
                       "CASE WHEN ts >= " + _CUPED_SPLIT
                       + " THEN value ELSE 0.0 END")} AS post
            FROM events GROUP BY user_id
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_ssum('pre')} AS s_pre,
                   {sql_ssum('post')} AS s_post,
                   {sql_ssum('pre * pre')} AS s_pre2,
                   {sql_ssum('pre * post')} AS s_prepost
            FROM u
        ),
        th AS (
            SELECT n,
                   s_pre / CAST(n AS DOUBLE) AS mean_pre,
                   (s_prepost - s_pre * s_post / CAST(n AS DOUBLE))
                   / (s_pre2 - s_pre * s_pre / CAST(n AS DOUBLE)) AS theta
            FROM mom
        ),
        adj AS (
            SELECT cohort, post,
                   post - theta * (pre - mean_pre) AS y_adj
            FROM u CROSS JOIN th
        ),
        g AS (
            SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_users,
                   {sql_ssum('post')} AS g_post,
                   {sql_ssum('y_adj')} AS g_adj,
                   {sql_ssum('post * post')} AS g_post2,
                   {sql_ssum('y_adj * y_adj')} AS g_adj2
            FROM adj GROUP BY cohort
        )
        SELECT cohort, n_users,
               g_post / CAST(n_users AS DOUBLE) AS mean_post,
               g_adj / CAST(n_users AS DOUBLE) AS mean_adj,
               (g_post2 - g_post * g_post / CAST(n_users AS DOUBLE))
                   / CAST(n_users - 1 AS DOUBLE) AS var_post,
               (g_adj2 - g_adj * g_adj / CAST(n_users AS DOUBLE))
                   / CAST(n_users - 1 AS DOUBLE) AS var_adj,
               1.0 - ((g_adj2 - g_adj * g_adj / CAST(n_users AS DOUBLE))
                      / CAST(n_users - 1 AS DOUBLE))
                   / ((g_post2 - g_post * g_post / CAST(n_users AS DOUBLE))
                      / CAST(n_users - 1 AS DOUBLE)) AS variance_reduction
        FROM g
    """


@register(
    "events_cuped_adjustment",
    oracle=f"WITH {_SQL_CUPED}",
    doc="CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM'13 "
    "— the industry-standard A/B variance-reduction device): split each "
    "user's value stream at Jan 16 into pre/post periods, fit "
    "theta = cov(pre, post) / var(pre) on the POOLED population (the "
    "paper's recommendation — using both arms keeps the adjustment "
    "unbiased under randomization), adjust y_adj = post - theta * "
    "(pre - mean_pre), and report per-cohort means plus the achieved "
    "variance_reduction = 1 - var(y_adj)/var(post). Per-user period "
    "sums, the theta moments, and the per-cohort moments all cross "
    "engines via ssum; every division is fixed-order double "
    "arithmetic. At 100 TB this is two groupBy passes (user rollup, "
    "cohort rollup) and a broadcast scalar theta — no shuffle beyond "
    "the user rollup an experimentation pipeline already pays.",
)
def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    split = F.lit("2024-01-16 00:00:00").cast("timestamp_ntz")
    u = ev.groupBy("user_id").agg(
        ssum(
            F.when(F.col("ts") < split, F.col("value")).otherwise(F.lit(0.0))
        ).alias("pre"),
        ssum(
            F.when(F.col("ts") >= split, F.col("value")).otherwise(F.lit(0.0))
        ).alias("post"),
    ).select(
        (F.col("user_id") % 2).cast("long").alias("cohort"), "pre", "post"
    )
    mom = u.agg(
        F.count("*").cast("long").alias("n"),
        ssum(F.col("pre")).alias("s_pre"),
        ssum(F.col("post")).alias("s_post"),
        ssum(F.col("pre") * F.col("pre")).alias("s_pre2"),
        ssum(F.col("pre") * F.col("post")).alias("s_prepost"),
    )
    th = mom.select(
        "n",
        (F.col("s_pre") / F.col("n").cast("double")).alias("mean_pre"),
        (
            (F.col("s_prepost") - F.col("s_pre") * F.col("s_post") / F.col("n").cast("double"))
            / (F.col("s_pre2") - F.col("s_pre") * F.col("s_pre") / F.col("n").cast("double"))
        ).alias("theta"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "cohort",
        "post",
        (F.col("post") - F.col("theta") * (F.col("pre") - F.col("mean_pre"))).alias(
            "y_adj"
        ),
    )
    g = adj.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_users"),
        ssum(F.col("post")).alias("g_post"),
        ssum(F.col("y_adj")).alias("g_adj"),
        ssum(F.col("post") * F.col("post")).alias("g_post2"),
        ssum(F.col("y_adj") * F.col("y_adj")).alias("g_adj2"),
    )
    nd = F.col("n_users").cast("double")
    var_post = (F.col("g_post2") - F.col("g_post") * F.col("g_post") / nd) / (
        F.col("n_users") - 1
    ).cast("double")
    var_adj = (F.col("g_adj2") - F.col("g_adj") * F.col("g_adj") / nd) / (
        F.col("n_users") - 1
    ).cast("double")
    return g.select(
        "cohort",
        "n_users",
        (F.col("g_post") / nd).alias("mean_post"),
        (F.col("g_adj") / nd).alias("mean_adj"),
        var_post.alias("var_post"),
        var_adj.alias("var_adj"),
        (F.lit(1.0) - var_adj / var_post).alias("variance_reduction"),
    )


# ---------------------------------------------------------------------------
# events_ma_decomposition (+ seasonal anomaly) — classical decomposition
# ---------------------------------------------------------------------------

_SQL_DECOMP = f"""
        {_SQL_DAILY},
        t AS (
            SELECT day, cnt,
                   datediff('day', DATE '1970-01-01', day) % 7 AS dow,
                   CASE WHEN COUNT(*) OVER w = 7
                        THEN CAST(SUM(cnt) OVER w AS DOUBLE) / 7.0
                   END AS trend
            FROM daily
            WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
        ),
        d AS (
            SELECT day, cnt, dow, trend,
                   CAST(cnt AS DOUBLE) - trend AS detrended
            FROM t
        ),
        s AS (
            SELECT dow, {sql_ssum('detrended')}
                        / CAST(COUNT(detrended) AS DOUBLE) AS seasonal
            FROM d GROUP BY dow
        )
        SELECT d.day, d.cnt, d.dow, d.trend, s.seasonal,
               d.detrended - s.seasonal AS remainder
        FROM d JOIN s ON d.dow = s.dow
    """


def decompose_from_daily(daily: DataFrame) -> DataFrame:
    """Classical MA decomposition of a (day, cnt) relation — shared by
    the batch operator and the fleet streaming twin."""
    w = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "cnt",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow"),
        F.when(
            F.count("*").over(w) == 7,
            F.sum("cnt").over(w).cast("double") / F.lit(7.0),
        ).alias("trend"),
    )
    d = t.withColumn("detrended", F.col("cnt").cast("double") - F.col("trend"))
    s = d.groupBy("dow").agg(
        (
            ssum(F.col("detrended"))
            / F.count("detrended").cast("double")
        ).alias("seasonal")
    )
    return d.join(s, "dow").select(
        "day",
        "cnt",
        "dow",
        "trend",
        "seasonal",
        (F.col("detrended") - F.col("seasonal")).alias("remainder"),
    )


@register(
    "events_ma_decomposition",
    oracle=f"WITH {_SQL_DECOMP}",
    doc="Classical moving-average seasonal decomposition of the daily "
    "event-rate series (Persons 1919 via Makridakis' 'classical "
    "decomposition'; the fixed-window ancestor of STL): trend = centered "
    "7-day moving average (NULL at the 3-day edges — full windows only), "
    "seasonal = per-day-of-week mean of the detrended series (ssum fold "
    "— a 4-value double mean is still order-dependent), remainder = "
    "detrended - seasonal. Day-of-week is datediff-from-epoch % 7 "
    "because Spark's dayofweek (1=Sunday) and DuckDB's (0=Sunday) "
    "disagree. Calendar-bounded windows only: the corpus work is ONE "
    "daily-count aggregate, everything after runs on the day grid that "
    "grows with time, not data volume.",
)
def events_ma_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decompose_from_daily(_daily(spark, sf_dir))


@register(
    "events_seasonal_anomaly",
    oracle=f"""
        WITH decomp AS (
            WITH {_SQL_DECOMP}
        ),
        r AS (
            SELECT day, cnt, remainder,
                   CAST(row_number() OVER (ORDER BY remainder, day)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM decomp WHERE remainder IS NOT NULL
        ),
        med AS (SELECT remainder AS med_rem FROM r WHERE rk = (n + 1) // 2),
        a AS (
            SELECT day, cnt, remainder, med_rem,
                   abs(remainder - med_rem) AS absdev,
                   CAST(row_number() OVER (ORDER BY abs(remainder - med_rem),
                                           day) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM r CROSS JOIN med
        ),
        mad AS (
            SELECT absdev * CAST(1.4826 AS DOUBLE) AS mad_scaled
            FROM a WHERE rk = (n + 1) // 2
        )
        SELECT day, cnt, remainder, med_rem, mad_scaled,
               abs(remainder - med_rem) > 3.0 * mad_scaled AS is_anomaly
        FROM a CROSS JOIN mad
    """,
    doc="Seasonally-adjusted anomaly flags: the MAD rule (|remainder - "
    "median| > 3 * 1.4826 * MAD, Hampel's robust z-score) applied to "
    "the REMAINDER of the classical decomposition rather than the raw "
    "series — a day that is merely a normal Monday spike no longer "
    "trips the detector, which is the whole reason production monitors "
    "deseasonalize first (cf. the raw-series events_anomaly_mad "
    "already in the kit). Medians are type-1 order statistics over the "
    "deterministic (value, day) sort; 1.4826 is pinned CAST(AS "
    "DOUBLE). Day-grid-sized relations throughout.",
)
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_anomaly_from_daily(_daily(spark, sf_dir))


def seasonal_anomaly_from_daily(daily: DataFrame) -> DataFrame:
    """MAD anomaly flags on the decomposition remainder — shared by the
    batch operator and the fleet streaming twin."""
    decomp = decompose_from_daily(daily).where(F.col("remainder").isNotNull())
    w = Window.orderBy("remainder", "day")
    r = decomp.select(
        "day",
        "cnt",
        "remainder",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    med = r.where(F.col("rk") == F.expr("(n + 1) DIV 2")).select(
        F.col("remainder").alias("med_rem")
    )
    a0 = r.crossJoin(F.broadcast(med)).select(
        "day",
        "cnt",
        "remainder",
        "med_rem",
        F.abs(F.col("remainder") - F.col("med_rem")).alias("absdev"),
    )
    wa = Window.orderBy("absdev", "day")
    a = a0.select(
        "day",
        "cnt",
        "remainder",
        "med_rem",
        "absdev",
        F.row_number().over(wa).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    mad = a.where(F.col("rk") == F.expr("(n + 1) DIV 2")).select(
        (F.col("absdev") * F.lit(1.4826)).alias("mad_scaled")
    )
    return a.crossJoin(F.broadcast(mad)).select(
        "day",
        "cnt",
        "remainder",
        "med_rem",
        "mad_scaled",
        (
            F.abs(F.col("remainder") - F.col("med_rem"))
            > F.lit(3.0) * F.col("mad_scaled")
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# agg_sn_estimator_daily — Rousseeuw-Croux Sn robust scale
# ---------------------------------------------------------------------------


@register(
    "agg_sn_estimator_daily",
    oracle=f"""
        WITH {_SQL_DAILY},
        p AS (
            SELECT a.day AS di,
                   abs(a.cnt - b.cnt) AS ad
            FROM daily a CROSS JOIN daily b
        ),
        him AS (
            SELECT di, ad,
                   CAST(row_number() OVER (PARTITION BY di ORDER BY ad)
                        AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY di) AS BIGINT) AS n
            FROM p
        ),
        inner_med AS (
            SELECT di, CAST(ad AS BIGINT) AS himed
            FROM him WHERE rk = n // 2 + 1
        ),
        lom AS (
            SELECT di, himed,
                   CAST(row_number() OVER (ORDER BY himed, di) AS BIGINT)
                       AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n
            FROM inner_med
        )
        SELECT n AS n_days, himed AS sn_raw,
               CAST(1.1926 AS DOUBLE) * CAST(himed AS DOUBLE) AS sn
        FROM lom WHERE rk = (n + 1) // 2
    """,
    doc="Rousseeuw-Croux Sn robust scale estimator (JASA 1993) on the "
    "daily event counts: Sn = 1.1926 * lomed_i(himed_j |x_i - x_j|) — "
    "the 58%-breakdown, location-free alternative to MAD (no centering "
    "step, works for asymmetric distributions). The pairwise |diff| "
    "relation is DAY-GRID-SQUARED (30 x 30 here; bounded by calendar, "
    "not data volume — the Hodges-Lehmann Walsh-set posture), "
    "inner/outer medians are exact type-1 order statistics on "
    "INTEGERS, and the only double is the final pinned-constant "
    "multiply.",
)
def agg_sn_estimator_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    a = daily.select(F.col("day").alias("di"), F.col("cnt").alias("ci"))
    b = daily.select(F.col("cnt").alias("cj"))
    p = a.crossJoin(b).select(
        "di", F.abs(F.col("ci") - F.col("cj")).alias("ad")
    )
    wh = Window.partitionBy("di").orderBy("ad")
    him = p.select(
        "di",
        "ad",
        F.row_number().over(wh).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy("di")).cast("long").alias("n"),
    )
    inner_med = him.where(F.col("rk") == F.expr("n DIV 2 + 1")).select(
        "di", F.col("ad").cast("long").alias("himed")
    )
    wl = Window.orderBy("himed", "di")
    lom = inner_med.select(
        "di",
        "himed",
        F.row_number().over(wl).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
    )
    return lom.where(F.col("rk") == F.expr("(n + 1) DIV 2")).select(
        F.col("n").alias("n_days"),
        F.col("himed").alias("sn_raw"),
        (F.lit(1.1926) * F.col("himed").cast("double")).alias("sn"),
    )
