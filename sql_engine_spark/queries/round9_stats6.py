"""Round-9 final stats batch: Tukey median polish on the day x hour
grid, an inverse-error forecast-ensemble backtest, and the DiD
parallel-trends placebo.

House discipline: the median polish is INTEGER-EXACT end to end
(medians of integer counts are integers; two full unrolled sweeps,
identical CTE algebra in both engines), the ensemble's few double
divisions are fixed-order with a div-by-zero-proof 1/(1+MAE) weight,
and the placebo reuses the DiD estimator's exact midpoint-split
convention on the pre-period alone.

The reference engine has min/max/sum/count/avg only
(/root/reference/src/executor/aggregation.rs:168-427).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# agg_median_polish — Tukey's two-way decomposition of day x hour load
# ---------------------------------------------------------------------------

_SQL_GRID = """grid AS (
            SELECT d.day, h.hour,
                   COALESCE(c.cnt, CAST(0 AS BIGINT)) AS x
            FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
                  FROM events) d
            CROSS JOIN (SELECT unnest(range(0, 24)) AS hour) h
            LEFT JOIN (
                SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                       CAST(extract(hour FROM ts) AS BIGINT) AS hour,
                       CAST(COUNT(*) AS BIGINT) AS cnt
                FROM events GROUP BY 1, 2
            ) c ON c.day = d.day AND c.hour = h.hour
        )"""


def _sql_row_med(src: str, out: str) -> str:
    """Lower median of `v` per day from relation `src(day, hour, v)`."""
    return f"""{out} AS (
            SELECT day, v AS med FROM (
                SELECT day, v,
                       row_number() OVER (PARTITION BY day
                           ORDER BY v, hour) AS rn,
                       COUNT(*) OVER (PARTITION BY day) AS n
                FROM {src}
            ) WHERE rn = (n + 1) // 2
        )"""


def _sql_col_med(src: str, out: str) -> str:
    return f"""{out} AS (
            SELECT hour, v AS med FROM (
                SELECT hour, v,
                       row_number() OVER (PARTITION BY hour
                           ORDER BY v, day) AS rn,
                       COUNT(*) OVER (PARTITION BY hour) AS n
                FROM {src}
            ) WHERE rn = (n + 1) // 2
        )"""


_SQL_POLISH = f"""
        {_SQL_GRID},
        r0 AS (SELECT day, hour, x AS v FROM grid),
        {_sql_row_med('r0', 'a1')},
        r1 AS (
            SELECT r0.day, r0.hour, r0.v - a1.med AS v
            FROM r0 JOIN a1 USING (day)
        ),
        {_sql_col_med('r1', 'b1')},
        r2 AS (
            SELECT r1.day, r1.hour, r1.v - b1.med AS v
            FROM r1 JOIN b1 USING (hour)
        ),
        {_sql_row_med('r2', 'a2')},
        r3 AS (
            SELECT r2.day, r2.hour, r2.v - a2.med AS v
            FROM r2 JOIN a2 USING (day)
        ),
        {_sql_col_med('r3', 'b2')},
        r4 AS (
            SELECT r3.day, r3.hour, r3.v - b2.med AS v
            FROM r3 JOIN b2 USING (hour)
        )
        SELECT g.day, g.hour, g.x,
               CAST(a1.med + a2.med AS BIGINT) AS day_effect,
               CAST(b1.med + b2.med AS BIGINT) AS hour_effect,
               CAST(r4.v AS BIGINT) AS residual
        FROM grid g
        JOIN a1 USING (day) JOIN a2 USING (day)
        JOIN b1 USING (hour) JOIN b2 USING (hour)
        JOIN r4 ON r4.day = g.day AND r4.hour = g.hour
"""


@register(
    "agg_median_polish",
    oracle=f"WITH {_SQL_POLISH}",
    doc="Tukey's median polish (EDA 1977) on the day x hour event-count "
    "grid: two full row/column sweeps of lower-median removal yield "
    "additive day effects, hour effects, and a residual grid whose "
    "large cells are the robust two-way anomalies (a spike that is "
    "neither 'that day was busy' nor 'that hour is always busy'). "
    "INTEGER-EXACT end to end — medians of integer counts are "
    "integers, so all four sweeps and the residuals carry no floating "
    "point at all; the sweeps are UNROLLED identically in both engines "
    "(the recursion-unroll oracle posture). The grid is "
    "calendar-bounded (days x 24), corpus work is one (day, hour) "
    "aggregate. The robust complement to events_hourly_profile's "
    "mean-based profile.",
)
def agg_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    hours = spark.range(0, 24).select(F.col("id").cast("long").alias("hour"))
    counts = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    grid = (
        days.crossJoin(F.broadcast(hours))
        .join(counts, ["day", "hour"], "left")
        .select(
            "day",
            "hour",
            F.coalesce("cnt", F.lit(0).cast("long")).alias("x"),
        )
    )

    # The grid is calendar-bounded (days x 24, <= ~744 cells for the test
    # datasets and still only ~8.8k cells for a year of data), so the four
    # unrolled row/column sweeps would each pay a hash exchange on tiny
    # data if expressed as window+join stages (the r9 plan had 92
    # exchanges). Instead: ONE distributed aggregate builds the grid, then
    # a single applyInPandas group runs every sweep in-memory with exact
    # int64 arithmetic. The corpus-proportional work (the events count)
    # stays distributed; only the bounded grid is funneled to one task.
    def _polish(pdf):  # pragma: no cover - executed on workers
        import numpy as np
        import pandas as pd

        piv = pdf.pivot(index="day", columns="hour", values="x").astype(
            "int64"
        )
        # explicit copy: to_numpy() may return a view of the pivot's block,
        # and the sweeps below mutate resid in place
        resid = np.array(piv.to_numpy(), dtype="int64", copy=True)
        day_eff = np.zeros(resid.shape[0], dtype="int64")
        hour_eff = np.zeros(resid.shape[1], dtype="int64")

        def lomed(a, axis):
            # lower median: element rn == (n + 1) // 2 of the value-sorted
            # run (1-indexed), matching the oracle's row_number selection.
            n = a.shape[axis]
            k = (n + 1) // 2 - 1
            return np.take(np.sort(a, axis=axis), k, axis=axis)

        for _ in range(2):
            rm = lomed(resid, axis=1)
            day_eff += rm
            resid -= rm[:, None]
            cm = lomed(resid, axis=0)
            hour_eff += cm
            resid -= cm[None, :]

        days_idx = list(piv.index)
        hours_idx = [int(h) for h in piv.columns]
        rows = []
        for i, d in enumerate(days_idx):
            for j, h in enumerate(hours_idx):
                rows.append(
                    (
                        d,
                        h,
                        int(piv.iat[i, j]),
                        int(day_eff[i]),
                        int(hour_eff[j]),
                        int(resid[i, j]),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "day",
                "hour",
                "x",
                "day_effect",
                "hour_effect",
                "residual",
            ],
        )

    return (
        grid.groupBy(F.lit(1).alias("_g"))
        .applyInPandas(
            _polish,
            schema=(
                "day date, hour long, x long, day_effect long, "
                "hour_effect long, residual long"
            ),
        )
    )


# ---------------------------------------------------------------------------
# events_forecast_ensemble_backtest — inverse-error model combination
# ---------------------------------------------------------------------------

_FC_TEST_DAYS = 7
_FC_MA_W = 14

_SQL_FC = f"""
        daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ),
        idx AS (
            SELECT day, cnt,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   lag(cnt, 1) OVER (ORDER BY day) AS naive_p,
                   lag(cnt, 7) OVER (ORDER BY day) AS snaive_p,
                   CASE WHEN COUNT(*) OVER wma = {_FC_MA_W}
                        THEN CAST(SUM(cnt) OVER wma AS DOUBLE)
                             / {_FC_MA_W}.0 END AS ma_p
            FROM daily
            WINDOW wma AS (ORDER BY day
                ROWS BETWEEN {_FC_MA_W} PRECEDING AND 1 PRECEDING)
        ),
        test AS (
            SELECT * FROM idx WHERE i > n - {_FC_TEST_DAYS}
        ),
        mae AS (
            SELECT CAST(SUM(abs(cnt - naive_p)) AS DOUBLE)
                       / {_FC_TEST_DAYS}.0 AS mae_naive,
                   CAST(SUM(abs(cnt - snaive_p)) AS DOUBLE)
                       / {_FC_TEST_DAYS}.0 AS mae_snaive,
                   {sql_ssum('abs(CAST(cnt AS DOUBLE) - ma_p)')}
                       / {_FC_TEST_DAYS}.0 AS mae_ma
            FROM test
        ),
        nextf AS (
            SELECT MAX(CASE WHEN i = n THEN CAST(cnt AS DOUBLE) END)
                       AS next_naive,
                   MAX(CASE WHEN i = n - 6 THEN CAST(cnt AS DOUBLE) END)
                       AS next_snaive,
                   CAST(SUM(CASE WHEN i > n - {_FC_MA_W} THEN cnt
                            ELSE 0 END) AS DOUBLE) / {_FC_MA_W}.0
                       AS next_ma
            FROM idx
        ),
        w AS (
            SELECT mae_naive, mae_snaive, mae_ma, next_naive, next_snaive,
                   next_ma,
                   1.0 / (1.0 + mae_naive) AS iv_n,
                   1.0 / (1.0 + mae_snaive) AS iv_s,
                   1.0 / (1.0 + mae_ma) AS iv_m
            FROM mae CROSS JOIN nextf
        )
        SELECT 'naive' AS model, mae_naive AS mae,
               iv_n / (iv_n + iv_s + iv_m) AS weight,
               next_naive AS next_forecast
        FROM w
        UNION ALL
        SELECT 'seasonal_naive', mae_snaive,
               iv_s / (iv_n + iv_s + iv_m), next_snaive
        FROM w
        UNION ALL
        SELECT 'moving_average', mae_ma,
               iv_m / (iv_n + iv_s + iv_m), next_ma
        FROM w
        UNION ALL
        SELECT 'ensemble', CAST(NULL AS DOUBLE),
               CAST(1.0 AS DOUBLE),
               (iv_n / (iv_n + iv_s + iv_m)) * next_naive
               + (iv_s / (iv_n + iv_s + iv_m)) * next_snaive
               + (iv_m / (iv_n + iv_s + iv_m)) * next_ma
        FROM w
"""


@register(
    "events_forecast_ensemble_backtest",
    oracle=f"WITH {_SQL_FC}",
    doc="Inverse-error forecast combination with a holdout backtest "
    "(Bates & Granger 1969's combination insight; the M4 lesson that "
    "simple combinations beat single models): naive, seasonal-naive "
    "(lag 7), and 14-day moving average are each backtested on the "
    f"last {_FC_TEST_DAYS} days (MAE from exact integer errors for "
    "the lag models; the MA errors fold through ssum), weighted by "
    "1/(1 + MAE) (div-by-zero-proof, monotone in skill), and combined "
    "into the next-day ensemble forecast. One daily aggregate + "
    "calendar-bounded windows; the weight arithmetic is spelled "
    "identically in both engines, fixed order.",
)
def events_forecast_ensemble_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    wday = Window.orderBy("day")
    wma = Window.orderBy("day").rowsBetween(-_FC_MA_W, -1)
    idx = daily.select(
        "day",
        "cnt",
        F.row_number().over(wday).cast("long").alias("i"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n"),
        F.lag("cnt", 1).over(wday).alias("naive_p"),
        F.lag("cnt", 7).over(wday).alias("snaive_p"),
        F.when(
            F.count("*").over(wma) == _FC_MA_W,
            F.sum("cnt").over(wma).cast("double") / F.lit(float(_FC_MA_W)),
        ).alias("ma_p"),
    )
    test = idx.where(F.col("i") > F.col("n") - _FC_TEST_DAYS)
    mae = test.agg(
        (
            F.sum(F.abs(F.col("cnt") - F.col("naive_p"))).cast("double")
            / F.lit(float(_FC_TEST_DAYS))
        ).alias("mae_naive"),
        (
            F.sum(F.abs(F.col("cnt") - F.col("snaive_p"))).cast("double")
            / F.lit(float(_FC_TEST_DAYS))
        ).alias("mae_snaive"),
        (
            ssum(F.abs(F.col("cnt").cast("double") - F.col("ma_p")))
            / F.lit(float(_FC_TEST_DAYS))
        ).alias("mae_ma"),
    )
    nextf = idx.agg(
        F.max(
            F.when(F.col("i") == F.col("n"), F.col("cnt").cast("double"))
        ).alias("next_naive"),
        F.max(
            F.when(F.col("i") == F.col("n") - 6, F.col("cnt").cast("double"))
        ).alias("next_snaive"),
        (
            F.sum(
                F.when(
                    F.col("i") > F.col("n") - _FC_MA_W, F.col("cnt")
                ).otherwise(0)
            ).cast("double")
            / F.lit(float(_FC_MA_W))
        ).alias("next_ma"),
    )
    w = mae.crossJoin(F.broadcast(nextf)).select(
        "*",
        (F.lit(1.0) / (F.lit(1.0) + F.col("mae_naive"))).alias("iv_n"),
        (F.lit(1.0) / (F.lit(1.0) + F.col("mae_snaive"))).alias("iv_s"),
        (F.lit(1.0) / (F.lit(1.0) + F.col("mae_ma"))).alias("iv_m"),
    )
    tot = F.col("iv_n") + F.col("iv_s") + F.col("iv_m")
    rows = [
        w.select(
            F.lit("naive").alias("model"),
            F.col("mae_naive").alias("mae"),
            (F.col("iv_n") / tot).alias("weight"),
            F.col("next_naive").alias("next_forecast"),
        ),
        w.select(
            F.lit("seasonal_naive").alias("model"),
            F.col("mae_snaive").alias("mae"),
            (F.col("iv_s") / tot).alias("weight"),
            F.col("next_snaive").alias("next_forecast"),
        ),
        w.select(
            F.lit("moving_average").alias("model"),
            F.col("mae_ma").alias("mae"),
            (F.col("iv_m") / tot).alias("weight"),
            F.col("next_ma").alias("next_forecast"),
        ),
        w.select(
            F.lit("ensemble").alias("model"),
            F.lit(None).cast("double").alias("mae"),
            F.lit(1.0).alias("weight"),
            (
                (F.col("iv_n") / tot) * F.col("next_naive")
                + (F.col("iv_s") / tot) * F.col("next_snaive")
                + (F.col("iv_m") / tot) * F.col("next_ma")
            ).alias("next_forecast"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# events_did_placebo_pretrends — the parallel-trends falsification test
# ---------------------------------------------------------------------------


@register(
    "events_did_placebo_pretrends",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS min_day,
                   date_diff('day', CAST(MIN(ts) AS DATE),
                             CAST(MAX(ts) AS DATE)) AS span
            FROM events
        ),
        pre AS (
            SELECT e.user_id, e.value, CAST(e.ts AS DATE) AS d, b.min_day,
                   date_diff('day', b.min_day, CAST(e.ts AS DATE)) AS off,
                   b.span
            FROM events e CROSS JOIN bounds b
            WHERE 2 * date_diff('day', b.min_day, CAST(e.ts AS DATE))
                  < b.span
        ),
        pbounds AS (
            SELECT CAST(MAX(off) AS BIGINT) AS pspan FROM pre
        ),
        tagged AS (
            SELECT CAST(p.user_id % 2 AS BIGINT) AS treated,
                   CASE WHEN 2 * p.off >= pb.pspan THEN 1 ELSE 0 END
                       AS post,
                   p.value
            FROM pre p CROSS JOIN pbounds pb
        ),
        cells AS (
            SELECT treated, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_ssum('value')} AS s
            FROM tagged GROUP BY treated, post
        ),
        wide AS (
            SELECT
                MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_t1,
                MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t0,
                MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_c1,
                MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c0,
                MAX(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s_t1,
                MAX(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s_t0,
                MAX(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s_c1,
                MAX(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s_c0
            FROM cells
        )
        SELECT n_t1, n_t0, n_c1, n_c0,
               CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
                   - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE)
                   AS delta_treated,
               CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
                   - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)
                   AS delta_control,
               (CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
                - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))
               - (CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
                  - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE))
                   AS placebo_did
        FROM wide
    """,
    doc="Parallel-trends placebo for the DiD estimator (the standard "
    "falsification test, cf. Angrist & Pischke's 'Mostly Harmless "
    "Econometrics' event-study checks): restrict to the PRE-period "
    "half of events_did_estimator's midpoint split, split THAT at its "
    "own midpoint, and run the identical 2 x 2 DiD. Under parallel "
    "trends the placebo estimate should be ~0; a large value means "
    "the arms were already diverging before treatment and the real "
    "DiD is confounded. Identical cell algebra and ssum folds as the "
    "estimator it guards; one pass over the pre-period.",
)
def events_did_placebo_pretrends(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "value")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("min_day"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("span"),
    )
    pre = (
        ev.crossJoin(F.broadcast(bounds))
        .withColumn(
            "off", F.datediff(F.col("ts").cast("date"), F.col("min_day"))
        )
        .where(2 * F.col("off") < F.col("span"))
    )
    pbounds = pre.agg(F.max("off").cast("long").alias("pspan"))
    tagged = pre.crossJoin(F.broadcast(pbounds)).select(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.when(2 * F.col("off") >= F.col("pspan"), 1).otherwise(0).alias(
            "post"
        ),
        "value",
    )
    cells = tagged.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"),
        ssum(F.col("value")).alias("s"),
    )

    def pick(t: int, p: int, col: str):
        return F.max(
            F.when((F.col("treated") == t) & (F.col("post") == p), F.col(col))
        )

    wide = cells.agg(
        pick(1, 1, "n").alias("n_t1"),
        pick(1, 0, "n").alias("n_t0"),
        pick(0, 1, "n").alias("n_c1"),
        pick(0, 0, "n").alias("n_c0"),
        pick(1, 1, "s").alias("s_t1"),
        pick(1, 0, "s").alias("s_t0"),
        pick(0, 1, "s").alias("s_c1"),
        pick(0, 0, "s").alias("s_c0"),
    )
    dt = F.col("s_t1").cast("double") / F.col("n_t1").cast("double") - F.col(
        "s_t0"
    ).cast("double") / F.col("n_t0").cast("double")
    dc = F.col("s_c1").cast("double") / F.col("n_c1").cast("double") - F.col(
        "s_c0"
    ).cast("double") / F.col("n_c0").cast("double")
    return wide.select(
        "n_t1",
        "n_t0",
        "n_c1",
        "n_c0",
        dt.alias("delta_treated"),
        dc.alias("delta_control"),
        (dt - dc).alias("placebo_did"),
    )
