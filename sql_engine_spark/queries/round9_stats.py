"""Round-9 time-series monitors on the daily event-rate series:
Page-Hinkley drift detection, Cutler's RSI, Bollinger bands, and
running-peak drawdown.

All four follow the events_changepoint_cusum discipline: corpus work is
ONE daily count aggregate; every window after runs on the
CALENDAR-bounded day relation (days grow with time, not data volume),
so bare ordered windows are safe. Statistics stay in exact integers as
long as possible — the Page-Hinkley deviation is the scaled-integer
D*cum - k*N device, rolling moments are integer power sums — with one
double division (and sqrt where a spread is reported) at the end;
no libm transcendentals anywhere (house rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
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
# Page-Hinkley drift statistic
# ---------------------------------------------------------------------------


@register(
    "events_page_hinkley",
    oracle=f"""
        WITH {_SQL_DAILY},
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM daily
        ),
        c AS (
            SELECT day, cnt,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rk,
                   CAST(SUM(cnt) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM daily
        ),
        m AS (
            SELECT day, cnt, d,
                   d * cum - rk * n AS m_scaled
            FROM c CROSS JOIN tot
        ),
        p AS (
            SELECT day, cnt, d, m_scaled,
                   m_scaled - MIN(m_scaled) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS ph_scaled
            FROM m
        )
        SELECT day, cnt, ph_scaled,
               CAST(ph_scaled AS DOUBLE) / CAST(d AS DOUBLE) AS ph,
               ph_scaled = MAX(ph_scaled) OVER () AS is_alarm_peak
        FROM p
    """,
    doc="Page-Hinkley upward-drift statistic on the daily event-rate "
    "series (Page 1954; the standard streaming drift detector in the "
    "Gama et al. taxonomy, delta = 0): M_t = cumsum(x - mean), "
    "PH_t = M_t - min_{s<=t} M_s, alarm where PH peaks. Spelled "
    "EXACTLY in the scaled-integer device of events_changepoint_cusum "
    "(D*cum_k - k*N), so the running minimum and the peak test are "
    "integer comparisons with no double drift; one division reports "
    "the unscaled statistic. Distinct from the CUSUM split: PH "
    "measures drift since the historical LOW (one-sided detection "
    "delay), CUSUM's argmax locates the single most likely level "
    "shift. Calendar-bounded windows only.",
)
def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ph_from_daily(_daily(spark, sf_dir))


def ph_from_daily(daily: DataFrame) -> DataFrame:
    """Page-Hinkley algebra over any (day, cnt) relation — shared by the
    batch operator and its streaming matview twin (round9_stream)."""
    tot = daily.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.count("*").cast("long").alias("d"),
    )
    w = Window.orderBy("day")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.select(
        "day",
        "cnt",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("cnt").over(run).cast("long").alias("cum"),
    )
    m = c.crossJoin(F.broadcast(tot)).select(
        "day",
        "cnt",
        "d",
        (F.col("d") * F.col("cum") - F.col("rk") * F.col("n")).alias("m_scaled"),
    )
    p = m.select(
        "day",
        "cnt",
        "d",
        "m_scaled",
        (F.col("m_scaled") - F.min("m_scaled").over(run)).alias("ph_scaled"),
    )
    wall = Window.partitionBy()
    return p.select(
        "day",
        "cnt",
        "ph_scaled",
        (F.col("ph_scaled").cast("double") / F.col("d").cast("double")).alias(
            "ph"
        ),
        (F.col("ph_scaled") == F.max("ph_scaled").over(wall)).alias(
            "is_alarm_peak"
        ),
    )


# ---------------------------------------------------------------------------
# Cutler's RSI
# ---------------------------------------------------------------------------

_RSI_W = 14


@register(
    "events_rsi_cutler",
    oracle=f"""
        WITH {_SQL_DAILY},
        dif AS (
            SELECT day, cnt,
                   cnt - lag(cnt) OVER (ORDER BY day) AS diff
            FROM daily
        ),
        g AS (
            SELECT day, cnt,
                   CAST(SUM(greatest(diff, 0)) OVER (ORDER BY day
                        ROWS {_RSI_W - 1} PRECEDING) AS BIGINT) AS sum_gain,
                   CAST(SUM(greatest(-diff, 0)) OVER (ORDER BY day
                        ROWS {_RSI_W - 1} PRECEDING) AS BIGINT) AS sum_loss,
                   CAST(COUNT(diff) OVER (ORDER BY day
                        ROWS {_RSI_W - 1} PRECEDING) AS BIGINT) AS n_diffs
            FROM dif
        )
        SELECT day, cnt, sum_gain, sum_loss,
               CASE WHEN sum_gain + sum_loss > 0
                    THEN CAST(100.0 AS DOUBLE) * CAST(sum_gain AS DOUBLE)
                         / CAST(sum_gain + sum_loss AS DOUBLE)
                    ELSE CAST(50.0 AS DOUBLE) END AS rsi
        FROM g WHERE n_diffs = {_RSI_W}
    """,
    doc=f"Cutler's RSI (simple-moving-average relative strength index, "
    f"window {_RSI_W}) on the daily event-rate series: day-over-day "
    "gains/losses are integer differences, the rolling gain/loss "
    "totals are exact integer window sums, and RSI = 100 * gain / "
    "(gain + loss) is one rational division (the all-flat window "
    "pins to 50 — documented convention in both engines). Unlike "
    "Wilder's recursive EMA smoothing, Cutler's SMA variant is "
    "ORDER-k window algebra — no recursion, so it scales as a plain "
    "calendar-bounded window and stays bit-exact. Rows report only "
    "once the window holds a full 14 diffs. The overbought/oversold "
    "ingestion-rate monitor next to events_ewma_half.",
)
def events_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    dif = daily.select(
        "day", "cnt", (F.col("cnt") - F.lag("cnt").over(w)).alias("diff")
    )
    roll = w.rowsBetween(-(_RSI_W - 1), Window.currentRow)
    g = dif.select(
        "day",
        "cnt",
        F.sum(F.greatest(F.col("diff"), F.lit(0))).over(roll).cast("long").alias(
            "sum_gain"
        ),
        F.sum(F.greatest(-F.col("diff"), F.lit(0)))
        .over(roll)
        .cast("long")
        .alias("sum_loss"),
        F.count("diff").over(roll).cast("long").alias("n_diffs"),
    )
    tot = (F.col("sum_gain") + F.col("sum_loss")).cast("double")
    return g.where(F.col("n_diffs") == _RSI_W).select(
        "day",
        "cnt",
        "sum_gain",
        "sum_loss",
        F.when(
            F.col("sum_gain") + F.col("sum_loss") > 0,
            F.lit(100.0) * F.col("sum_gain").cast("double") / tot,
        )
        .otherwise(F.lit(50.0))
        .alias("rsi"),
    )


# ---------------------------------------------------------------------------
# Bollinger bands
# ---------------------------------------------------------------------------

_BB_W = 7


@register(
    "events_bollinger_bands",
    oracle=f"""
        WITH {_SQL_DAILY},
        r AS (
            SELECT day, cnt,
                   CAST(SUM(cnt) OVER (ORDER BY day
                        ROWS {_BB_W - 1} PRECEDING) AS BIGINT) AS s1,
                   CAST(SUM(cnt * cnt) OVER (ORDER BY day
                        ROWS {_BB_W - 1} PRECEDING) AS BIGINT) AS s2,
                   CAST(COUNT(*) OVER (ORDER BY day
                        ROWS {_BB_W - 1} PRECEDING) AS BIGINT) AS nw
            FROM daily
        ),
        m AS (
            SELECT day, cnt, s1, s2,
                   CAST(s1 AS DOUBLE) / CAST({_BB_W} AS DOUBLE) AS mean_w,
                   sqrt(greatest(CAST(0.0 AS DOUBLE),
                        (CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                           / CAST({_BB_W} AS DOUBLE))
                        / CAST({_BB_W} AS DOUBLE))) AS sd_w
            FROM r WHERE nw = {_BB_W}
        )
        SELECT day, cnt, mean_w, sd_w,
               mean_w + 2.0 * sd_w AS upper_band,
               mean_w - 2.0 * sd_w AS lower_band,
               CAST(cnt AS DOUBLE) > mean_w + 2.0 * sd_w
                   OR CAST(cnt AS DOUBLE) < mean_w - 2.0 * sd_w AS is_break
        FROM m
    """,
    doc=f"Bollinger bands (window {_BB_W}, +-2 sigma) on the daily "
    "event-rate series: the rolling mean and population sigma come "
    "from EXACT integer window power sums (s1, s2 — counts are "
    "BIGINT, squares stay far inside 2^63), so every double is a "
    "pure function of two exact integers; sqrt is IEEE-exact. "
    "`is_break` flags days outside the band — the volatility-aware "
    "cousin of events_anomaly_zscore's global z test (a band breach "
    "tracks the LOCAL regime, so a slow seasonal ramp doesn't alarm). "
    "Rows report once the window is full. Calendar-bounded windows "
    "only — no corpus-sized state.",
)
def events_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    roll = w.rowsBetween(-(_BB_W - 1), Window.currentRow)
    r = daily.select(
        "day",
        "cnt",
        F.sum("cnt").over(roll).cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).over(roll).cast("long").alias("s2"),
        F.count("*").over(roll).cast("long").alias("nw"),
    )
    wD = F.lit(float(_BB_W))
    mean_w = F.col("s1").cast("double") / wD
    sd_w = F.sqrt(
        F.greatest(
            F.lit(0.0),
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / wD
            )
            / wD,
        )
    )
    m = r.where(F.col("nw") == _BB_W).select(
        "day", "cnt", mean_w.alias("mean_w"), sd_w.alias("sd_w")
    )
    up = F.col("mean_w") + F.lit(2.0) * F.col("sd_w")
    lo = F.col("mean_w") - F.lit(2.0) * F.col("sd_w")
    return m.select(
        "day",
        "cnt",
        "mean_w",
        "sd_w",
        up.alias("upper_band"),
        lo.alias("lower_band"),
        ((F.col("cnt").cast("double") > up) | (F.col("cnt").cast("double") < lo)).alias(
            "is_break"
        ),
    )


# ---------------------------------------------------------------------------
# Running-peak drawdown
# ---------------------------------------------------------------------------


@register(
    "events_max_drawdown",
    oracle=f"""
        WITH {_SQL_DAILY},
        p AS (
            SELECT day, cnt,
                   CAST(MAX(cnt) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak
            FROM daily
        ),
        d AS (
            SELECT day, cnt, peak,
                   CAST(peak - cnt AS DOUBLE) / CAST(peak AS DOUBLE)
                       AS drawdown
            FROM p
        )
        SELECT day, cnt, peak, drawdown,
               drawdown = MAX(drawdown) OVER () AS is_max_drawdown
        FROM d
    """,
    doc="Running-peak drawdown of the daily event-rate series: peak = "
    "running max (exact integer window), drawdown = (peak - x)/peak, "
    "flag at the maximum — THE standard collapse diagnostic for a "
    "monitored rate (how far below its historical high has ingest "
    "fallen, and when was it worst), complementing "
    "events_page_hinkley's drift-since-low reading with "
    "fall-since-high. One rational division per calendar row; the "
    "max flag compares doubles both engines computed from identical "
    "exact integers.",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drawdown_from_daily(_daily(spark, sf_dir))


def drawdown_from_daily(daily: DataFrame) -> DataFrame:
    """Drawdown algebra over any (day, cnt) relation — shared by the
    batch operator and its streaming matview twin (round9_stream)."""
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = daily.select(
        "day", "cnt", F.max("cnt").over(run).cast("long").alias("peak")
    )
    d = p.select(
        "day",
        "cnt",
        "peak",
        (
            (F.col("peak") - F.col("cnt")).cast("double")
            / F.col("peak").cast("double")
        ).alias("drawdown"),
    )
    wall = Window.partitionBy()
    return d.select(
        "day",
        "cnt",
        "peak",
        "drawdown",
        (F.col("drawdown") == F.max("drawdown").over(wall)).alias(
            "is_max_drawdown"
        ),
    )
