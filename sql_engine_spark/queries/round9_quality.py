"""Round-9 quality/diagnostics set: Spiegelhalter's calibration Z,
turning-points randomness test, Ljung-Box portmanteau, sampled energy
distance, and a k-anonymity suppression plan.

House disciplines: corpus double reductions via ssum/dsum, rational
statistics up to IEEE-exact sqrt, calendar-bounded windows for the
time-series members, and the derived-sample device for the inherently
pairwise energy statistic (the emb_silhouette_sampled posture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.functions.vectors import dot, sql_dot
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.similarity import derived_sample_hex
from sql_engine_spark.queries.round9_stats import _SQL_DAILY, _daily
from sql_engine_spark.registry import _REGISTRY, register

# ---------------------------------------------------------------------------
# Spiegelhalter's Z (calibration)
# ---------------------------------------------------------------------------


@register(
    "quality_spiegelhalter_z",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(MIN(n_chars) AS DOUBLE) AS lo,
                   CAST(MAX(n_chars) AS DOUBLE) AS hi
            FROM documents
        ),
        fc AS (
            SELECT (CAST(n_chars AS DOUBLE) - lo) / (hi - lo) AS p,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents CROSS JOIN bounds
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_ssum(
                       '(CAST(y AS DOUBLE) - p) * (1.0 - 2.0 * p)',
                       scale='1000000000.0',
                   )} AS num,
                   {sql_ssum(
                       '(1.0 - 2.0 * p) * (1.0 - 2.0 * p) * p * (1.0 - p)',
                       scale='1000000000.0',
                   )} AS den
            FROM fc
        )
        SELECT n, num, den,
               num / sqrt(den) AS spiegelhalter_z,
               abs(num / sqrt(den)) > 1.96 AS miscalibrated_5pct
        FROM s
    """,
    doc="Spiegelhalter's calibration Z test (Spiegelhalter 1986) on the "
    "min-max-normalized length 'forecast' of lang='en' (the quality "
    "family's shared scorer — same p/y derivation as quality_ece and "
    "quality_brier_decomposition): Z = sum (y-p)(1-2p) / sqrt(sum "
    "(1-2p)^2 p(1-p)) — the UNBINNED calibration test (ECE needs a "
    "bin grid; Z is exact), entirely rational + one sqrt, corpus sums "
    "through ssum at the 1e-9 grain. The accompanying boolean flags "
    "|Z| > 1.96 (5% two-sided). One corpus pass.",
)
def quality_spiegelhalter_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("n_chars").cast("double").alias("lo"),
        F.max("n_chars").cast("double").alias("hi"),
    )
    fc = docs.crossJoin(F.broadcast(bounds)).select(
        (
            (F.col("n_chars").cast("double") - F.col("lo"))
            / (F.col("hi") - F.col("lo"))
        ).alias("p"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    p, y = F.col("p"), F.col("y").cast("double")
    s = fc.agg(
        F.count("*").cast("long").alias("n"),
        ssum((y - p) * (F.lit(1.0) - F.lit(2.0) * p), scale=1e9).alias("num"),
        ssum(
            (F.lit(1.0) - F.lit(2.0) * p)
            * (F.lit(1.0) - F.lit(2.0) * p)
            * p
            * (F.lit(1.0) - p),
            scale=1e9,
        ).alias("den"),
    )
    z = F.col("num") / F.sqrt(F.col("den"))
    return s.select(
        "n",
        "num",
        "den",
        z.alias("spiegelhalter_z"),
        (F.abs(z) > F.lit(1.96)).alias("miscalibrated_5pct"),
    )


# ---------------------------------------------------------------------------
# Turning-points randomness test
# ---------------------------------------------------------------------------


@register(
    "events_turning_points",
    oracle=f"""
        WITH {_SQL_DAILY},
        w AS (
            SELECT day, cnt,
                   lag(cnt) OVER (ORDER BY day) AS prev,
                   lead(cnt) OVER (ORDER BY day) AS nxt
            FROM daily
        ),
        t AS (
            SELECT CAST(SUM(CASE WHEN (cnt > prev AND cnt > nxt)
                                   OR (cnt < prev AND cnt < nxt)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_turns,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM w WHERE prev IS NOT NULL AND nxt IS NOT NULL
        )
        SELECT n + 2 AS n_days, n_turns,
               2.0 * CAST(n AS DOUBLE) / 3.0 AS expected_turns,
               (CAST(n_turns AS DOUBLE) - 2.0 * CAST(n AS DOUBLE) / 3.0)
                   / sqrt((16.0 * CAST(n + 2 AS DOUBLE) - 29.0) / 90.0) AS z
        FROM t
    """,
    doc="Turning-points test for randomness of the daily event-rate "
    "series (Kendall's classic — Brockwell & Davis 2016 sec. 1.6): a "
    "turning point is an interior day strictly above or strictly "
    "below BOTH neighbors (ties produce none — deterministic on "
    "integer counts); under i.i.d. noise E[T] = 2(n-2)/3 and Var[T] "
    "= (16n-29)/90, so z far negative means the series is smoother "
    "than noise (trend/seasonality — expected here), far positive "
    "means oscillation. Complements agg_runs_test (signs vs median) "
    "with shape information. Integer count, rational z, "
    "calendar-bounded windows.",
)
def events_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    d = daily.select(
        "cnt",
        F.lag("cnt").over(w).alias("prev"),
        F.lead("cnt").over(w).alias("nxt"),
    ).where(F.col("prev").isNotNull() & F.col("nxt").isNotNull())
    t = d.agg(
        F.sum(
            F.when(
                ((F.col("cnt") > F.col("prev")) & (F.col("cnt") > F.col("nxt")))
                | ((F.col("cnt") < F.col("prev")) & (F.col("cnt") < F.col("nxt"))),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_turns"),
        F.count("*").cast("long").alias("n"),
    )
    nD = F.col("n").cast("double")
    exp = F.lit(2.0) * nD / F.lit(3.0)
    return t.select(
        (F.col("n") + 2).alias("n_days"),
        "n_turns",
        exp.alias("expected_turns"),
        (
            (F.col("n_turns").cast("double") - exp)
            / F.sqrt(
                (F.lit(16.0) * (F.col("n") + 2).cast("double") - F.lit(29.0))
                / F.lit(90.0)
            )
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Ljung-Box portmanteau
# ---------------------------------------------------------------------------

_LB_H = 7


@register(
    "events_ljung_box",
    oracle=f"""
        WITH {_SQL_DAILY},
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_ev,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM daily
        ),
        c AS (
            SELECT cnt,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
                   CAST(cnt AS DOUBLE)
                       - CAST(n_ev AS DOUBLE) / CAST(d AS DOUBLE) AS dev
            FROM daily CROSS JOIN tot
        ),
        den AS (
            SELECT {sql_ssum('dev * dev')} AS s0 FROM c
        ),
        lags(k) AS (VALUES {", ".join(f"({k})" for k in range(1, _LB_H + 1))}),
        rk AS (
            SELECT lags.k,
                   {sql_ssum('a.dev * b.dev')} / ANY_VALUE(den.s0) AS r_k
            FROM lags
            JOIN c a ON TRUE
            JOIN c b ON b.t = a.t - lags.k
            CROSS JOIN den
            GROUP BY lags.k
        ),
        s AS (
            SELECT {sql_ssum(
                'r_k * r_k / (CAST(d AS DOUBLE) - CAST(k AS DOUBLE))',
                scale='1000000000.0',
            )} AS acc, ANY_VALUE(d) AS d
            FROM rk CROSS JOIN (SELECT d FROM tot) t
        )
        SELECT CAST(d AS BIGINT) AS n_days,
               CAST({_LB_H} AS BIGINT) AS h_lags,
               CAST(d AS DOUBLE) * (CAST(d AS DOUBLE) + 2.0) * acc
                   AS ljung_box_q
        FROM s
    """,
    doc=f"Ljung-Box portmanteau statistic (Ljung & Box 1978) at lags "
    f"1..{_LB_H} on the daily event-rate series: Q = n(n+2) sum_k "
    "r_k^2/(n-k), with autocorrelations r_k from mean-deviation "
    "products over the lag-joined day grid (exact rational mean, "
    "ssum-folded sums — the agg_autocorr_daily machinery extended to "
    "a lag GRID). Large Q rejects white noise jointly across lags — "
    "the standard pre-check before fitting any forecast model "
    "(events_holt_forecast / events_theta_forecast), where the "
    "single-lag ACF can miss mixed structure. Calendar-bounded joins "
    "only; the final 7-term fold crosses engines at the 1e-9 grain.",
)
def events_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    tot = daily.agg(
        F.sum("cnt").cast("long").alias("n_ev"),
        F.count("*").cast("long").alias("d"),
    )
    w = Window.orderBy("day")
    c = _persist(
        daily.crossJoin(F.broadcast(tot)).select(
            F.row_number().over(w).cast("long").alias("t"),
            (
                F.col("cnt").cast("double")
                - F.col("n_ev").cast("double") / F.col("d").cast("double")
            ).alias("dev"),
            "d",
        )
    )
    den = c.agg(ssum(F.col("dev") * F.col("dev")).alias("s0"))
    lags = spark.createDataFrame([(k,) for k in range(1, _LB_H + 1)], "k long")
    a = c.select(F.col("t").alias("ta"), F.col("dev").alias("da"))
    b = c.select(F.col("t").alias("tb"), F.col("dev").alias("db"))
    rk = (
        F.broadcast(lags)
        .join(a, F.lit(True))
        .join(b, F.col("tb") == F.col("ta") - F.col("k"))
        .crossJoin(F.broadcast(den))
        .groupBy("k")
        .agg(
            (ssum(F.col("da") * F.col("db")) / F.first("s0")).alias("r_k")
        )
    )
    d_rel = c.select("d").limit(1)
    s = rk.crossJoin(F.broadcast(d_rel)).agg(
        ssum(
            F.col("r_k")
            * F.col("r_k")
            / (F.col("d").cast("double") - F.col("k").cast("double")),
            scale=1e9,
        ).alias("acc"),
        F.first("d").alias("d"),
    )
    dD = F.col("d").cast("double")
    return s.select(
        F.col("d").cast("long").alias("n_days"),
        F.lit(_LB_H).cast("long").alias("h_lags"),
        (dD * (dD + F.lit(2.0)) * F.col("acc")).alias("ljung_box_q"),
    )


# ---------------------------------------------------------------------------
# Sampled energy distance between label-parity groups
# ---------------------------------------------------------------------------

_ED_TARGET = 100


@register(
    "emb_energy_distance_sampled",
    oracle=None,  # composed below (needs the derived sample threshold)
    doc="Energy distance (Szekely & Rizzo 2004) between the EVEN- and "
    "ODD-label embedding populations on the derived deterministic "
    f"~{_ED_TARGET}-vector sample (the emb_silhouette_sampled device "
    "— the E-statistic is inherently pairwise, so the production "
    "posture is a fixed-size audit sample at any corpus size): "
    "E = 2 E|X-Y| - E|X-X'| - E|Y-Y'| with Euclidean distances in "
    "the silhouette spelling (three sequential dot folds + sqrt) and "
    "every pair mean through dsum. E near 0 means the two label "
    "halves occupy the same region — the nonparametric two-sample "
    "test in embedding space that catches distribution drift that "
    "centroid distance (emb_centroid_shift) misses (equal means, "
    "different spread).",
)
def emb_energy_distance_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.io import table_row_count

    emb = load(spark, sf_dir, "embeddings")
    thr = derived_sample_hex(
        table_row_count(sf_dir, "embeddings"), target_train_rows=_ED_TARGET
    )
    s = emb.select(
        "vec_id",
        (F.col("label") % 2 == 0).alias("grp_x"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    if thr is not None:
        s = s.where(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, len(thr))
            < F.lit(thr)
        )
    s = _persist(s.withColumn("nn", dot("e", "e")))
    a = s.select(
        F.col("vec_id").alias("i"),
        F.col("grp_x").alias("gi"),
        F.col("e").alias("ea"),
        F.col("nn").alias("na"),
    )
    b = s.select(
        F.col("vec_id").alias("j"),
        F.col("grp_x").alias("gj"),
        F.col("e").alias("eb"),
        F.col("nn").alias("nb"),
    )
    pairs = a.join(b, F.col("i") < F.col("j")).select(
        "gi",
        "gj",
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.col("na") - F.lit(2.0) * dot("ea", "eb") + F.col("nb"),
            )
        ).alias("dist"),
    )
    kinds = pairs.select(
        F.when(F.col("gi") & F.col("gj"), "xx")
        .when(~F.col("gi") & ~F.col("gj"), "yy")
        .otherwise("xy")
        .alias("kind"),
        "dist",
    )
    m = kinds.groupBy("kind").agg(
        (dsum(F.col("dist")) / F.count("*").cast("double")).alias("mean_d")
    )
    counts = s.agg(
        F.sum(F.when(F.col("grp_x"), 1).otherwise(0)).cast("long").alias("n_x"),
        F.sum(F.when(~F.col("grp_x"), 1).otherwise(0)).cast("long").alias("n_y"),
    )
    piv = m.groupBy().pivot("kind", ["xx", "yy", "xy"]).agg(
        F.first("mean_d")
    )
    # Degenerate samples (a pair-kind empty because one parity group is
    # absent) yield ZERO rows, matching the oracle's CROSS JOIN against
    # the empty kind (review finding: the pivot otherwise emitted one
    # NULL-column row and the gate would row-count mismatch).
    piv = piv.where(
        F.col("xx").isNotNull()
        & F.col("yy").isNotNull()
        & F.col("xy").isNotNull()
    )
    return counts.crossJoin(F.broadcast(piv)).select(
        "n_x",
        "n_y",
        F.col("xy").alias("mean_cross"),
        F.col("xx").alias("mean_within_x"),
        F.col("yy").alias("mean_within_y"),
        (
            F.lit(2.0) * F.col("xy") - F.col("xx") - F.col("yy")
        ).alias("energy_distance"),
    )


def _fix_energy_oracle() -> None:
    def render(sf_dir: str) -> str:
        from sql_engine_spark.io import table_row_count

        thr = derived_sample_hex(
            table_row_count(sf_dir, "embeddings"), target_train_rows=_ED_TARGET
        )
        pred = (
            f"WHERE substring(md5(CAST(vec_id AS VARCHAR)), 1, {len(thr)})"
            f" < '{thr}'"
            if thr is not None
            else ""
        )
        return f"""
        WITH s AS (
            SELECT vec_id, (label % 2 = 0) AS grp_x,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings {pred}
        ),
        sn AS (SELECT vec_id, grp_x, e, {sql_dot('e', 'e')} AS nn FROM s),
        pairs AS (
            SELECT a.grp_x AS gi, b.grp_x AS gj,
                   sqrt(greatest(CAST(0.0 AS DOUBLE),
                        a.nn - 2.0 * {sql_dot('a.e', 'b.e')} + b.nn)) AS dist
            FROM sn a JOIN sn b ON a.vec_id < b.vec_id
        ),
        kinds AS (
            SELECT CASE WHEN gi AND gj THEN 'xx'
                        WHEN NOT gi AND NOT gj THEN 'yy'
                        ELSE 'xy' END AS kind, dist
            FROM pairs
        ),
        m AS (
            SELECT kind,
                   {sql_dsum('dist')} / CAST(COUNT(*) AS DOUBLE) AS mean_d
            FROM kinds GROUP BY kind
        ),
        counts AS (
            SELECT CAST(SUM(CASE WHEN grp_x THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_x,
                   CAST(SUM(CASE WHEN NOT grp_x THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_y
            FROM sn
        )
        SELECT counts.n_x, counts.n_y,
               xy.mean_d AS mean_cross,
               xx.mean_d AS mean_within_x,
               yy.mean_d AS mean_within_y,
               2.0 * xy.mean_d - xx.mean_d - yy.mean_d AS energy_distance
        FROM counts
        CROSS JOIN (SELECT mean_d FROM m WHERE kind = 'xy') xy
        CROSS JOIN (SELECT mean_d FROM m WHERE kind = 'xx') xx
        CROSS JOIN (SELECT mean_d FROM m WHERE kind = 'yy') yy
        """

    _REGISTRY["emb_energy_distance_sampled"].oracle = render


_fix_energy_oracle()


# ---------------------------------------------------------------------------
# k-anonymity suppression plan
# ---------------------------------------------------------------------------

_SUP_K = 5


@register(
    "privacy_suppression_plan",
    oracle=f"""
        WITH g AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM documents GROUP BY lang, source
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CASE WHEN n_rows < {_SUP_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_suppressed_groups,
               CAST(SUM(CASE WHEN n_rows < {_SUP_K} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_lost,
               CAST(SUM(CASE WHEN n_rows >= {_SUP_K} THEN n_rows ELSE 0 END)
                    AS BIGINT) AS rows_kept,
               CAST(SUM(CASE WHEN n_rows < {_SUP_K} THEN n_rows ELSE 0 END)
                    AS DOUBLE) / CAST(SUM(n_rows) AS DOUBLE) AS loss_frac
        FROM g GROUP BY lang
    """,
    doc=f"k-anonymity suppression plan (k={_SUP_K}) over the "
    "quasi-identifier grouping (lang, source): per lang, how many "
    "groups fall below k (must be suppressed or generalized before "
    "release — the enforcement step privacy_k_anonymity only "
    "measures), the exact row cost of suppression, and the loss "
    "fraction. The actionable output a release pipeline executes: "
    "utility loss vs anonymity, per stratum. One grouped aggregate, "
    "exact integers, one division.",
)
def privacy_suppression_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = (
        load(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("n_rows"))
    )
    low = F.col("n_rows") < _SUP_K
    return g.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.sum(F.when(low, 1).otherwise(0)).cast("long").alias(
            "n_suppressed_groups"
        ),
        F.sum(F.when(low, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_lost"),
        F.sum(F.when(~low, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_kept"),
        (
            F.sum(F.when(low, F.col("n_rows")).otherwise(0)).cast("double")
            / F.sum("n_rows").cast("double")
        ).alias("loss_frac"),
    )
