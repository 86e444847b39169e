"""Round-8 statistics set 3: classical outlier screens (Grubbs, Dixon)
over the per-type value cohorts, the Atkinson(2) inequality index, and
the per-label embedding-norm profile. Log-free; moments DECIMAL-exact;
order statistics through the bucketed two-level rank."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register


@register(
    "agg_grubbs_statistic",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2
            FROM events GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n,
                   s1 / CAST(n AS DOUBLE) AS mu,
                   sqrt((s2 - (s1 * s1) / CAST(n AS DOUBLE))
                        / (CAST(n AS DOUBLE) - 1.0)) AS sd
            FROM s
        ),
        dev AS (
            SELECT e.event_type, e.event_id,
                   abs(e.value - m.mu) / m.sd AS g,
                   m.n, m.mu, m.sd
            FROM events e JOIN m USING (event_type)
        )
        SELECT event_type, n, mu AS mean_value, sd AS sd_value,
               g AS grubbs_g, CAST(event_id AS BIGINT) AS outlier_event_id
        FROM (
            SELECT *, row_number() OVER (PARTITION BY event_type
                                         ORDER BY g DESC, event_id) AS rk
            FROM dev
        ) WHERE rk = 1
    """,
    doc="Grubbs' outlier statistic per event type (Grubbs 1950): "
    "G = max |x - mean| / sd with the sample (n-1) standard "
    "deviation, plus the arg-max event id (ties to the smallest id) — "
    "the single-most-suspect-point screen read before any automated "
    "trim (agg_trimmed_mean_exact / winsorized read downstream). The "
    "statistic is reported raw; the critical value depends on n "
    "through the t-distribution, which stays OUT of the hashed "
    "output (libm-free house rule — consumers compare against their "
    "own table). One DECIMAL-exact moment pass, one broadcast join "
    "back, one per-type argmax window over candidate rows.",
)
def agg_grubbs_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        dsum(F.col("value")).alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "n",
        (F.col("s1") / nD).alias("mu"),
        F.sqrt(
            (F.col("s2") - (F.col("s1") * F.col("s1")) / nD) / (nD - F.lit(1.0))
        ).alias("sd"),
    )
    dev = ev.join(F.broadcast(m), "event_type").select(
        "event_type",
        "event_id",
        "n",
        "mu",
        "sd",
        (F.abs(F.col("value") - F.col("mu")) / F.col("sd")).alias("g"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("g"), F.asc("event_id"))
    return (
        dev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            "n",
            F.col("mu").alias("mean_value"),
            F.col("sd").alias("sd_value"),
            F.col("g").alias("grubbs_g"),
            F.col("event_id").cast("long").alias("outlier_event_id"),
        )
    )


@register(
    "agg_dixon_q",
    oracle="""
        WITH s AS (
            SELECT event_type, value,
                   CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY value, event_id) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
            FROM events
        ),
        pick AS (
            SELECT event_type, n,
                   MAX(CASE WHEN rk = 1 THEN value END) AS x1,
                   MAX(CASE WHEN rk = 2 THEN value END) AS x2,
                   MAX(CASE WHEN rk = n - 1 THEN value END) AS xn1,
                   MAX(CASE WHEN rk = n THEN value END) AS xn
            FROM s GROUP BY event_type, n
        )
        SELECT event_type, n, x1 AS min_value, xn AS max_value,
               (x2 - x1) / (xn - x1) AS q_low,
               (xn - xn1) / (xn - x1) AS q_high
        FROM pick
    """,
    doc="Dixon's Q ratios per event type (Dixon 1950, the r10 form): "
    "Q_low = (x2 - x1)/(xn - x1) for a suspect minimum and "
    "Q_high = (xn - x_{n-1})/(xn - x1) for a suspect maximum — the "
    "small-overhead gap test read next to Grubbs (Q reads the GAP to "
    "the neighbor; Grubbs the distance to the center). The four order "
    "statistics come from the bucketed two-level rank (ties by "
    "event_id — duplicated extremes give Q = 0, the standard "
    "convention); critical values stay out of the output as with "
    "Grubbs. Exact ranks, two double divisions.",
)
def agg_dixon_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events").select("event_type", "event_id", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="rk",
    )
    counts = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    j = ranked.join(F.broadcast(counts), "event_type")
    pick = j.groupBy("event_type", "n").agg(
        F.max(F.when(F.col("rk") == 1, F.col("value"))).alias("x1"),
        F.max(F.when(F.col("rk") == 2, F.col("value"))).alias("x2"),
        F.max(F.when(F.col("rk") == F.col("n") - 1, F.col("value"))).alias("xn1"),
        F.max(F.when(F.col("rk") == F.col("n"), F.col("value"))).alias("xn"),
    )
    rng = F.col("xn") - F.col("x1")
    return pick.select(
        "event_type",
        "n",
        F.col("x1").alias("min_value"),
        F.col("xn").alias("max_value"),
        ((F.col("x2") - F.col("x1")) / rng).alias("q_low"),
        ((F.col("xn") - F.col("xn1")) / rng).alias("q_high"),
    )


# Reciprocal terms are <= 1 but individually small (1/cnt): the default
# 1e-6 ssum grain is coarse relative to them on low-cardinality user
# sets, so the fold uses a 1e-9 grain — exact for user counts up to
# ~9e9 (sum of scaled integers stays inside DECIMAL(38,0) trivially,
# and inside BIGINT-sized partial sums since each term is <= 1e9).
_ATK_SCALE = "1000000000.0"


@register(
    "events_atkinson_index",
    oracle=f"""
        WITH u AS (
            SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY user_id
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cnt) AS BIGINT) AS total,
                   {sql_ssum('1.0 / CAST(cnt AS DOUBLE)', scale=_ATK_SCALE)} AS inv_sum
            FROM u
        )
        SELECT n AS n_users, total AS n_events,
               CAST(total AS DOUBLE) / CAST(n AS DOUBLE) AS mean_activity,
               CAST(n AS DOUBLE) / inv_sum AS harmonic_mean,
               1.0 - (CAST(n AS DOUBLE) / inv_sum)
                   / (CAST(total AS DOUBLE) / CAST(n AS DOUBLE))
                   AS atkinson_eps2
        FROM s
    """,
    doc="Atkinson inequality index at epsilon = 2 over per-user event "
    "counts: A_2 = 1 - harmonic_mean / arithmetic_mean — the "
    "inequality-aversion family's one LOG-FREE member (epsilon = 1 "
    "needs the geometric mean and a libm ln; at epsilon = 2 the "
    "equally-distributed equivalent is the harmonic mean, an exact "
    "reciprocal fold). Bottom-sensitive where Gini "
    "(events_gini_activity) is middle-sensitive, so the pair reads as "
    "an inequality dashboard. One counting aggregate to the user "
    "relation; the reciprocal fold crosses engines via ssum; counts "
    "are >= 1 by construction so the harmonic mean is always "
    "defined. The reciprocal fold uses a 1e-9 grain (see _ATK_SCALE).",
)
def events_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = load(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").cast("long").alias("cnt")
    )
    s = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("total"),
        ssum(
            F.lit(1.0) / F.col("cnt").cast("double"), scale=float(_ATK_SCALE)
        ).alias("inv_sum"),
    )
    nD = F.col("n").cast("double")
    mean = F.col("total").cast("double") / nD
    hmean = nD / F.col("inv_sum")
    return s.select(
        F.col("n").alias("n_users"),
        F.col("total").alias("n_events"),
        mean.alias("mean_activity"),
        hmean.alias("harmonic_mean"),
        (F.lit(1.0) - hmean / mean).alias("atkinson_eps2"),
    )


@register(
    "emb_norm_profile",
    oracle=f"""
        WITH v AS (
            SELECT label,
                   sqrt(list_reduce(
                       list_transform(embedding, x -> CAST(x AS DOUBLE)
                                                      * CAST(x AS DOUBLE)),
                       (a, b) -> a + b)) AS nrm
            FROM embeddings
        ),
        s AS (
            SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('nrm')} AS s1, {sql_ssum('nrm * nrm')} AS s2,
                   MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
            FROM v GROUP BY label
        )
        SELECT label, n, min_norm, max_norm,
               s1 / CAST(n AS DOUBLE) AS mean_norm,
               (s2 - (s1 * s1) / CAST(n AS DOUBLE))
                   / (CAST(n AS DOUBLE) - 1.0) AS var_norm,
               sqrt((s2 - (s1 * s1) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) - 1.0))
                   / (s1 / CAST(n AS DOUBLE)) AS norm_cv
        FROM s
    """,
    doc="Per-label embedding L2-norm profile: min/max/mean/variance "
    "and the coefficient of variation — the cheap ANN-health probe "
    "norm skew breaks maximum-inner-product and unnormalized-"
    "Euclidean search (a label whose norms drift wide needs "
    "normalization before indexing; read next to graph_hubness_audit, "
    "whose hubs are often exactly the high-norm vectors). The norm is "
    "the sequential squared fold (bit-identical to the oracle's "
    "list_reduce) and the moments cross engines via dsum/ssum; one "
    "map pass, one bounded label aggregate.",
)
def emb_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.vectors import l2_norm

    v = load(spark, sf_dir, "embeddings").select(
        "label", l2_norm("embedding").alias("nrm")
    )
    s = v.groupBy("label").agg(
        F.count("*").cast("long").alias("n"),
        dsum(F.col("nrm")).alias("s1"),
        ssum(F.col("nrm") * F.col("nrm")).alias("s2"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )
    nD = F.col("n").cast("double")
    var = (F.col("s2") - (F.col("s1") * F.col("s1")) / nD) / (nD - F.lit(1.0))
    return s.select(
        "label",
        "n",
        "min_norm",
        "max_norm",
        (F.col("s1") / nD).alias("mean_norm"),
        var.alias("var_norm"),
        (F.sqrt(var) / (F.col("s1") / nD)).alias("norm_cv"),
    )
