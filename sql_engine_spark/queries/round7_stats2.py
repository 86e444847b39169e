"""Round-7 statistics, second set: a deterministic Poisson-bootstrap
confidence interval, per-type Poisson rate intervals, and the
minimum-detectable-effect power curve that closes the A/B-testing loop
(events_abtest_ztest answers 'is this lift real?'; the MDE curve
answers 'how big a lift COULD we even see at this traffic?').

All randomness is md5-derived with Python-computed integer thresholds
embedded identically in both engines — deterministic, replayable, and
oracle-hashable; z-quantiles are shared literals (libm erf is not
cross-engine bit-stable, a literal is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register

_HEXVAL = "(instr('0123456789abcdef', {ch}) - 1)"

_BOOT_B = 32
# Poisson(1) CDF quantized to 1/256: row weight w for a uniform byte v
# is the count of thresholds <= v. Thresholds are round(256 * P(X <= k))
# for k = 0..4 (weights capped at 5; P(X >= 5) < 0.4%), computed ONCE
# here and embedded as integer literals in both engines.
_POIS_THRESHOLDS = (94, 188, 235, 251, 255)


def _boot_weight_sql(idc: str, b: str, str_type: str) -> str:
    h0 = _HEXVAL.format(
        ch=f"substring(md5(concat(CAST({idc} AS {str_type}), '-', "
        f"CAST({b} AS {str_type}))), 1, 1)"
    )
    h1 = _HEXVAL.format(
        ch=f"substring(md5(concat(CAST({idc} AS {str_type}), '-', "
        f"CAST({b} AS {str_type}))), 2, 1)"
    )
    v = f"(({h0}) * 16 + ({h1}))"
    arms = " + ".join(
        f"(CASE WHEN {v} >= {t} THEN 1 ELSE 0 END)" for t in _POIS_THRESHOLDS
    )
    return f"({arms})"


@register(
    "agg_bootstrap_mean_ci",
    oracle=f"""
        WITH reps AS (
            SELECT e.event_id, e.value, t.b,
                   {_boot_weight_sql('e.event_id', 't.b', 'VARCHAR')} AS w
            FROM events e CROSS JOIN range(0, {_BOOT_B}) t(b)
        ),
        means AS (
            SELECT b,
                   {sql_dsum('CAST(w AS DOUBLE) * value')}
                       / CAST(SUM(w) AS DOUBLE) AS m
            FROM reps GROUP BY b
        ),
        r AS (
            SELECT m, CAST(row_number() OVER (ORDER BY m, b) AS BIGINT) AS rk
            FROM means
        ),
        base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} / COUNT(*) AS mean_value
            FROM events
        )
        SELECT base.n, base.mean_value,
               CAST({_BOOT_B} AS BIGINT) AS n_replicas,
               MAX(CASE WHEN rk = 2 THEN m END) AS boot_lo,
               MAX(CASE WHEN rk = {_BOOT_B - 1} THEN m END) AS boot_hi
        FROM r CROSS JOIN base
        GROUP BY base.n, base.mean_value
    """,
    doc="Deterministic Poisson-bootstrap CI for the mean event value "
    "(Chamandy et al. 2012, 'Estimating Uncertainty for Massive Data "
    "Streams' — the streaming-friendly bootstrap: each row joins each "
    "replica with an independent Poisson(1) weight, so no resample "
    "materialization and the replica statistics are ONE "
    "map-side-combinable aggregate). Weights derive from md5(event, "
    "replica) against Poisson-CDF thresholds quantized to 1/256 and "
    "embedded as shared integer literals — fully deterministic and "
    "oracle-hashable; the quantization (<0.4% mass shift) is the "
    "documented deviation from sampled weights. The interval is the "
    "2nd/31st order statistic of the 32 replica means (~93.75% "
    "coverage; replica count is the knob). At 100 TB the 32x row "
    "amplification is the honest bootstrap cost — production would "
    "run bag-of-little-bootstraps over partitions; the per-replica "
    "aggregate shape is identical.",
)
def agg_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import dsum

    ev = _persist(load(spark, sf_dir, "events").select("event_id", "value"))
    # r12 optimization, results identical: (a) widen the cached 1-file
    # relation so the 32x-amplified weight map uses every core instead
    # of one; (b) materialize the uniform byte __v into a column once —
    # the inlined spelling repeated the md5 subexpression in all five
    # CASE arms (2.41s -> 0.61s on this leg at sf0.1). The groupBy("b")
    # partial sums are order-insensitive, so partitioning is free to
    # change. The oracle keeps the inlined spelling; weights are equal
    # integer-for-integer.
    wide = ev.repartition(spark.sparkContext.defaultParallelism)
    _v = (
        "((instr('0123456789abcdef', substring(md5(concat("
        "CAST(event_id AS STRING), '-', CAST(b AS STRING))), 1, 1)) - 1) * 16"
        " + (instr('0123456789abcdef', substring(md5(concat("
        "CAST(event_id AS STRING), '-', CAST(b AS STRING))), 2, 1)) - 1))"
    )
    _arms = " + ".join(
        f"(CASE WHEN __v >= {t} THEN 1 ELSE 0 END)" for t in _POIS_THRESHOLDS
    )
    reps = (
        wide.select(
            "event_id",
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
        )
        .withColumn("__v", F.expr(_v))
        .withColumn("w", F.expr(_arms))
    )
    means = reps.groupBy("b").agg(
        (
            dsum(F.col("w").cast("double") * F.col("value"))
            / F.sum("w").cast("double")
        ).alias("m")
    )
    from pyspark.sql import Window

    # 32-row relation: a plain window is the right tool.
    r = means.select(
        "m",
        F.row_number().over(Window.orderBy("m", "b")).cast("long").alias("rk"),
    )
    base = ev.agg(
        F.count("*").cast("long").alias("n"),
        (dsum("value") / F.count("*")).alias("mean_value"),
    )
    return (
        r.crossJoin(F.broadcast(base))
        .groupBy("n", "mean_value")
        .agg(
            F.lit(_BOOT_B).cast("long").alias("n_replicas"),
            F.max(F.when(F.col("rk") == 2, F.col("m"))).alias("boot_lo"),
            F.max(F.when(F.col("rk") == _BOOT_B - 1, F.col("m"))).alias(
                "boot_hi"
            ),
        )
    )


@register(
    "agg_poisson_rate_ci",
    oracle="""
        WITH days AS (
            SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
            FROM events
        ),
        c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        )
        SELECT event_type, n, n_days,
               CAST(n AS DOUBLE) / CAST(n_days AS DOUBLE) AS rate_per_day,
               (CAST(n AS DOUBLE)
                - CAST(1.959964 AS DOUBLE) * sqrt(CAST(n AS DOUBLE)))
                   / CAST(n_days AS DOUBLE) AS ci_lo,
               (CAST(n AS DOUBLE)
                + CAST(1.959964 AS DOUBLE) * sqrt(CAST(n AS DOUBLE)))
                   / CAST(n_days AS DOUBLE) AS ci_hi
        FROM c CROSS JOIN days
    """,
    doc="Per-type daily event rate with a 95% Poisson interval (normal "
    "approximation, n +- 1.96 sqrt(n)) — the capacity-planning / "
    "anomaly-threshold companion to events_hourly_profile: a tomorrow "
    "outside [ci_lo, ci_hi] is load shift, not noise. One counting "
    "aggregate + a scalar day count; the z quantile is a shared "
    "literal and sqrt is IEEE-exact, so the interval hashes.",
)
def agg_poisson_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = ev.agg(
        F.countDistinct(F.col("ts").cast("date")).cast("long").alias("n_days")
    )
    c = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    z = F.lit(1.959964).cast("double")
    nd = F.col("n").cast("double")
    dd = F.col("n_days").cast("double")
    return c.crossJoin(F.broadcast(days)).select(
        "event_type",
        "n",
        "n_days",
        (nd / dd).alias("rate_per_day"),
        ((nd - z * F.sqrt(nd)) / dd).alias("ci_lo"),
        ((nd + z * F.sqrt(nd)) / dd).alias("ci_hi"),
    )


_MDE_GRID = (1000, 5000, 10000, 50000, 100000)
# z_{0.975} (two-sided alpha 0.05) and z_{0.80} (80% power), shared
# literals in both engines.
_Z_ALPHA = 1.959964
_Z_POWER = 0.841621


@register(
    "events_mde_power_curve",
    oracle=f"""
        WITH base AS (
            SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                            THEN user_id END) AS BIGINT)
                       AS converters,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events
        ),
        p AS (
            SELECT converters, n_users,
                   CAST(converters AS DOUBLE) / CAST(n_users AS DOUBLE)
                       AS base_rate
            FROM base
        ),
        grid(n_per_arm) AS (VALUES {", ".join(f"({n})" for n in _MDE_GRID)})
        SELECT CAST(n_per_arm AS BIGINT) AS n_per_arm,
               converters, n_users, base_rate,
               (CAST({_Z_ALPHA} AS DOUBLE) + CAST({_Z_POWER} AS DOUBLE))
                   * sqrt((2.0 * base_rate * (1.0 - base_rate))
                          / CAST(n_per_arm AS DOUBLE)) AS mde_abs,
               ((CAST({_Z_ALPHA} AS DOUBLE) + CAST({_Z_POWER} AS DOUBLE))
                   * sqrt((2.0 * base_rate * (1.0 - base_rate))
                          / CAST(n_per_arm AS DOUBLE))) / base_rate
                   AS mde_rel
        FROM p CROSS JOIN grid
    """,
    doc="Minimum-detectable-effect power curve for a two-arm conversion "
    "test at the observed purchase rate: per candidate arm size, the "
    "smallest absolute/relative lift detectable at alpha=0.05 with "
    "80% power (the standard two-proportion formula, z literals "
    "shared) — the experiment-sizing table a team reads BEFORE "
    "launching the test events_abtest_ztest later judges. One "
    "distinct-user aggregate; the curve is a 5-row literal grid "
    "crossed with a 1-row base-rate relation.",
)
def events_mde_power_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    base = ev.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        )
        .cast("long")
        .alias("converters"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    ).withColumn(
        "base_rate",
        F.col("converters").cast("double") / F.col("n_users").cast("double"),
    )
    grid = F.broadcast(
        ev.sparkSession.createDataFrame(
            [(n,) for n in _MDE_GRID], "n_per_arm long"
        )
    )
    zsum = F.lit(_Z_ALPHA).cast("double") + F.lit(_Z_POWER).cast("double")
    mde = zsum * F.sqrt(
        (2.0 * F.col("base_rate") * (1.0 - F.col("base_rate")))
        / F.col("n_per_arm").cast("double")
    )
    return base.crossJoin(grid).select(
        "n_per_arm",
        "converters",
        "n_users",
        "base_rate",
        mde.alias("mde_abs"),
        (mde / F.col("base_rate")).alias("mde_rel"),
    )
