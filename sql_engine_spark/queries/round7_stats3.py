"""Round-7 statistics set 3 + CDC: the HyperLogLog error curve across
register counts (the sketch-sizing table), closed-form OLS trend per
group, a Beta-Binomial posterior for conversion rates, and a CDC
change-log apply — the merge path every lakehouse table maintenance
job runs.

Determinism: the HLL estimator keeps every intermediate exact (scaled
integer Z, shared alpha literals — Flajolet's alpha_16/alpha_64 are
embedded Python-computed doubles, never runtime libm); OLS and the
posterior use DECIMAL-detour sums, exact integer co-moment algebra and
single divisions (+ sqrt, which is IEEE-exact); the CDC apply resolves
to verbatim input values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_HEXVAL = "(instr('0123456789abcdef', {ch}) - 1)"

# Flajolet et al. 2007 bias-correction constants, Python-computed ONCE
# and embedded as literals in both engines (libm-free house rule).
_HLL_ALPHAS = {16: 0.673, 64: 0.709, 256: 0.7213 / (1.0 + 1.079 / 256.0)}
_HLL_SPAN = 13  # hex digits 3..15 -> 52 tail bits
_HLL_RMAX = 53
_P53 = 9007199254740992.0  # 2^53


def _hll_leg_sql(m: int) -> str:
    d0 = _HEXVAL.format(ch="substring(h, 1, 1)")
    d1 = _HEXVAL.format(ch="substring(h, 2, 1)")
    bucket = f"(({d0} * 16 + {d1}) % {m})"
    stripped = f"trim(LEADING '0' FROM substring(h, 3, {_HLL_SPAN}))"
    zeros = f"({_HLL_SPAN} - length({stripped}))"
    first = _HEXVAL.format(ch=f"substring({stripped}, 1, 1)")
    rho = (
        f"(CASE WHEN length({stripped}) = 0 THEN {_HLL_RMAX} "
        f"ELSE {zeros} * 4 + (CASE WHEN {first} >= 8 THEN 1 "
        f"WHEN {first} >= 4 THEN 2 WHEN {first} >= 2 THEN 3 ELSE 4 END) END)"
    )
    alpha = repr(_HLL_ALPHAS[m])
    return f"""
        SELECT {m} AS m,
               (CAST({alpha} AS DOUBLE) * {float(m * m)!r})
               * {_P53!r} / CAST(z_num AS DOUBLE) AS estimate
        FROM (
            SELECT CAST(SUM(1::BIGINT << (53 - r)) AS BIGINT)
                   + ({m} - CAST(COUNT(*) AS BIGINT)) * (1::BIGINT << 53)
                       AS z_num
            FROM (
                SELECT bucket, CAST(MAX(rho) AS BIGINT) AS r
                FROM (SELECT {bucket} AS bucket, {rho} AS rho FROM hx)
                GROUP BY bucket
            )
        )
    """


@register(
    "approx_hll_error_curve",
    oracle=f"""
        WITH hx AS (SELECT DISTINCT md5(text) AS h FROM documents),
        exact AS (
            SELECT CAST(COUNT(DISTINCT text) AS BIGINT) AS n_exact
            FROM documents
        ),
        legs AS (
            {_hll_leg_sql(16)}
            UNION ALL
            {_hll_leg_sql(64)}
            UNION ALL
            {_hll_leg_sql(256)}
        )
        SELECT CAST(m AS BIGINT) AS m, n_exact, estimate,
               estimate / CAST(n_exact AS DOUBLE) - CAST(1.0 AS DOUBLE)
                   AS rel_error
        FROM legs CROSS JOIN exact
    """,
    doc="HyperLogLog error curve: the SAME distinct-md5 relation "
    "sketched at m = 16 / 64 / 256 registers against the exact NDV — "
    "the sizing table that answers 'how many registers do I pay for "
    "at my error budget' (theoretical RSE = 1.04/sqrt(m): ~26%, 13%, "
    "6.5%), extending the sketch-audit family "
    "(dedup_minhash_estimate_error sizes minhash lanes, "
    "ann_ivf_nprobe_sweep sizes probe budgets). One hash pass feeds "
    "all three legs; per leg the register relation is m rows, Z is "
    "an EXACT scaled-integer sum (house HLL spelling, no log2 / no "
    "linear-counting libm), and the raw estimator is shared-literal "
    "arithmetic, so all three ESTIMATES hash bit-identically "
    "cross-engine.",
)
def approx_hll_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    hx = docs.select(F.md5("text").alias("h")).distinct()
    from sql_engine_spark.operators.dedup import _persist

    hx = _persist(hx)
    n_exact = hx.count()  # distinct md5(text) == distinct text
    legs = []
    for m in (16, 64, 256):
        d0 = _HEXVAL.format(ch="substring(h, 1, 1)")
        d1 = _HEXVAL.format(ch="substring(h, 2, 1)")
        stripped = f"trim(LEADING '0' FROM substring(h, 3, {_HLL_SPAN}))"
        zeros = f"({_HLL_SPAN} - length({stripped}))"
        first = _HEXVAL.format(ch=f"substring({stripped}, 1, 1)")
        rho = (
            f"(CASE WHEN length({stripped}) = 0 THEN {_HLL_RMAX} "
            f"ELSE {zeros} * 4 + (CASE WHEN {first} >= 8 THEN 1 "
            f"WHEN {first} >= 4 THEN 2 WHEN {first} >= 2 THEN 3 ELSE 4 END) END)"
        )
        br = hx.select(
            F.expr(f"(({d0} * 16 + {d1}) % {m})").alias("bucket"),
            F.expr(rho).alias("rho"),
        )
        regs = br.groupBy("bucket").agg(F.max("rho").cast("long").alias("r"))
        z = regs.agg(
            (
                F.sum(F.expr("shiftleft(1L, 53 - CAST(r AS INT))"))
                + (F.lit(m) - F.count("*")) * F.expr("shiftleft(1L, 53)")
            )
            .cast("long")
            .alias("z_num")
        )
        est = (
            (F.lit(_HLL_ALPHAS[m]) * F.lit(float(m * m)))
            * F.lit(_P53)
            / F.col("z_num").cast("double")
        )
        legs.append(
            z.select(
                F.lit(m).cast("long").alias("m"),
                F.lit(n_exact).cast("long").alias("n_exact"),
                est.alias("estimate"),
                (est / F.lit(float(n_exact)) - F.lit(1.0)).alias("rel_error"),
            )
        )
    res = legs[0]
    for leg in legs[1:]:
        res = res.unionByName(leg)
    return res


@register(
    "agg_ols_hourly_trend",
    oracle=f"""
        WITH pts AS (
            SELECT event_type,
                   CAST(hour(ts) AS BIGINT) AS x,
                   value AS y
            FROM events
        ),
        moments AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   {sql_dsum('y')} AS sy,
                   {sql_dsum('CAST(x AS DOUBLE) * y')} AS sxy,
                   {sql_ssum('y * y')} AS syy
            FROM pts GROUP BY event_type
        ),
        fit AS (
            SELECT event_type, n,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
                   n, sx, sy, sxx, sxy, syy
            FROM moments
        )
        SELECT event_type, n, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept,
               ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
               / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
        FROM fit
    """,
    doc="Closed-form OLS per event type: value regressed on hour-of-day "
    "via the textbook moment formulas slope = (n*Sxy - Sx*Sy) / "
    "(n*Sxx - Sx^2), intercept, and r^2 as the squared correlation — "
    "the parametric sibling of agg_theil_sen_trend (median-of-slopes "
    "robust fit). ONE map-side-combinable moment aggregate per group: "
    "x-moments are exact integers (hour is 0..23), y-moments go "
    "through the DECIMAL detour (dsum) and the wide-range y^2 through "
    "the scaled-integer detour (ssum); the fit itself is a shared "
    "scalar expression tree — divisions only — so slopes hash "
    "bit-identically.",
)
def agg_ols_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.col("value").alias("y"),
    )
    m = pts.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
        ssum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    sxyd = F.col("sxy").cast("double")
    syyd = F.col("syy").cast("double")
    num = nd * sxyd - sxd * syd
    den_x = nd * sxxd - sxd * sxd
    den_y = nd * syyd - syd * syd
    slope = num / den_x
    return m.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"),
    )


@register(
    "agg_beta_posterior",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 AS BIGINT) AS cohort,
                   CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END) > 0
                             THEN 1 ELSE 0 END AS BIGINT) AS converted
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT cohort,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_conv
            FROM u GROUP BY cohort
        )
        SELECT cohort, n_users, n_conv,
               1 + n_conv AS post_alpha,
               1 + n_users - n_conv AS post_beta,
               CAST(1 + n_conv AS DOUBLE)
                   / CAST(2 + n_users AS DOUBLE) AS post_mean,
               sqrt((CAST(1 + n_conv AS DOUBLE)
                     * CAST(1 + n_users - n_conv AS DOUBLE))
                    / ((CAST(2 + n_users AS DOUBLE)
                        * CAST(2 + n_users AS DOUBLE))
                       * CAST(3 + n_users AS DOUBLE))) AS post_sd
        FROM c
    """,
    doc="Beta-Binomial conversion posterior per A/B cohort (uniform "
    "Beta(1,1) prior): alpha' = 1 + conversions, beta' = 1 + misses, "
    "posterior mean alpha'/(alpha'+beta') and sd "
    "sqrt(a'b'/((a'+b')^2(a'+b'+1))) — the Bayesian companion to "
    "events_abtest_ztest (same user_id-parity cohorts, same per-user "
    "conversion definition family): small-sample-honest uncertainty "
    "without a normal approximation. Counts are exact; mean and sd "
    "are rational arithmetic + one sqrt (IEEE-exact) — fully "
    "hash-stable. Credible-interval quantiles need the incomplete "
    "beta function (libm territory) and are deliberately left to the "
    "consumer; mean +- 2 sd is the scale-free summary shipped here.",
)
def agg_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("cohort"),
        F.when(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("converted"),
    )
    c = u.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_conv"),
    )
    a = (F.lit(1) + F.col("n_conv")).cast("long")
    b = (F.lit(1) + F.col("n_users") - F.col("n_conv")).cast("long")
    tot = (F.lit(2) + F.col("n_users")).cast("double")
    return c.select(
        "cohort",
        "n_users",
        "n_conv",
        a.alias("post_alpha"),
        b.alias("post_beta"),
        (a.cast("double") / tot).alias("post_mean"),
        F.sqrt(
            (a.cast("double") * b.cast("double"))
            / ((tot * tot) * (F.lit(3) + F.col("n_users")).cast("double"))
        ).alias("post_sd"),
    )


@register(
    "pipeline_cdc_apply",
    oracle=f"""
        WITH final AS (
            SELECT o_orderstatus,
                   CASE WHEN o_orderkey % 7 = 0 AND o_orderkey % 10 <> 0
                        THEN o_totalprice * 1.1
                        ELSE o_totalprice END AS price
            FROM orders
            WHERE o_orderkey % 13 <> 0
        )
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('price')} AS sum_price
        FROM final GROUP BY o_orderstatus
    """,
    doc="CDC change-log apply (the lakehouse MERGE maintenance job): a "
    "base snapshot (orders minus the %10 keys) receives a change log "
    "of INSERTs (the %10 keys), UPDATEs (base %7 keys, price x1.1) "
    "and DELETEs (%13 keys), each stamped with a sequence number; the "
    "apply is latest-sequence-wins per key (one row_number window "
    "over (key, seq desc)) followed by dropping keys whose winning "
    "op is D — upsert + delete in ONE shuffle by key, the plan that "
    "scales (per-op sequential passes would shuffle three times). "
    "Extends merge_upsert_latest with explicit op codes and deletes. "
    "The oracle derives the final state ALGEBRAICALLY from the rules "
    "— an independent spelling, so the gate checks the merge "
    "machinery, not its own mirror. Output is the final-state "
    "aggregate by status with DECIMAL-detour price sums.",
)
def pipeline_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = od.where(F.col("o_orderkey") % 10 != 0).select(
        "*", F.lit(0).alias("__seq"), F.lit("I").alias("__op")
    )
    inserts = od.where(F.col("o_orderkey") % 10 == 0).select(
        "*", F.lit(1).alias("__seq"), F.lit("I").alias("__op")
    )
    updates = (
        od.where((F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 10 != 0))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .select("*", F.lit(1).alias("__seq"), F.lit("U").alias("__op"))
    )
    deletes = od.where(F.col("o_orderkey") % 13 == 0).select(
        "*", F.lit(2).alias("__seq"), F.lit("D").alias("__op")
    )
    log = base.unionByName(inserts).unionByName(updates).unionByName(deletes)
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("__seq"))
    final = (
        log.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & (F.col("__op") != "D"))
        .drop("__rn", "__seq", "__op")
    )
    return final.groupBy("o_orderstatus").agg(
        F.count("*").cast("long").alias("n"),
        dsum(F.col("o_totalprice")).alias("sum_price"),
    )
