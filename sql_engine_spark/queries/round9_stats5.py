"""Round-9 final stats pair: a deterministic randomization test for
the A/B mean difference and Tukey's HSD post-hoc pairwise comparison.

House discipline: the randomization draws come from the md5 device
(deterministic, engine-identical), every corpus-sized double reduction
crosses engines via ssum, and the studentized-range critical value is
a PINNED LITERAL (the table constant for alpha=0.05, k=5, df=inf —
the literal-constant device, same as the nDCG discounts). No libm
transcendentals; sqrt only.

The reference engine has min/max/sum/count/avg only
(/root/reference/src/executor/aggregation.rs:168-427).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# events_randomization_test — deterministic Monte-Carlo sharp-null test
# ---------------------------------------------------------------------------

_RAND_B = 200

_SQL_RAND = f"""
        u AS (
            SELECT user_id, CAST(user_id % 2 AS BIGINT) AS cohort,
                   {sql_ssum('value')} AS m
            FROM events GROUP BY user_id
        ),
        obs AS (
            SELECT ({sql_ssum('CASE WHEN cohort = 1 THEN m ELSE 0.0 END')}
                    / CAST(SUM(cohort) AS DOUBLE))
                   - ({sql_ssum('CASE WHEN cohort = 0 THEN m ELSE 0.0 END')}
                      / CAST(SUM(1 - cohort) AS DOUBLE)) AS obs_diff,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM u
        ),
        draws AS (
            SELECT u.user_id, u.m, b.b,
                   list_reduce(list_transform(range(1, 13),
                       i -> CAST(instr('0123456789abcdef',
                            substring(md5(CAST(u.user_id AS VARCHAR)
                                          || '|' || CAST(b.b AS VARCHAR)),
                                      i, 1)) - 1 AS BIGINT)),
                       (a, c) -> a * 16 + c) % 2 AS assign
            FROM u CROSS JOIN (
                SELECT unnest(range(1, {_RAND_B + 1})) AS b) b
        ),
        per_b AS (
            SELECT b,
                   CASE WHEN SUM(assign) > 0 AND SUM(1 - assign) > 0
                        THEN ({sql_ssum(
                                'CASE WHEN assign = 1 THEN m ELSE 0.0 END')}
                              / CAST(SUM(assign) AS DOUBLE))
                             - ({sql_ssum(
                                'CASE WHEN assign = 0 THEN m ELSE 0.0 END')}
                                / CAST(SUM(1 - assign) AS DOUBLE))
                   END AS diff_b
            FROM draws GROUP BY b
        )
        SELECT n_users, obs_diff,
               CAST({_RAND_B} AS BIGINT) AS n_draws,
               CAST(SUM(CASE WHEN diff_b IS NOT NULL
                              AND abs(diff_b) >= abs(obs_diff)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               (CAST(SUM(CASE WHEN diff_b IS NOT NULL
                               AND abs(diff_b) >= abs(obs_diff)
                              THEN 1 ELSE 0 END) AS DOUBLE) + 1.0)
                   / (CAST({_RAND_B} AS DOUBLE) + 1.0) AS p_value
        FROM per_b CROSS JOIN obs
        GROUP BY n_users, obs_diff
"""


@register(
    "events_randomization_test",
    oracle=f"WITH {_SQL_RAND}",
    doc="Randomization (re-randomization) test for the A/B difference "
    "in per-user mean value (Fisher 1935; Edgington & Onghena's "
    f"Monte-Carlo form): {_RAND_B} deterministic Bernoulli "
    "re-assignments drawn from md5(user_id || draw-index), the "
    "re-assigned mean difference per draw, and the add-one Monte-Carlo "
    "p-value P = (1 + #extreme) / (B + 1) (Davison & Hinkley's "
    "convention — never exactly zero). Valid under the sharp null for "
    "a Bernoulli-randomized design, which is exactly how the cohorts "
    "are assigned (user_id parity); documented deviation from "
    "EXHAUSTIVE permutation: draws are independent coin-flip vectors, "
    "the standard Monte-Carlo approximation. Scale shape: one user "
    f"rollup, then users x {_RAND_B} pure map work into a {_RAND_B}-row "
    "aggregate — embarrassingly parallel, no extra shuffle beyond the "
    "rollup; all double folds cross engines via ssum. Complements the "
    "parametric z-test (events_abtest_ztest) with an assumption-free "
    "twin.",
)
def events_randomization_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "value")
    u = ev.groupBy("user_id").agg(ssum(F.col("value")).alias("m")).select(
        "user_id", (F.col("user_id") % 2).cast("long").alias("cohort"), "m"
    )
    obs = u.agg(
        (
            ssum(F.when(F.col("cohort") == 1, F.col("m")).otherwise(0.0))
            / F.sum("cohort").cast("double")
            - ssum(F.when(F.col("cohort") == 0, F.col("m")).otherwise(0.0))
            / F.sum(1 - F.col("cohort")).cast("double")
        ).alias("obs_diff"),
        F.count("*").cast("long").alias("n_users"),
    )
    b = spark.range(1, _RAND_B + 1).select(F.col("id").alias("b"))
    draws = u.crossJoin(F.broadcast(b)).select(
        "m",
        "b",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("|"),
                            F.col("b").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ).alias("assign"),
    )
    per_b = draws.groupBy("b").agg(
        F.when(
            (F.sum("assign") > 0) & (F.sum(1 - F.col("assign")) > 0),
            ssum(F.when(F.col("assign") == 1, F.col("m")).otherwise(0.0))
            / F.sum("assign").cast("double")
            - ssum(F.when(F.col("assign") == 0, F.col("m")).otherwise(0.0))
            / F.sum(1 - F.col("assign")).cast("double"),
        ).alias("diff_b")
    )
    extreme = F.sum(
        F.when(
            F.col("diff_b").isNotNull()
            & (F.abs(F.col("diff_b")) >= F.abs(F.col("obs_diff"))),
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        per_b.crossJoin(F.broadcast(obs))
        .groupBy("n_users", "obs_diff")
        .agg(
            F.lit(_RAND_B).cast("long").alias("n_draws"),
            extreme.alias("n_extreme"),
            (
                (extreme.cast("double") + F.lit(1.0))
                / (F.lit(float(_RAND_B)) + F.lit(1.0))
            ).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# agg_tukey_hsd_pairs — post-hoc pairwise comparison after one-way ANOVA
# ---------------------------------------------------------------------------

# Studentized range upper-5% point q_{0.05}(k=5, df=inf) — table
# constant (Harter 1960; e.g. NIST/SEMATECH e-Handbook table A.10).
_Q_CRIT_5_INF = "3.858"

_SQL_TUKEY = f"""
        g AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_ssum('value')} AS s,
                   {sql_ssum('value * value')} AS ss
            FROM events GROUP BY event_type
        ),
        mse AS (
            SELECT ({sql_ssum('ss - s * s / CAST(n AS DOUBLE)',
                              scale='1000000000.0')})
                   / CAST(SUM(n) - COUNT(*) AS DOUBLE) AS mse,
                   CAST(SUM(n) - COUNT(*) AS BIGINT) AS df_within
            FROM g
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.n AS n_a, b.n AS n_b,
               a.s / CAST(a.n AS DOUBLE) AS mean_a,
               b.s / CAST(b.n AS DOUBLE) AS mean_b,
               a.s / CAST(a.n AS DOUBLE) - b.s / CAST(b.n AS DOUBLE) AS diff,
               abs(a.s / CAST(a.n AS DOUBLE) - b.s / CAST(b.n AS DOUBLE))
               / sqrt((mse / 2.0) * (1.0 / CAST(a.n AS DOUBLE)
                                     + 1.0 / CAST(b.n AS DOUBLE))) AS q_stat,
               mse, df_within,
               abs(a.s / CAST(a.n AS DOUBLE) - b.s / CAST(b.n AS DOUBLE))
               / sqrt((mse / 2.0) * (1.0 / CAST(a.n AS DOUBLE)
                                     + 1.0 / CAST(b.n AS DOUBLE)))
                   > CAST({_Q_CRIT_5_INF} AS DOUBLE) AS significant
        FROM g a JOIN g b ON a.event_type < b.event_type
        CROSS JOIN mse
"""


@register(
    "agg_tukey_hsd_pairs",
    oracle=f"WITH {_SQL_TUKEY}",
    doc="Tukey's honestly-significant-difference post-hoc pairwise "
    "comparison (Tukey 1949) of mean events.value across event types: "
    "one-way-ANOVA within-group MSE from exact ssum moments, the "
    "Tukey-Kramer unequal-n standard error sqrt(MSE/2 * (1/n_i + "
    "1/n_j)), and the studentized-range statistic per pair against "
    f"q_0.05(k=5, df=inf) = {_Q_CRIT_5_INF} — a PINNED TABLE LITERAL "
    "(df_within is in the thousands here, where the inf row is the "
    "standard approximation; the df is reported so a reader can check "
    "the regime). The k x k pair relation is group-grid-sized; corpus "
    "work is ONE grouped moment aggregate. This is the follow-up that "
    "answers WHICH groups differ after Kruskal-Wallis/Brown-Forsythe "
    "flag that something does.",
)
def agg_tukey_hsd_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    g = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        ssum(F.col("value")).alias("s"),
        ssum(F.col("value") * F.col("value")).alias("ss"),
    )
    mse = g.agg(
        (
            ssum(
                F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast("double"),
                scale=1e9,
            )
            / (F.sum("n") - F.count("*")).cast("double")
        ).alias("mse"),
        (F.sum("n") - F.count("*")).cast("long").alias("df_within"),
    )
    a = g.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
    )
    b = g.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).crossJoin(
        F.broadcast(mse)
    )
    mean_a = F.col("s_a") / F.col("n_a").cast("double")
    mean_b = F.col("s_b") / F.col("n_b").cast("double")
    se = F.sqrt(
        (F.col("mse") / F.lit(2.0))
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    q = F.abs(mean_a - mean_b) / se
    return pairs.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        (mean_a - mean_b).alias("diff"),
        q.alias("q_stat"),
        "mse",
        "df_within",
        (q > F.lit(float(_Q_CRIT_5_INF))).alias("significant"),
    )
