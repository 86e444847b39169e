"""Round-7 causal/effect-size/survival operators: Benjamini-Hochberg
FDR control over a family of exact rank tests, Cohen's d effect sizes,
exact midrank ROC-AUC, a Kaplan-Meier survival table, and a
difference-in-differences estimator — the measurement layer that turns
the engine's A/B machinery (events_abtest_ztest, events_mde_power_curve)
into decisions that survive multiple comparisons.

House-rule compliance: no libm transcendentals in hashed outputs (sqrt
only); every multi-term double reduction goes through DECIMAL
(functions/numeric) or exact integers; the BH step-up comparisons are
pure integer cross-multiplications (no float thresholds at all); the
Kaplan-Meier survival product is an ordered left-fold over the
day-level factor array — bit-identical in Spark's aggregate() and
DuckDB's list_reduce because both execute the same IEEE multiply
sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

# Weekend flag pinned to Spark's dayofweek (1=Sunday..7=Saturday);
# DuckDB's dayofweek is 0=Sunday..6, hence the +1 in oracles (the
# convention round6_stats established). Deferred behind a function:
# pyspark 4 refuses to construct Columns without an active session,
# and the driver may import this module before creating one.
def _wknd_spark() -> "F.Column":
    return F.dayofweek("ts").isin(1, 7)


_WKND_SQL = "(dayofweek(ts) + 1) IN (1, 7)"

# BH at alpha = 0.05 spelled as the exact rational 1/20 so the step-up
# comparisons are integer cross-multiplications.
_BH_ALPHA_NUM, _BH_ALPHA_DEN = 1, 20


@register(
    "agg_bh_fdr",
    oracle=f"""
        WITH s AS (
            SELECT event_type, event_id, value,
                   CASE WHEN {_WKND_SQL} THEN 1 ELSE 0 END AS iw
            FROM events
        ),
        r AS (
            SELECT event_type, iw,
                   CAST(row_number() OVER (PARTITION BY event_type
                                           ORDER BY value, event_id)
                        AS BIGINT) AS rk
            FROM s
        ),
        t AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN iw = 1 THEN rk ELSE 0 END)
                        AS BIGINT) AS r_w,
                   CAST(SUM(iw) AS BIGINT) AS n_w,
                   CAST(SUM(1 - iw) AS BIGINT) AS n_d
            FROM r GROUP BY event_type
        ),
        p AS (
            SELECT event_type, n_w, n_d,
                   r_w - ((n_w * (n_w + 1)) // 2) AS u_w,
                   2 * least(r_w - ((n_w * (n_w + 1)) // 2),
                             n_w * n_d - (r_w - ((n_w * (n_w + 1)) // 2)))
                       AS p_num,
                   n_w * n_d AS p_den
            FROM t
        ),
        k AS (
            SELECT event_type, n_w, n_d, u_w, p_num, p_den,
                   CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE) AS p_value,
                   CAST(row_number() OVER (
                       ORDER BY CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE),
                                event_type) AS BIGINT) AS bh_rank,
                   CAST(COUNT(*) OVER () AS BIGINT) AS m
            FROM p
        ),
        verdicts AS (
            SELECT *,
                   CASE WHEN p_num * m * {_BH_ALPHA_DEN}
                             <= bh_rank * p_den * {_BH_ALPHA_NUM}
                        THEN bh_rank ELSE 0 END AS pass_rank
            FROM k
        )
        SELECT event_type, n_w, n_d, u_w, p_num, p_den, p_value, bh_rank,
               bh_rank <= MAX(pass_rank) OVER () AS rejected
        FROM verdicts
    """,
    doc="Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) "
    "over a FAMILY of five exact Mann-Whitney tests — weekend vs "
    "weekday value distribution, one hypothesis per event type. The "
    "per-type U comes from the bucketed partitioned rank "
    "(deterministic event_id tie-break, the agg_mannwhitney_u "
    "convention); the two-sided p proxy is the EXACT RATIONAL "
    "2*min(U, n_w*n_d - U) / (n_w*n_d), and every BH step-up "
    "comparison p_(k) <= (k/m)*alpha is an integer "
    "cross-multiplication — the entire multiple-testing decision "
    "path contains no float arithmetic. The corpus-sized work is one "
    "rank pass; BH itself runs on the m=5-row hypothesis relation "
    "(window over 5 rows). Step-up semantics (reject ALL ranks <= "
    "the largest passing rank, even non-passing ones below it) "
    "pinned in tests.",
)
def agg_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events").select(
            "event_type",
            "event_id",
            "value",
            F.when(_wknd_spark(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("iw"),
        )
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="__rank",
    )
    t = ranked.groupBy("event_type").agg(
        F.sum(F.when(F.col("iw") == 1, F.col("__rank")).otherwise(0))
        .cast("long")
        .alias("r_w"),
        F.sum("iw").cast("long").alias("n_w"),
        F.sum(F.lit(1) - F.col("iw")).cast("long").alias("n_d"),
    )
    p = t.select(
        "event_type",
        "n_w",
        "n_d",
        F.expr("r_w - ((n_w * (n_w + 1)) div 2)").alias("u_w"),
        F.expr(
            "2 * least(r_w - ((n_w * (n_w + 1)) div 2), "
            "n_w * n_d - (r_w - ((n_w * (n_w + 1)) div 2)))"
        ).alias("p_num"),
        (F.col("n_w") * F.col("n_d")).alias("p_den"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    k = p.select(
        "*",
        (F.col("p_num").cast("double") / F.col("p_den").cast("double")).alias(
            "p_value"
        ),
        F.row_number()
        .over(
            Window.orderBy(
                F.col("p_num").cast("double") / F.col("p_den").cast("double"),
                F.col("event_type"),
            )
        )
        .cast("long")
        .alias("bh_rank"),
        F.count("*").over(w_all).cast("long").alias("m"),
    )
    verdicts = k.withColumn(
        "pass_rank",
        F.when(
            F.col("p_num") * F.col("m") * F.lit(_BH_ALPHA_DEN)
            <= F.col("bh_rank") * F.col("p_den") * F.lit(_BH_ALPHA_NUM),
            F.col("bh_rank"),
        ).otherwise(F.lit(0)),
    )
    return verdicts.select(
        "event_type",
        "n_w",
        "n_d",
        "u_w",
        "p_num",
        "p_den",
        "p_value",
        "bh_rank",
        (F.col("bh_rank") <= F.max("pass_rank").over(w_all)).alias("rejected"),
    )


@register(
    "agg_cohens_d",
    oracle=f"""
        WITH cells AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN {_WKND_SQL} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_w,
                   {sql_dsum(f"CASE WHEN {_WKND_SQL} THEN value ELSE NULL END")}
                       AS s_w,
                   {sql_ssum(f"CASE WHEN {_WKND_SQL} THEN value * value ELSE NULL END")}
                       AS q_w,
                   CAST(SUM(CASE WHEN {_WKND_SQL} THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_d,
                   {sql_dsum(f"CASE WHEN {_WKND_SQL} THEN NULL ELSE value END")}
                       AS s_d,
                   {sql_ssum(f"CASE WHEN {_WKND_SQL} THEN NULL ELSE value * value END")}
                       AS q_d
            FROM events GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n_w, n_d,
                   CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE) AS m_w,
                   CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE) AS m_d,
                   (CAST(q_w AS DOUBLE)
                    - (CAST(n_w AS DOUBLE)
                       * (CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE)))
                      * (CAST(s_w AS DOUBLE) / CAST(n_w AS DOUBLE)))
                   / CAST(n_w - 1 AS DOUBLE) AS v_w,
                   (CAST(q_d AS DOUBLE)
                    - (CAST(n_d AS DOUBLE)
                       * (CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)))
                      * (CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE)))
                   / CAST(n_d - 1 AS DOUBLE) AS v_d
            FROM cells
        )
        SELECT event_type, n_w, n_d, m_w, m_d,
               (m_w - m_d)
               / sqrt((CAST(n_w - 1 AS DOUBLE) * v_w
                       + CAST(n_d - 1 AS DOUBLE) * v_d)
                      / CAST(n_w + n_d - 2 AS DOUBLE)) AS cohens_d
        FROM m
    """,
    doc="Cohen's d standardized effect size (weekend vs weekday value, "
    "per event type): pooled-variance d = (m_w - m_d) / s_pooled "
    "(Cohen 1988). ONE conditional-aggregate pass per type: counts "
    "exact, sums through the DECIMAL detour (dsum), squared terms "
    "through the scaled-integer detour (ssum — the double->decimal "
    "cast itself is not cross-engine stable for wide-range squares), "
    "then an identical scalar expression tree (divisions, one sqrt) "
    "on both engines — effect sizes hash bit-exactly. Complements "
    "agg_bh_fdr: BH says WHICH types differ, d says by HOW MUCH in "
    "pooled-SD units.",
)
def agg_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wknd = _wknd_spark()
    cells = ev.groupBy("event_type").agg(
        F.sum(F.when(wknd, 1).otherwise(0)).cast("long").alias("n_w"),
        dsum(F.when(wknd, F.col("value"))).alias("s_w"),
        ssum(F.when(wknd, F.col("value") * F.col("value"))).alias("q_w"),
        F.sum(F.when(wknd, 0).otherwise(1)).cast("long").alias("n_d"),
        dsum(F.when(~wknd, F.col("value"))).alias("s_d"),
        ssum(F.when(~wknd, F.col("value") * F.col("value"))).alias("q_d"),
    )
    m = cells.select(
        "event_type",
        "n_w",
        "n_d",
        (F.col("s_w").cast("double") / F.col("n_w").cast("double")).alias("m_w"),
        (F.col("s_d").cast("double") / F.col("n_d").cast("double")).alias("m_d"),
        (
            (
                F.col("q_w").cast("double")
                - (
                    F.col("n_w").cast("double")
                    * (F.col("s_w").cast("double") / F.col("n_w").cast("double"))
                )
                * (F.col("s_w").cast("double") / F.col("n_w").cast("double"))
            )
            / (F.col("n_w") - 1).cast("double")
        ).alias("v_w"),
        (
            (
                F.col("q_d").cast("double")
                - (
                    F.col("n_d").cast("double")
                    * (F.col("s_d").cast("double") / F.col("n_d").cast("double"))
                )
                * (F.col("s_d").cast("double") / F.col("n_d").cast("double"))
            )
            / (F.col("n_d") - 1).cast("double")
        ).alias("v_d"),
    )
    return m.select(
        "event_type",
        "n_w",
        "n_d",
        "m_w",
        "m_d",
        (
            (F.col("m_w") - F.col("m_d"))
            / F.sqrt(
                (
                    (F.col("n_w") - 1).cast("double") * F.col("v_w")
                    + (F.col("n_d") - 1).cast("double") * F.col("v_d")
                )
                / (F.col("n_w") + F.col("n_d") - 2).cast("double")
            )
        ).alias("cohens_d"),
    )


@register(
    "quality_roc_auc",
    oracle="""
        WITH labeled AS (
            SELECT n_chars AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        tot AS (
            SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS n_neg
            FROM labeled
        ),
        per_score AS (
            SELECT score,
                   CAST(SUM(y) AS BIGINT) AS c_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS c_neg
            FROM labeled GROUP BY score
        ),
        cum AS (
            SELECT score, c_pos, c_neg,
                   CAST(COALESCE(SUM(c_neg) OVER (
                       ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS neg_below
            FROM per_score
        )
        SELECT n_pos, n_neg,
               CAST(SUM(2 * c_pos * neg_below + c_pos * c_neg) AS BIGINT)
                   AS auc_num2,
               CAST(SUM(2 * c_pos * neg_below + c_pos * c_neg) AS DOUBLE)
                   / (CAST(2 AS DOUBLE)
                      * (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                   AS auc,
               CAST(SUM(2 * c_pos * neg_below + c_pos * c_neg) AS DOUBLE)
                   / ((CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
                   - CAST(1.0 AS DOUBLE) AS gini
        FROM cum CROSS JOIN tot
        GROUP BY n_pos, n_neg
    """,
    doc="Exact midrank ROC-AUC of a scalar scorer (document length "
    "n_chars) against a binary label (lang = 'en'): AUC = P(score_pos "
    "> score_neg) + 0.5 * P(tie), computed as the EXACT INTEGER "
    "2*sum_s[c_pos(s) * (2*neg_below(s)) / 2 ...] pair count over the "
    "DISTINCT-SCORE relation — concordant pairs count 2, tied pairs "
    "count 1, in half-pair units — so the only division is the final "
    "one (AUC equals the Mann-Whitney U statistic normalized; Hanley "
    "& McNeil 1982). The per-score relation is bounded by the score "
    "DOMAIN (distinct lengths), not the corpus, so the single cumsum "
    "window is domain-sized; the corpus-sized work is one grouped "
    "count. Gini = 2*AUC - 1 from the same integers.",
)
def quality_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    per_score = docs.groupBy("score").agg(
        F.sum("y").cast("long").alias("c_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("c_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_score.select(
        "score",
        "c_pos",
        "c_neg",
        F.coalesce(F.sum("c_neg").over(w), F.lit(0)).cast("long").alias("neg_below"),
    )
    return (
        cum.agg(
            F.sum(
                2 * F.col("c_pos") * F.col("neg_below") + F.col("c_pos") * F.col("c_neg")
            )
            .cast("long")
            .alias("auc_num2"),
            F.sum(F.col("c_pos")).cast("long").alias("n_pos"),
            F.sum(F.col("c_neg")).cast("long").alias("n_neg"),
        )
        .select(
            "n_pos",
            "n_neg",
            "auc_num2",
            (
                F.col("auc_num2").cast("double")
                / (
                    F.lit(2.0)
                    * (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
                )
            ).alias("auc"),
            (
                F.col("auc_num2").cast("double")
                / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
                - F.lit(1.0)
            ).alias("gini"),
        )
    )


@register(
    "events_kaplan_meier",
    oracle="""
        WITH bounds AS (
            SELECT CAST(MAX(ts) AS DATE) AS max_day FROM events
        ),
        signups AS (
            SELECT event_id, user_id, ts,
                   CAST(ts AS DATE) AS s_day
            FROM events WHERE event_type = 'signup'
        ),
        conv AS (
            SELECT s.event_id,
                   MIN(p.ts) AS conv_ts
            FROM signups s
            JOIN events p
              ON p.user_id = s.user_id AND p.event_type = 'purchase'
             AND p.ts > s.ts
            GROUP BY s.event_id
        ),
        subjects AS (
            SELECT s.event_id,
                   CASE WHEN c.conv_ts IS NOT NULL THEN 1 ELSE 0 END AS d,
                   CASE WHEN c.conv_ts IS NOT NULL
                        THEN date_diff('day', s.s_day, CAST(c.conv_ts AS DATE))
                        ELSE date_diff('day', s.s_day, b.max_day)
                   END AS dur
            FROM signups s
            LEFT JOIN conv c ON s.event_id = c.event_id
            CROSS JOIN bounds b
        ),
        day_table AS (
            SELECT dur AS day,
                   CAST(SUM(d) AS BIGINT) AS n_events
            FROM subjects GROUP BY dur
            HAVING SUM(d) > 0
        ),
        risk AS (
            SELECT t.day, t.n_events,
                   CAST((SELECT COUNT(*) FROM subjects s
                         WHERE s.dur >= t.day) AS BIGINT) AS n_risk
            FROM day_table t
        ),
        factors AS (
            SELECT day, n_events, n_risk,
                   CAST(1.0 AS DOUBLE)
                   - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)
                       AS factor
            FROM risk
        ),
        arr AS (
            SELECT list(struct_pack(day := day, factor := factor)
                        ORDER BY day) AS a
            FROM factors
        )
        SELECT f.day, f.n_risk, f.n_events,
               CAST(f.n_events AS DOUBLE) / CAST(f.n_risk AS DOUBLE)
                   AS hazard,
               list_reduce(
                   list_prepend(CAST(1.0 AS DOUBLE),
                       list_transform(
                           list_filter(arr.a, e -> e.day <= f.day),
                           e -> e.factor)),
                   (acc, x) -> acc * x) AS survival
        FROM factors f CROSS JOIN arr
    """,
    doc="Kaplan-Meier survival table (Kaplan & Meier 1958) for "
    "time-from-signup-to-next-purchase, censored at the observation "
    "horizon: subjects are signup EPISODES (each signup event races "
    "the user's next purchase; episodes with no later purchase are "
    "right-censored at the global max day). Per event day t: n_risk "
    "= subjects with duration >= t (exact), hazard = d/n (single "
    "division), and S(t) = prod_{i<=t}(1 - d_i/n_i) computed as an "
    "ORDERED LEFT-FOLD over the day-sorted factor array — Spark "
    "aggregate() and DuckDB list_reduce execute the identical IEEE "
    "multiply sequence, so the product hashes without any "
    "exp(sum(log)) transcendental detour (house rule). The folded "
    "relation is O(distinct event days) — horizon-bounded, never "
    "corpus-sized; the corpus-sized work is one as-of-style "
    "min-join per episode.",
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    signups = ev.where(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts", F.col("ts").cast("date").alias("s_day")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    conv = (
        signups.join(
            purchases,
            (F.col("p_user") == F.col("user_id")) & (F.col("p_ts") > F.col("ts")),
        )
        .groupBy("event_id")
        .agg(F.min("p_ts").alias("conv_ts"))
    )
    subjects = _persist(
        signups.join(conv, "event_id", "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_id",
            F.when(F.col("conv_ts").isNotNull(), 1).otherwise(0).alias("d"),
            F.when(
                F.col("conv_ts").isNotNull(),
                F.datediff(F.col("conv_ts").cast("date"), F.col("s_day")),
            )
            .otherwise(F.datediff(F.col("max_day"), F.col("s_day")))
            .alias("dur"),
        )
    )
    day_table = (
        subjects.groupBy(F.col("dur").alias("day"))
        .agg(F.sum("d").cast("long").alias("n_events"))
        .where(F.col("n_events") > 0)
    )
    # n_risk per event day: day_table is horizon-bounded, so the
    # inequality join is (days x subjects) with tiny left side.
    risk = (
        F.broadcast(day_table)
        .join(subjects, subjects["dur"] >= day_table["day"])
        .groupBy("day", "n_events")
        .agg(F.count("*").cast("long").alias("n_risk"))
    )
    factors = risk.select(
        "day",
        "n_events",
        "n_risk",
        (
            F.lit(1.0) - F.col("n_events").cast("double") / F.col("n_risk").cast("double")
        ).alias("factor"),
    )
    arr = factors.agg(
        F.sort_array(F.collect_list(F.struct("day", "factor"))).alias("a")
    )
    return factors.crossJoin(F.broadcast(arr)).select(
        "day",
        "n_risk",
        "n_events",
        (F.col("n_events").cast("double") / F.col("n_risk").cast("double")).alias(
            "hazard"
        ),
        F.expr(
            "aggregate(transform(filter(a, e -> e.day <= day), e -> e.factor), "
            "CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)"
        ).alias("survival"),
    )


@register(
    "events_did_estimator",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(MIN(ts) AS DATE) AS min_day,
                   date_diff('day', CAST(MIN(ts) AS DATE),
                             CAST(MAX(ts) AS DATE)) AS span
            FROM events
        ),
        tagged AS (
            SELECT CAST(e.user_id % 2 AS BIGINT) AS treated,
                   CASE WHEN 2 * date_diff('day', b.min_day,
                                           CAST(e.ts AS DATE)) >= b.span
                        THEN 1 ELSE 0 END AS post,
                   e.value
            FROM events e CROSS JOIN bounds b
        ),
        cells AS (
            SELECT treated, post,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s
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
               CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE) AS m_t_post,
               CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE) AS m_t_pre,
               CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE) AS m_c_post,
               CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE) AS m_c_pre,
               (CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
                - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))
               - (CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
                  - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)) AS did
        FROM wide
    """,
    doc="Difference-in-differences estimator (Card & Krueger 1994 "
    "design): cohort = user_id parity (the events_abtest_ztest "
    "assignment convention), period = first vs second half of the "
    "observation window — the pre/post boundary is derived "
    "RELATIONALLY from the data's own [min, max] day span via an "
    "integer cross-multiplication (2 * days_since_min >= span), so "
    "no scale-factor-dependent date literal exists anywhere (the "
    "derived-* convention). DiD = (m_t,post - m_t,pre) - (m_c,post "
    "- m_c,pre), each mean a single division of a DECIMAL-detour "
    "sum by an exact count. One grouped pass to 4 cells + a 4-row "
    "pivot; the bounds relation is a broadcast scalar.",
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("min_day"),
        F.datediff(
            F.max(F.col("ts").cast("date")), F.min(F.col("ts").cast("date"))
        ).alias("span"),
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2).cast("long").alias("treated"),
        F.when(
            2 * F.datediff(F.col("ts").cast("date"), F.col("min_day"))
            >= F.col("span"),
            1,
        )
        .otherwise(0)
        .alias("post"),
        "value",
    )
    cells = tagged.groupBy("treated", "post").agg(
        F.count("*").cast("long").alias("n"), dsum(F.col("value")).alias("s")
    )
    wide = cells.agg(
        *[
            F.max(
                F.when((F.col("treated") == t) & (F.col("post") == p), F.col(c))
            ).alias(f"{c}_{'t' if t else 'c'}{p}")
            for c in ("n", "s")
            for t in (1, 0)
            for p in (1, 0)
        ]
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")  # noqa: E731
    return wide.select(
        "n_t1",
        "n_t0",
        "n_c1",
        "n_c0",
        mean("s_t1", "n_t1").alias("m_t_post"),
        mean("s_t0", "n_t0").alias("m_t_pre"),
        mean("s_c1", "n_c1").alias("m_c_post"),
        mean("s_c0", "n_c0").alias("m_c_pre"),
        (
            (mean("s_t1", "n_t1") - mean("s_t0", "n_t0"))
            - (mean("s_c1", "n_c1") - mean("s_c0", "n_c0"))
        ).alias("did"),
    )
