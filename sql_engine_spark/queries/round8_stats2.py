"""Round-8 statistics set 2: normality / association / paired-test /
diversity / separation / drift / privacy operators, all LOG-FREE.

House discipline (round7_stats / round8_stats module docstrings):
statistics assemble from EXACT INTEGER or DECIMAL-exact sums
(functions/numeric.dsum, ssum for wide-range powers) through
fixed-literal-order double expressions; sqrt is IEEE correctly-rounded
and allowed, libm transcendentals (ln/exp/pow) are NOT — every
operator here is deliberately formulated without them (Simpson instead
of Shannon diversity, Hellinger via sqrt instead of KL/PSI, Jarque-Bera
from raw moments). The reference engine has no statistics surface
(SURVEY.md §2 caps at avg); these extend the LLM-data-pipeline
analytics family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_G1, _G2, _G3 = "click", "purchase", "error"


# ---------------------------------------------------------------------------
# Jarque-Bera normality test
# ---------------------------------------------------------------------------

_JB_MOMENTS_SQL = f"""
        s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2,
                   {sql_ssum('(value * value) * value')} AS s3,
                   {sql_ssum('(value * value) * (value * value)')} AS s4
            FROM events GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n,
                   s1 / CAST(n AS DOUBLE) AS mu,
                   s2 / CAST(n AS DOUBLE) AS r2,
                   s3 / CAST(n AS DOUBLE) AS r3,
                   s4 / CAST(n AS DOUBLE) AS r4
            FROM s
        ),
        c AS (
            SELECT event_type, n,
                   r2 - mu * mu AS m2,
                   r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                   r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                      - 3.0 * mu * mu * mu * mu AS m4
            FROM m
        )"""


@register(
    "agg_jarque_bera",
    oracle=f"""
        WITH {_JB_MOMENTS_SQL},
        g AS (
            SELECT event_type, n,
                   m3 / (m2 * sqrt(m2)) AS g1,
                   m4 / (m2 * m2) - 3.0 AS g2
            FROM c
        )
        SELECT event_type, n, g1 AS skewness, g2 AS excess_kurtosis,
               (CAST(n AS DOUBLE) / 6.0) * (g1 * g1 + (g2 * g2) / 4.0) AS jb_stat,
               (CAST(n AS DOUBLE) / 6.0) * (g1 * g1 + (g2 * g2) / 4.0)
                   > CAST(5.991464547107979 AS DOUBLE) AS reject_95
        FROM g
    """,
    doc="Jarque-Bera normality test per event type: JB = n/6 * "
    "(g1^2 + g2^2/4) from the biased sample skewness g1 = m3/m2^1.5 "
    "and excess kurtosis g2 = m4/m2^2 - 3 (Jarque & Bera 1980). "
    "Moments come from the agg_skew_kurtosis_exact machinery — ONE "
    "map-side-combinable pass collecting s1/s2 via DECIMAL(27,6) and "
    "the wide-range s3/s4 via scaled-integer ssum, closed-form central "
    "moments in one shared double op order. The 95% cutoff is the "
    "chi2(2) quantile embedded as a Python-computed literal (libm-free "
    "house rule); sqrt is IEEE-exact. Scale: one aggregate over any "
    "corpus size.",
)
def agg_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        dsum(v).alias("s1"),
        dsum(v * v).alias("s2"),
        ssum((v * v) * v).alias("s3"),
        ssum((v * v) * (v * v)).alias("s4"),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "n",
        (F.col("s1") / nD).alias("mu"),
        (F.col("s2") / nD).alias("r2"),
        (F.col("s3") / nD).alias("r3"),
        (F.col("s4") / nD).alias("r4"),
    )
    mu = F.col("mu")
    c = m.select(
        "event_type",
        "n",
        (F.col("r2") - mu * mu).alias("m2"),
        (F.col("r3") - F.lit(3.0) * mu * F.col("r2") + F.lit(2.0) * mu * mu * mu).alias(
            "m3"
        ),
        (
            F.col("r4")
            - F.lit(4.0) * mu * F.col("r3")
            + F.lit(6.0) * mu * mu * F.col("r2")
            - F.lit(3.0) * mu * mu * mu * mu
        ).alias("m4"),
    )
    m2 = F.col("m2")
    g = c.select(
        "event_type",
        "n",
        (F.col("m3") / (m2 * F.sqrt(m2))).alias("g1"),
        (F.col("m4") / (m2 * m2) - F.lit(3.0)).alias("g2"),
    )
    jb = (F.col("n").cast("double") / F.lit(6.0)) * (
        F.col("g1") * F.col("g1") + (F.col("g2") * F.col("g2")) / F.lit(4.0)
    )
    return g.select(
        "event_type",
        "n",
        F.col("g1").alias("skewness"),
        F.col("g2").alias("excess_kurtosis"),
        jb.alias("jb_stat"),
        (jb > F.lit(5.991464547107979)).alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Levene's test (mean-centered)
# ---------------------------------------------------------------------------


def _lv_between(i: str) -> str:
    return (
        f"(CAST(n_{i} AS DOUBLE) * ((s_{i} / CAST(n_{i} AS DOUBLE)) - gm)"
        f" * ((s_{i} / CAST(n_{i} AS DOUBLE)) - gm))"
    )


def _lv_within(i: str) -> str:
    return f"(q_{i} - ((s_{i} * s_{i}) / CAST(n_{i} AS DOUBLE)))"


@register(
    "agg_levene_mean",
    oracle=f"""
        WITH s AS (
            SELECT event_type, value FROM events
            WHERE event_type IN ('{_G1}', '{_G2}', '{_G3}')
        ),
        mu AS (
            SELECT event_type,
                   {sql_dsum('value')} / CAST(COUNT(*) AS DOUBLE) AS mean_v
            FROM s GROUP BY event_type
        ),
        z AS (
            SELECT s.event_type, abs(s.value - mu.mean_v) AS z
            FROM s JOIN mu USING (event_type)
        ),
        g AS (
            SELECT
                CAST(COUNT(CASE WHEN event_type = '{_G1}' THEN 1 END)
                     AS BIGINT) AS n_1,
                CAST(COUNT(CASE WHEN event_type = '{_G2}' THEN 1 END)
                     AS BIGINT) AS n_2,
                CAST(COUNT(CASE WHEN event_type = '{_G3}' THEN 1 END)
                     AS BIGINT) AS n_3,
                {sql_dsum(f"CASE WHEN event_type = '{_G1}' THEN z ELSE 0.0 END")} AS s_1,
                {sql_dsum(f"CASE WHEN event_type = '{_G2}' THEN z ELSE 0.0 END")} AS s_2,
                {sql_dsum(f"CASE WHEN event_type = '{_G3}' THEN z ELSE 0.0 END")} AS s_3,
                {sql_ssum(f"CASE WHEN event_type = '{_G1}' THEN z * z ELSE 0.0 END")} AS q_1,
                {sql_ssum(f"CASE WHEN event_type = '{_G2}' THEN z * z ELSE 0.0 END")} AS q_2,
                {sql_ssum(f"CASE WHEN event_type = '{_G3}' THEN z * z ELSE 0.0 END")} AS q_3
            FROM z
        ),
        f AS (
            SELECT n_1, n_2, n_3, s_1, s_2, s_3, q_1, q_2, q_3,
                   (s_1 + s_2 + s_3)
                       / CAST(n_1 + n_2 + n_3 AS DOUBLE) AS gm
            FROM g
        )
        SELECT n_1, n_2, n_3,
               (({_lv_between('1')} + {_lv_between('2')} + {_lv_between('3')})
                   / 2.0)
               / (({_lv_within('1')} + {_lv_within('2')} + {_lv_within('3')})
                  / CAST(n_1 + n_2 + n_3 - 3 AS DOUBLE)) AS levene_w
        FROM f
    """,
    doc="Levene's homogeneity-of-variance test with MEAN centering "
    "(Levene 1960) across the click/purchase/error value cohorts — "
    "the companion to agg_brown_forsythe (median centering), sharing "
    "its exact assembly: one-way ANOVA F on z = |x - mean_g|, group "
    "means from a DECIMAL-exact pivoted pass joined back broadcast, "
    "deviation sums through dsum and their squares through shared-IEEE "
    "ssum, the F statistic in one fixed-literal-order k=3 expression. "
    "Rank-free (no median scan) — the cheap-at-scale variant, trading "
    "the median center's robustness for a two-aggregate plan.",
)
def agg_levene_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        F.col("event_type").isin(_G1, _G2, _G3)
    )
    mu = ev.groupBy("event_type").agg(
        (dsum(F.col("value")) / F.count("*").cast("double")).alias("mean_v")
    )
    z = ev.join(F.broadcast(mu), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("mean_v")).alias("z")
    )
    zz = F.col("z") * F.col("z")

    def _case(g, c):
        return F.when(F.col("event_type") == g, c).otherwise(F.lit(0.0))

    g = z.agg(
        F.count(F.when(F.col("event_type") == _G1, 1)).cast("long").alias("n_1"),
        F.count(F.when(F.col("event_type") == _G2, 1)).cast("long").alias("n_2"),
        F.count(F.when(F.col("event_type") == _G3, 1)).cast("long").alias("n_3"),
        dsum(_case(_G1, F.col("z"))).alias("s_1"),
        dsum(_case(_G2, F.col("z"))).alias("s_2"),
        dsum(_case(_G3, F.col("z"))).alias("s_3"),
        ssum(_case(_G1, zz)).alias("q_1"),
        ssum(_case(_G2, zz)).alias("q_2"),
        ssum(_case(_G3, zz)).alias("q_3"),
    )
    f = g.withColumn(
        "gm",
        (F.col("s_1") + F.col("s_2") + F.col("s_3"))
        / (F.col("n_1") + F.col("n_2") + F.col("n_3")).cast("double"),
    )

    def _between(i: str):
        nD = F.col(f"n_{i}").cast("double")
        d = (F.col(f"s_{i}") / nD) - F.col("gm")
        return nD * d * d

    def _within(i: str):
        return F.col(f"q_{i}") - (
            (F.col(f"s_{i}") * F.col(f"s_{i}")) / F.col(f"n_{i}").cast("double")
        )

    return f.select(
        "n_1",
        "n_2",
        "n_3",
        (
            ((_between("1") + _between("2") + _between("3")) / F.lit(2.0))
            / (
                (_within("1") + _within("2") + _within("3"))
                / (F.col("n_1") + F.col("n_2") + F.col("n_3") - 3).cast("double")
            )
        ).alias("levene_w"),
    )


# ---------------------------------------------------------------------------
# Cramér's V (with Bergsma bias correction)
# ---------------------------------------------------------------------------


@register(
    "agg_cramers_v",
    oracle="""
        WITH o AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM o GROUP BY lang),
        ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM o GROUP BY source),
        n AS (
            SELECT CAST(SUM(o) AS BIGINT) AS n,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS r_lvls,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS c_lvls
            FROM o
        ),
        chi AS (
            SELECT (CAST(SUM(CAST(round(((CAST(o.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE)) * (CAST(o.o AS DOUBLE) - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE)) / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST((SELECT n FROM n) AS DOUBLE))) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS chi2
            FROM o JOIN rt USING (lang) JOIN ct USING (source)
        )
        SELECT n.n, n.r_lvls, n.c_lvls, chi.chi2,
               sqrt(chi.chi2 / (CAST(n.n AS DOUBLE)
                    * CAST(least(n.r_lvls - 1, n.c_lvls - 1) AS DOUBLE)))
                   AS cramers_v,
               sqrt(
                 greatest(CAST(0.0 AS DOUBLE),
                   chi.chi2 / CAST(n.n AS DOUBLE)
                   - CAST((n.r_lvls - 1) * (n.c_lvls - 1) AS DOUBLE)
                     / (CAST(n.n AS DOUBLE) - 1.0))
                 / CAST(least(
                     n.r_lvls - 1, n.c_lvls - 1) AS DOUBLE))
                   AS cramers_v_corrected
        FROM n, chi
    """,
    doc="Cramér's V association strength for the (lang x source) "
    "contingency of the documents table, plus the Bergsma-corrected "
    "variant (Bergsma 2013) with phi2 debiased by (r-1)(c-1)/(n-1) "
    "and floored at 0 — reported with the SAME denominator "
    "min(r-1, c-1) so the two columns are directly comparable (the "
    "full Bergsma row/col shrinkage is a documented deviation not "
    "taken, keeping the expression libm-free). chi2 assembles from "
    "the bounded contingency relation (integer observed counts, "
    "expected = row*col/n in one shared double order); the three "
    "aggregates are map-side combinable and the final algebra runs on "
    "a bounded (levels^2) relation. sqrt IEEE-exact.",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("o"))
    rt = o.groupBy("lang").agg(F.sum("o").cast("long").alias("r"))
    ct = o.groupBy("source").agg(F.sum("o").cast("long").alias("c"))
    n = o.agg(
        F.sum("o").cast("long").alias("n"),
    ).crossJoin(
        rt.agg(F.count("*").cast("long").alias("r_lvls"))
    ).crossJoin(ct.agg(F.count("*").cast("long").alias("c_lvls")))
    joined = (
        o.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
    )
    exp = F.col("r").cast("double") * F.col("c").cast("double") / F.col("n").cast(
        "double"
    )
    # The chi2 fold crosses engines via ssum: a plain double SUM is
    # partial-aggregation-order-dependent.
    chi = joined.groupBy("n", "r_lvls", "c_lvls").agg(
        ssum(
            (F.col("o").cast("double") - exp)
            * (F.col("o").cast("double") - exp)
            / exp
        ).alias("chi2")
    )
    nD = F.col("n").cast("double")
    kmin = F.least(F.col("r_lvls") - 1, F.col("c_lvls") - 1).cast("double")
    phi2_corr = F.greatest(
        F.lit(0.0),
        F.col("chi2") / nD
        - ((F.col("r_lvls") - 1) * (F.col("c_lvls") - 1)).cast("double")
        / (nD - F.lit(1.0)),
    )
    return chi.select(
        "n",
        "r_lvls",
        "c_lvls",
        "chi2",
        F.sqrt(F.col("chi2") / (nD * kmin)).alias("cramers_v"),
        F.sqrt(phi2_corr / kmin).alias("cramers_v_corrected"),
    )


# ---------------------------------------------------------------------------
# McNemar's paired test
# ---------------------------------------------------------------------------


@register(
    "agg_mcnemar",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id,
                   (lang = 'en') AS truth,
                   list_contains(string_split_regex(lower(trim(text)), '\s+'), 'the')
                       AS pred_a,
                   list_contains(string_split_regex(lower(trim(text)), '\s+'), 'and')
                       AS pred_b
            FROM documents
        ),
        cells AS (
            SELECT
                CAST(SUM(CASE WHEN (pred_a = truth) AND (pred_b <> truth)
                              THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN (pred_a <> truth) AND (pred_b = truth)
                              THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(COUNT(*) AS BIGINT) AS n
            FROM toks
        )
        SELECT n, b, c,
               CASE WHEN b + c = 0 THEN CAST(0.0 AS DOUBLE)
                    ELSE (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
                         * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
                         / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE)) END
                   AS mcnemar_chi2,
               CASE WHEN b + c = 0 THEN FALSE
                    ELSE (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
                         * (abs(CAST(b AS DOUBLE) - CAST(c AS DOUBLE)) - 1.0)
                         / (CAST(b AS DOUBLE) + CAST(c AS DOUBLE))
                         > CAST(3.841458820694124 AS DOUBLE) END
                   AS reject_95
        FROM cells
    """,
    doc="McNemar's test (continuity-corrected, McNemar 1947) comparing "
    "two language-ID heuristics on the SAME documents — the paired "
    "design every A/B model comparison on a shared eval set needs "
    "(marginal accuracies alone cannot tell whether B beats A on the "
    "same rows): classifier A = contains token 'the', B = contains "
    "'and', truth = lang = 'en'; only the DISCORDANT cells b (A right, "
    "B wrong) and c (A wrong, B right) enter chi2 = (|b-c|-1)^2 / "
    "(b+c). Tokenization is the shared house tokenizer so the "
    "predicate is spelled identically in both engines; one aggregate "
    "pass, chi2(1) 95% cutoff as a Python literal.",
)
def agg_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.textprep import tokens

    docs = load(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("truth"),
        tokens("text").alias("__t"),
    )
    t = docs.select(
        "truth",
        F.array_contains("__t", "the").alias("pred_a"),
        F.array_contains("__t", "and").alias("pred_b"),
    )
    cells = t.agg(
        F.sum(
            F.when(
                (F.col("pred_a") == F.col("truth"))
                & (F.col("pred_b") != F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("b"),
        F.sum(
            F.when(
                (F.col("pred_a") != F.col("truth"))
                & (F.col("pred_b") == F.col("truth")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("c"),
        F.count("*").cast("long").alias("n"),
    )
    bD, cD = F.col("b").cast("double"), F.col("c").cast("double")
    stat = (F.abs(bD - cD) - F.lit(1.0)) * (F.abs(bD - cD) - F.lit(1.0)) / (bD + cD)
    zero = (F.col("b") + F.col("c")) == 0
    return cells.select(
        "n",
        "b",
        "c",
        F.when(zero, F.lit(0.0)).otherwise(stat).alias("mcnemar_chi2"),
        F.when(zero, F.lit(False))
        .otherwise(stat > F.lit(3.841458820694124))
        .alias("reject_95"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity (log-free diversity index)
# ---------------------------------------------------------------------------


@register(
    "agg_simpson_diversity",
    oracle="""
        WITH c AS (
            SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_i
            FROM documents GROUP BY source, lang
        ),
        s AS (
            SELECT source,
                   CAST(SUM(n_i) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_langs,
                   CAST(SUM(n_i * (n_i - 1)) AS BIGINT) AS pairs_same
            FROM c GROUP BY source
        )
        SELECT source, n, n_langs,
               CAST(pairs_same AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS simpson_l,
               1.0 - CAST(pairs_same AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS gini_simpson,
               CASE WHEN pairs_same = 0 THEN CAST(NULL AS DOUBLE)
                    ELSE (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                         / CAST(pairs_same AS DOUBLE) END AS effective_langs
        FROM s
    """,
    doc="Simpson diversity of the language mix per source — the "
    "LOG-FREE diversity index (Simpson 1949, unbiased finite-sample "
    "form): lambda = sum n_i(n_i-1) / (N(N-1)) is the probability two "
    "draws without replacement share a language, 1-lambda the "
    "Gini-Simpson index, 1/lambda the effective language count — the "
    "mixture-balance dashboard a multilingual curation run tracks "
    "(Shannon entropy says the same thing but costs a cross-engine "
    "libm ln; lambda is an exact integer ratio). Two map-side "
    "combinable aggregates on bounded (source, lang) levels.",
)
def agg_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("source", "lang").agg(F.count("*").cast("long").alias("n_i"))
    s = c.groupBy("source").agg(
        F.sum("n_i").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_langs"),
        F.sum(F.col("n_i") * (F.col("n_i") - 1)).cast("long").alias("pairs_same"),
    )
    nD = F.col("n").cast("double")
    lam = F.col("pairs_same").cast("double") / (nD * (nD - F.lit(1.0)))
    return s.select(
        "source",
        "n",
        "n_langs",
        lam.alias("simpson_l"),
        (F.lit(1.0) - lam).alias("gini_simpson"),
        F.when(F.col("pairs_same") == 0, F.lit(None).cast("double"))
        .otherwise((nD * (nD - F.lit(1.0))) / F.col("pairs_same").cast("double"))
        .alias("effective_langs"),
    )


# ---------------------------------------------------------------------------
# KS separation statistic (score-power audit)
# ---------------------------------------------------------------------------


@register(
    "quality_ks_separation",
    oracle="""
        WITH d AS (
            SELECT n_chars AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        per AS (
            SELECT score,
                   CAST(SUM(y) AS BIGINT) AS c_pos,
                   CAST(SUM(1 - y) AS BIGINT) AS c_neg
            FROM d GROUP BY score
        ),
        cum AS (
            SELECT score,
                   CAST(SUM(c_pos) OVER (ORDER BY score) AS BIGINT) AS cum_pos,
                   CAST(SUM(c_neg) OVER (ORDER BY score) AS BIGINT) AS cum_neg,
                   (SELECT CAST(SUM(c_pos) AS BIGINT) FROM per) AS n_pos,
                   (SELECT CAST(SUM(c_neg) AS BIGINT) FROM per) AS n_neg
            FROM per
        ),
        gap AS (
            SELECT score,
                   abs(CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE)
                     - CAST(cum_neg AS DOUBLE) / CAST(n_neg AS DOUBLE)) AS g,
                   n_pos, n_neg
            FROM cum
        )
        SELECT n_pos, n_neg,
               MAX(g) AS ks_stat,
               CAST(MIN(CASE WHEN g = (SELECT MAX(g) FROM gap)
                             THEN score END) AS BIGINT) AS ks_cut_score
        FROM gap GROUP BY n_pos, n_neg
    """,
    doc="Kolmogorov-Smirnov separation of a score between classes — "
    "the credit-scoring 'KS statistic' (max vertical CDF gap between "
    "positives and negatives), here on score = n_chars, y = lang='en' "
    "(the quality_roc_auc fixture, so AUC/Gini and KS read side by "
    "side): group by score VALUE (bounded distinct relation), one "
    "cumulative window over that bounded relation — never a corpus "
    "window — gap = |F1 - F0| per cut, max plus the smallest argmax "
    "cut score (deterministic tie-break). All ratios are integer "
    "divisions in one shared double order.",
)
def quality_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    per = docs.groupBy("score").agg(
        F.sum("y").cast("long").alias("c_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("c_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    tot = per.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        F.sum("c_neg").cast("long").alias("n_neg"),
    )
    cum = per.select(
        "score",
        F.sum("c_pos").over(w).cast("long").alias("cum_pos"),
        F.sum("c_neg").over(w).cast("long").alias("cum_neg"),
    ).crossJoin(F.broadcast(tot))
    gap = cum.select(
        "score",
        "n_pos",
        "n_neg",
        F.abs(
            F.col("cum_pos").cast("double") / F.col("n_pos").cast("double")
            - F.col("cum_neg").cast("double") / F.col("n_neg").cast("double")
        ).alias("g"),
    )
    mx = gap.agg(F.max("g").alias("ks_stat"))
    return (
        gap.crossJoin(F.broadcast(mx))
        .where(F.col("g") == F.col("ks_stat"))
        .groupBy("n_pos", "n_neg", "ks_stat")
        .agg(F.min("score").cast("long").alias("ks_cut_score"))
        .select("n_pos", "n_neg", "ks_stat", "ks_cut_score")
    )


# ---------------------------------------------------------------------------
# Hellinger drift between time halves
# ---------------------------------------------------------------------------


@register(
    "quality_hellinger_drift",
    oracle="""
        WITH d AS (
            SELECT event_type,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d
            FROM events
        ),
        mid AS (
            SELECT CAST((MIN(d) + MAX(d)) // 2 AS BIGINT) AS mid FROM d
        ),
        halves AS (
            SELECT event_type,
                   CAST(SUM(CASE WHEN d.d <= mid.mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN d.d > mid.mid THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_b
            FROM d, mid GROUP BY event_type
        ),
        tot AS (
            SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
                   CAST(SUM(n_b) AS BIGINT) AS t_b
            FROM halves
        )
        SELECT tot.t_a AS n_first_half, tot.t_b AS n_second_half,
               (CAST(SUM(CAST(round((sqrt((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)) * (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)))) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0) AS bhattacharyya,
               sqrt(greatest(CAST(0.0 AS DOUBLE),
                    1.0 - (CAST(SUM(CAST(round((sqrt((CAST(n_a AS DOUBLE) / CAST(t_a AS DOUBLE)) * (CAST(n_b AS DOUBLE) / CAST(t_b AS DOUBLE)))) * 1000000.0) AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0))) AS hellinger
        FROM halves, tot
        GROUP BY tot.t_a, tot.t_b
    """,
    doc="Hellinger drift of the event-type mix between the first and "
    "second half of the time range (split at the midpoint day, an "
    "integer derived from one min/max aggregate): Bhattacharyya "
    "coefficient BC = sum sqrt(p_i q_i), Hellinger distance "
    "H = sqrt(1 - BC) — the LOG-FREE drift metric (KL and PSI need "
    "libm ln; sqrt is IEEE correctly-rounded, and its arguments are "
    "products of integer-count ratios in one shared op order, so H "
    "crosses engines exactly). Companion to text_source_drift_tv "
    "(total variation): TV bounds, Hellinger weights small-mass "
    "changes more. Bounded (event_type) relation after one counting "
    "pass.",
)
def quality_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d"),
    )
    mid = ev.agg(
        F.floor((F.min("d") + F.max("d")) / 2).cast("long").alias("mid")
    )
    halves = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("d") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    tot = halves.agg(
        F.sum("n_a").cast("long").alias("t_a"),
        F.sum("n_b").cast("long").alias("t_b"),
    )
    j = halves.crossJoin(F.broadcast(tot))
    # The Bhattacharyya fold crosses engines (and partitionings) via
    # ssum: a plain double SUM is partial-aggregation-order-dependent
    # even on a bounded relation.
    bc = ssum(
        F.sqrt(
            (F.col("n_a").cast("double") / F.col("t_a").cast("double"))
            * (F.col("n_b").cast("double") / F.col("t_b").cast("double"))
        )
    )
    return j.groupBy("t_a", "t_b").agg(
        bc.alias("bhattacharyya"),
        F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)).alias("hellinger"),
    ).select(
        F.col("t_a").alias("n_first_half"),
        F.col("t_b").alias("n_second_half"),
        "bhattacharyya",
        "hellinger",
    )


# ---------------------------------------------------------------------------
# t-closeness (ordered EMD)
# ---------------------------------------------------------------------------

_TC_BUCKET = "least(CAST(n_chars // 500 AS BIGINT), 7)"
_TC_T = "0.2"


@register(
    "privacy_t_closeness",
    oracle=f"""
        WITH d AS (
            SELECT lang, source, {_TC_BUCKET} AS b FROM documents
        ),
        buckets(b) AS (
            SELECT * FROM range(0, 8)
        ),
        gdist AS (
            SELECT buckets.b,
                   CAST(COUNT(d.b) AS BIGINT) AS n_g,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_tot
            FROM buckets LEFT JOIN d ON d.b = buckets.b
            GROUP BY buckets.b
        ),
        grp AS (
            SELECT g.lang, g.source, buckets.b,
                   CAST(COUNT(d.b) AS BIGINT) AS n_i,
                   g.n_rows
            FROM (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_rows
                  FROM d GROUP BY lang, source) g
            CROSS JOIN buckets
            LEFT JOIN d ON d.lang = g.lang AND d.source = g.source
                       AND d.b = buckets.b
            GROUP BY g.lang, g.source, buckets.b, g.n_rows
        ),
        diffs AS (
            SELECT grp.lang, grp.source, grp.b, grp.n_rows,
                   CAST(SUM(CAST(round(
                       (CAST(grp.n_i AS DOUBLE) / CAST(grp.n_rows AS DOUBLE)
                        - CAST(gdist.n_g AS DOUBLE) / CAST(gdist.n_tot AS DOUBLE))
                       * 1000000000.0) AS DECIMAL(38,0)))
                       OVER (PARTITION BY grp.lang, grp.source
                             ORDER BY grp.b) AS DOUBLE)
                       / 1000000000.0 AS cum_diff
            FROM grp JOIN gdist ON grp.b = gdist.b
        )
        SELECT lang, source, n_rows,
               {sql_ssum('abs(cum_diff)', scale='1000000000.0')} / 7.0 AS emd,
               {sql_ssum('abs(cum_diff)', scale='1000000000.0')} / 7.0
                   > CAST({_TC_T} AS DOUBLE) AS violates_t
        FROM diffs GROUP BY lang, source, n_rows
    """,
    doc="t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) "
    "for quasi-identifier groups (lang, source) against the ORDERED "
    "sensitive attribute 'document size bucket' (fixed-width buckets "
    "least(n_chars/500, 7) — deterministic, rank-free): the distance "
    "is the 1-D earth-mover's distance for ordered categories, "
    "EMD = sum |cumsum(p_i - q_i)| / (k-1), group vs global. "
    "Completes the privacy family (k-anonymity counts, l-diversity "
    "levels): a group can be k-anonymous and l-diverse while its size "
    "distribution still leaks (EMD > t). The bucket spine is a "
    "broadcast 8-row literal relation so empty buckets count as "
    "zero mass in BOTH engines; the cumulative window runs over 8 "
    "rows per group. Flag at t = 0.2.",
)
def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.least(F.floor(F.col("n_chars") / 500), F.lit(7)).cast("long").alias("b"),
    )
    spine = spark.range(0, 8).select(F.col("id").alias("b"))
    tot = docs.agg(F.count("*").cast("long").alias("n_tot"))
    glob = (
        spine.join(
            docs.groupBy("b").agg(F.count("*").cast("long").alias("n_g")),
            "b",
            "left",
        )
        .select("b", F.coalesce("n_g", F.lit(0)).cast("long").alias("n_g"))
        .crossJoin(F.broadcast(tot))
    )
    grp_sizes = docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_rows")
    )
    grp_counts = docs.groupBy("lang", "source", "b").agg(
        F.count("*").cast("long").alias("n_i")
    )
    grp = (
        grp_sizes.crossJoin(F.broadcast(spine))
        .join(grp_counts, ["lang", "source", "b"], "left")
        .select(
            "lang",
            "source",
            "b",
            "n_rows",
            F.coalesce("n_i", F.lit(0)).cast("long").alias("n_i"),
        )
    )
    w = Window.partitionBy("lang", "source").orderBy("b")
    # Exact cumulative: per-row diffs round to the 1e-9 grain in shared
    # double arithmetic, the running window sums INTEGERS (any frame
    # association order is safe), and one division returns to double —
    # the windowed counterpart of ssum (numeric-folds house rule; a
    # plain double cumsum's association order is engine-dependent).
    diffs = grp.join(F.broadcast(glob), "b").withColumn(
        "cum_diff",
        F.sum(
            F.round(
                (
                    F.col("n_i").cast("double") / F.col("n_rows").cast("double")
                    - F.col("n_g").cast("double") / F.col("n_tot").cast("double")
                )
                * F.lit(1e9)
            ).cast("decimal(38,0)")
        )
        .over(w)
        .cast("double")
        / F.lit(1e9),
    )
    emd = ssum(F.abs(F.col("cum_diff")), scale=1e9) / F.lit(7.0)
    return diffs.groupBy("lang", "source", "n_rows").agg(
        emd.alias("emd"),
        (emd > F.lit(float(_TC_T))).alias("violates_t"),
    )
