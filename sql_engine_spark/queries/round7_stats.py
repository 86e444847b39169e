"""Round-7 statistical-test operators: rank-based two-sample tests
(Mann-Whitney U, Kolmogorov-Smirnov), a chi-square independence test,
Benford first-digit profiling, autocorrelation, the Theil-Sen robust
trend, and exact distinct counting via mergeable word bitmaps.

Scale discipline (the house rules): every corpus-sized rank runs
through the two-level bucketed scan (operators/prefix) — no global
single-task window anywhere; reductions over doubles go through
DECIMAL (functions/numeric); test statistics avoid libm transcendentals
in hashed outputs (sqrt is IEEE-correctly-rounded and therefore safe;
log is not — Benford's expected shares are Python-computed literals
embedded identically in both engines).

Reference parity note: the reference engine (dylan-p-wong/sql-engine)
has min/max/sum/count/avg only (src/executor/aggregation.rs:168-427);
everything here extends the analytics surface far beyond it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

_MWU_A, _MWU_B = "purchase", "click"


@register(
    "agg_mannwhitney_u",
    oracle=f"""
        WITH s AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('{_MWU_A}', '{_MWU_B}')
        ),
        r AS (
            SELECT event_type,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rk
            FROM s
        ),
        g AS (
            SELECT CAST(SUM(CASE WHEN event_type = '{_MWU_A}' THEN rk
                                 ELSE 0 END) AS BIGINT) AS r_a,
                   CAST(COUNT(CASE WHEN event_type = '{_MWU_A}' THEN 1 END)
                        AS BIGINT) AS n_a,
                   CAST(COUNT(CASE WHEN event_type = '{_MWU_B}' THEN 1 END)
                        AS BIGINT) AS n_b
            FROM r
        ),
        u AS (
            SELECT n_a, n_b, r_a,
                   r_a - ((n_a * (n_a + 1)) // 2) AS u_a
            FROM g
        )
        SELECT n_a, n_b, r_a, u_a, (n_a * n_b) - u_a AS u_b,
               (CAST(u_a AS DOUBLE)
                - (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / 2.0)
               / sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                       * CAST(n_a + n_b + 1 AS DOUBLE)) / 12.0) AS z
        FROM u
    """,
    doc="Mann-Whitney U test comparing the value distributions of the "
    "purchase vs click cohorts (Mann & Whitney 1947): U from the rank "
    "sum of cohort A in the COMBINED ordering, plus the normal-"
    "approximation z. The combined ranking is the bucketed two-level "
    "scan with an empty partition key — parallel width is the bucket "
    "count, so no global single-task sort exists at any scale; the "
    "rank sums are exact integer aggregates. Ties are broken "
    "deterministically by event_id (values are continuous doubles; "
    "the midrank correction is deliberately omitted and documented — "
    "both engines share the spelling, so the gate is exact). z uses "
    "only *, /, sqrt — all IEEE-exact-rounded, hash-safe.",
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(_MWU_A, _MWU_B))
        .select("event_id", "event_type", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="__rank",
    )
    g = ranked.agg(
        F.sum(F.when(F.col("event_type") == _MWU_A, F.col("__rank")).otherwise(0))
        .cast("long")
        .alias("r_a"),
        F.count(F.when(F.col("event_type") == _MWU_A, F.lit(1)))
        .cast("long")
        .alias("n_a"),
        F.count(F.when(F.col("event_type") == _MWU_B, F.lit(1)))
        .cast("long")
        .alias("n_b"),
    )
    u = g.withColumn("u_a", F.expr("r_a - ((n_a * (n_a + 1)) div 2)"))
    return u.select(
        "n_a",
        "n_b",
        "r_a",
        "u_a",
        (F.col("n_a") * F.col("n_b") - F.col("u_a")).alias("u_b"),
        (
            (
                F.col("u_a").cast("double")
                - (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
                / F.lit(2.0)
            )
            / F.sqrt(
                (
                    F.col("n_a").cast("double")
                    * F.col("n_b").cast("double")
                    * (F.col("n_a") + F.col("n_b") + 1).cast("double")
                )
                / F.lit(12.0)
            )
        ).alias("z"),
    )


@register(
    "agg_ks_two_sample",
    oracle=f"""
        WITH s AS (
            SELECT event_id, value,
                   CASE WHEN event_type = '{_MWU_A}' THEN 1 ELSE 0 END AS ia
            FROM events
            WHERE event_type IN ('{_MWU_A}', '{_MWU_B}')
        ),
        c AS (
            SELECT CAST(SUM(ia) AS BIGINT) AS n_a,
                   CAST(SUM(1 - ia) AS BIGINT) AS n_b
            FROM s
        ),
        r AS (
            SELECT CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rk,
                   CAST(SUM(ia) OVER (ORDER BY value, event_id
                                      ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_a
            FROM s
        )
        SELECT n_a, n_b,
               CAST(MAX(abs(cum_a * n_b - (rk - cum_a) * n_a)) AS BIGINT)
                   AS d_num,
               CAST(MAX(abs(cum_a * n_b - (rk - cum_a) * n_a)) AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d_stat,
               CAST(MAX(abs(cum_a * n_b - (rk - cum_a) * n_a)) AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                 > CAST(1.358 AS DOUBLE)
                   * sqrt(CAST(n_a + n_b AS DOUBLE)
                          / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
                   AS reject_95
        FROM r CROSS JOIN c
        GROUP BY n_a, n_b
    """,
    doc="Two-sample Kolmogorov-Smirnov test (purchase vs click values): "
    "D = max |ECDF_a - ECDF_b|, evaluated at the right limit of every "
    "observation in the combined ordering. The supremum search is "
    "EXACT-INTEGER: at rank rk with cum_a A-observations seen, "
    "|A/n_a - (rk-A)/n_b| maximizes exactly where |A*n_b - (rk-A)*n_a| "
    "does, so D's numerator is an integer max and the only division "
    "happens once at the end — no float comparisons inside the scan. "
    "Both the rank and the cumulative cohort count come from the "
    "bucketed two-level scan (empty partition key, bucket-wide "
    "parallelism); the 1.358 factor is the alpha=0.05 asymptotic "
    "critical value (Smirnov), embedded as the same literal in both "
    "engines.",
)
def agg_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(_MWU_A, _MWU_B))
        .select(
            "event_id",
            "value",
            F.when(F.col("event_type") == _MWU_A, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("__ia"),
        )
    )
    n = ev.count()
    ranked = bucketed_value_rank(
        ev, part_cols=[], value_col="value", tie_col="event_id",
        n_rows=n, out_col="__rank",
    )
    cum = bucketed_value_rank(
        _persist(ranked),
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=n,
        out_col="__cum_a",
        weight_col="__ia",
    )
    counts = ev.agg(
        F.sum("__ia").cast("long").alias("n_a"),
        F.sum(F.lit(1) - F.col("__ia")).cast("long").alias("n_b"),
    )
    scored = cum.crossJoin(F.broadcast(counts)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("__cum_a") * F.col("n_b")
            - (F.col("__rank") - F.col("__cum_a")) * F.col("n_a")
        ).alias("__dev"),
    )
    agg = scored.groupBy("n_a", "n_b").agg(
        F.max("__dev").cast("long").alias("d_num")
    )
    d = F.col("d_num").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    crit = F.lit(1.358).cast("double") * F.sqrt(
        (F.col("n_a") + F.col("n_b")).cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return agg.select(
        "n_a", "n_b", "d_num", d.alias("d_stat"), (d > crit).alias("reject_95")
    )


@register(
    "agg_chi2_independence",
    oracle=f"""
        WITH cells AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
            FROM documents GROUP BY lang, source
        ),
        rt AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS rtot FROM cells GROUP BY lang),
        ct AS (SELECT source, CAST(SUM(o) AS BIGINT) AS ctot FROM cells GROUP BY source),
        n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                     CAST(COUNT(DISTINCT lang) AS BIGINT) AS r_levels,
                     CAST(COUNT(DISTINCT source) AS BIGINT) AS c_levels
              FROM cells),
        terms AS (
            SELECT n.n, n.r_levels, n.c_levels,
                   (CAST(o AS DOUBLE)
                    - (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE))
                      / CAST(n.n AS DOUBLE))
                   * (CAST(o AS DOUBLE)
                      - (CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE))
                        / CAST(n.n AS DOUBLE))
                   / ((CAST(rtot AS DOUBLE) * CAST(ctot AS DOUBLE))
                      / CAST(n.n AS DOUBLE)) AS t
            FROM cells JOIN rt USING (lang) JOIN ct USING (source)
            CROSS JOIN n
        )
        SELECT MIN(n) AS n, MIN(r_levels) AS r_levels,
               MIN(c_levels) AS c_levels,
               {sql_dsum('t')} AS chi2,
               CAST((MIN(r_levels) - 1) * (MIN(c_levels) - 1) AS BIGINT) AS dof,
               sqrt({sql_dsum('t')}
                    / (CAST(MIN(n) AS DOUBLE)
                       * CAST(least(MIN(r_levels), MIN(c_levels)) - 1
                              AS DOUBLE))) AS cramers_v
        FROM terms
    """,
    doc="Chi-square test of independence for the (lang x source) "
    "contingency table, plus Cramer's V effect size — the 'is my "
    "corpus mix confounded' audit (a language concentrated in one "
    "source means lang-balancing silently source-balances too; "
    "curation_source_overlap_matrix sees the same risk through dedup). "
    "One corpus-sized counting aggregate; everything after runs on the "
    "bounded cell relation (langs x sources rows) with expected counts "
    "as shared-order double arithmetic and the cell-term reduction "
    "through DECIMAL (order-independent). Zero-expected cells cannot "
    "occur (cells only exist where o >= 1, so both margins are >= 1).",
)
def agg_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import dsum

    docs = load(spark, sf_dir, "documents")
    cells = _persist(
        docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("o"))
    )
    rt = cells.groupBy("lang").agg(F.sum("o").cast("long").alias("rtot"))
    ct = cells.groupBy("source").agg(F.sum("o").cast("long").alias("ctot"))
    n = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("lang").cast("long").alias("r_levels"),
        F.countDistinct("source").cast("long").alias("c_levels"),
    )
    e = (F.col("rtot").cast("double") * F.col("ctot").cast("double")) / F.col(
        "n"
    ).cast("double")
    terms = (
        cells.join(F.broadcast(rt), "lang")
        .join(F.broadcast(ct), "source")
        .crossJoin(F.broadcast(n))
        .select(
            "n",
            "r_levels",
            "c_levels",
            ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e).alias(
                "t"
            ),
        )
    )
    return terms.agg(
        F.min("n").alias("n"),
        F.min("r_levels").alias("r_levels"),
        F.min("c_levels").alias("c_levels"),
        dsum("t").alias("chi2"),
        ((F.min("r_levels") - 1) * (F.min("c_levels") - 1))
        .cast("long")
        .alias("dof"),
        F.sqrt(
            dsum("t")
            / (
                F.min("n").cast("double")
                * (F.least(F.min("r_levels"), F.min("c_levels")) - 1).cast("double")
            )
        ).alias("cramers_v"),
    )


# Benford expected shares log10(1 + 1/d), computed ONCE in Python and
# embedded as the same decimal literals in both engines (libm log is
# not cross-engine bit-stable; a shared literal is).
_BENFORD = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}


def _first_digit_sql(x: str) -> str:
    """First significant digit of a positive double < 1e9, via threshold
    CASEs and one floor-divide — no log10, no string formatting (double
    -> string rendering differs across engines). Identical text in
    Spark SQL and DuckDB."""
    arms = " ".join(
        f"WHEN {x} >= 1e{k} THEN CAST(floor({x} / 1e{k}) AS BIGINT)"
        for k in range(8, 0, -1)
    )
    return f"(CASE {arms} ELSE CAST(floor({x}) AS BIGINT) END)"


@register(
    "agg_benford_first_digit",
    oracle=f"""
        WITH d AS (
            SELECT {_first_digit_sql('o_totalprice')} AS digit
            FROM orders WHERE o_totalprice >= 1.0
        ),
        c AS (
            SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
        ),
        t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        e(digit, benford_p) AS (VALUES {", ".join(
            f"({d}, CAST({_BENFORD[d]!r} AS DOUBLE))" for d in range(1, 10)
        )})
        SELECT e.digit, COALESCE(c.n, 0) AS n,
               CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.total AS DOUBLE)
                   AS share,
               e.benford_p,
               abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.total AS DOUBLE)
                   - e.benford_p) AS abs_dev
        FROM e LEFT JOIN c ON e.digit = c.digit CROSS JOIN t
    """,
    doc="Benford first-significant-digit profile of order totals vs the "
    "expected log10(1 + 1/d) distribution — the classic synthetic-/"
    "manipulated-data screen (Benford 1938; fraud-audit standard). The "
    "digit extraction is threshold CASEs + one floor-divide (no log10, "
    "no double-to-string formatting — both are cross-engine seams); "
    "the expected shares are Python-computed literals embedded "
    "identically in both engines. One map pass + a 9-row aggregate; "
    "digits absent from the data still emit a row (share 0).",
)
def agg_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = orders.where(F.col("o_totalprice") >= 1.0).select(
        F.expr(_first_digit_sql("o_totalprice")).alias("digit")
    )
    c = d.groupBy("digit").agg(F.count("*").cast("long").alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("total"))
    e = F.broadcast(
        load(spark, sf_dir, "orders")
        .sparkSession.createDataFrame(
            [(dd, _BENFORD[dd]) for dd in range(1, 10)],
            "digit long, benford_p double",
        )
    )
    share = F.coalesce("n", F.lit(0)).cast("double") / F.col("total").cast("double")
    return (
        e.join(c, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            share.alias("share"),
            "benford_p",
            F.abs(share - F.col("benford_p")).alias("abs_dev"),
        )
    )


_ACF_LAGS = (1, 2, 3)


@register(
    "agg_autocorr_daily",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        lags(lag) AS (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}),
        pairs AS (
            SELECT l.lag, a.c AS x, b.c AS y
            FROM daily a JOIN lags l ON TRUE
            JOIN daily b ON b.d = a.d + l.lag
        ),
        m AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                   SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
                   SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
                   SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
            FROM pairs GROUP BY lag
        )
        SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
               (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
        FROM m
    """,
    doc="Autocorrelation of the daily event-count series at lags 1-3 — "
    "the seasonality/momentum screen feeding forecasting choices "
    "(events_seasonality_profile reads weekly structure; this reads "
    "persistence). One corpus-sized counting aggregate to the day "
    "relation; the lag pairing and Pearson moments run on that BOUNDED "
    "relation with integer products summed exactly in DECIMAL(38,0) "
    "(counts can be ~1e9/day at 100 TB, so their squared sums pass "
    "through decimal, not BIGINT), and the correlation assembles from "
    "six exact sums with shared-order double ops + sqrt.",
)
def agg_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _persist(
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        ).agg(F.count("*").cast("long").alias("c"))
    )
    lags = F.broadcast(
        ev.sparkSession.createDataFrame([(k,) for k in _ACF_LAGS], "lag long")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("y"))
    pairs = (
        a.crossJoin(lags).join(b, F.col("db") == F.col("da") + F.col("lag"))
    )
    m = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
    )
    nd = F.col("n_pairs").cast("double")
    return m.select(
        F.col("lag").cast("long").alias("lag"),
        "n_pairs",
        (
            (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / F.sqrt(
                (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
                * (nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
            )
        ).alias("acf"),
    )


@register(
    "agg_theil_sen_trend",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
        slopes AS (
            SELECT a.d AS da, b.d AS db,
                   CAST(b.c - a.c AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
            FROM daily a JOIN daily b ON b.d > a.d
        ),
        r AS (
            SELECT s,
                   CAST(row_number() OVER (ORDER BY s, da, db) AS BIGINT) AS rk,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
            FROM slopes
        ),
        pick AS (
            SELECT n_pairs,
                   MAX(CASE WHEN rk = ((n_pairs - 1) // 2) + 1 THEN s END) AS v_lo,
                   MAX(CASE WHEN rk = least(((n_pairs - 1) // 2) + 2, n_pairs)
                            THEN s END) AS v_hi,
                   (CAST(n_pairs - 1 AS DOUBLE) * 0.5)
                   - floor(CAST(n_pairs - 1 AS DOUBLE) * 0.5) AS frac
            FROM r GROUP BY n_pairs
        )
        SELECT (SELECT n_days FROM nd) AS n_days, n_pairs,
               v_lo + frac * (v_hi - v_lo) AS sen_slope
        FROM pick
    """,
    doc="Theil-Sen robust trend of the daily event-count series: the "
    "median over all pairwise slopes (Theil 1950 / Sen 1968) — immune "
    "to the outlier days that wreck an OLS slope. The corpus collapses "
    "to the day relation in one counting aggregate; the O(days^2) pair "
    "relation and its median rank run over that BOUNDED series (days, "
    "not events — ~37k pairs for a year), so the quadratic stage never "
    "touches corpus-sized data. Slopes are single exact divisions of "
    "integer deltas; the median interpolation uses the shared "
    "two-rank formula (agg_percentile_exact).",
)
def agg_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _persist(
        ev.groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d")
        ).agg(F.count("*").cast("long").alias("c"))
    )
    n_days = daily.agg(F.count("*").cast("long").alias("n_days"))
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("cb"))
    slopes = a.join(b, F.col("db") > F.col("da")).select(
        "da",
        "db",
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / (F.col("db") - F.col("da")).cast("double")
        ).alias("s"),
    )
    # The pair relation is bounded by days^2, so a plain window is the
    # right tool here (the bucketed machinery exists for corpus-sized
    # ranks, not day-sized ones).
    w = Window.orderBy("s", "da", "db")
    r = slopes.select(
        "s",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy()).cast("long").alias("n_pairs"),
    )
    h = (F.col("n_pairs") - 1).cast("double") * F.lit(0.5)
    pick = r.groupBy("n_pairs").agg(
        F.max(
            F.when(F.col("rk") == F.expr("((n_pairs - 1) div 2) + 1"), F.col("s"))
        ).alias("v_lo"),
        F.max(
            F.when(
                F.col("rk")
                == F.least(
                    F.expr("((n_pairs - 1) div 2) + 2"), F.col("n_pairs")
                ),
                F.col("s"),
            )
        ).alias("v_hi"),
    )
    pick = pick.withColumn("frac", h - F.floor(h))
    return pick.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        "n_pairs",
        (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
            "sen_slope"
        ),
    )


@register(
    "agg_bitmap_exact_distinct",
    oracle="""
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """,
    doc="EXACT distinct users per event type via 64-bit word bitmaps — "
    "the roaring-bitmap posture for dense integer keys: rows group to "
    "(type, user_id div 64) words with bit_or(1 << (user_id mod 64)), "
    "then per-type popcount-sum. BOTH aggregation levels are map-side "
    "combinable and MERGEABLE across shards/days (bit_or is "
    "idempotent + associative), which plain COUNT(DISTINCT) is not — "
    "a per-shard bitmap can be unioned into a rollup without "
    "re-touching rows, the same property the HLL sketch trades "
    "accuracy for. The oracle is DuckDB's plain COUNT(DISTINCT): two "
    "entirely different spellings, one answer.",
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    words = ev.groupBy(
        "event_type",
        (F.col("user_id") / 64).cast("long").alias("__w"),
    ).agg(
        F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 64 AS INT)))"
        ).alias("__bits")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("__bits")).cast("long").alias("n_users")
    )
