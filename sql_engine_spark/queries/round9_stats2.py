"""Round-9 distribution / panel statistics: Cliff's delta (+ Vargha-
Delaney A) effect size, the Friedman test with Kendall's W, Cochran's
Q, the Gini mean difference, Lorenz deciles, the quartile coefficient
of dispersion, and Cronbach's alpha.

House disciplines throughout: corpus ranks go through the bucketed
two-level scan (operators/prefix.bucketed_value_rank — no global
single-task window); every corpus-sized double reduction crosses
engines via dsum/ssum; panel statistics stay in exact integers or
exact dyadic midranks as long as possible; no libm transcendentals
(the statistics here are all rational up to a final sqrt-free
division). The reference engine has min/max/sum/count/avg only
(src/executor/aggregation.rs:168-427).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load, table_row_count
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

_CD_A, _CD_B = "purchase", "click"


# ---------------------------------------------------------------------------
# Cliff's delta / Vargha-Delaney A
# ---------------------------------------------------------------------------


@register(
    "agg_cliffs_delta",
    oracle=f"""
        WITH s AS (
            SELECT event_id, event_type, value FROM events
            WHERE event_type IN ('{_CD_A}', '{_CD_B}')
        ),
        r AS (
            SELECT event_type,
                   CAST(row_number() OVER (ORDER BY value, event_id)
                        AS BIGINT) AS rk
            FROM s
        ),
        g AS (
            SELECT CAST(SUM(CASE WHEN event_type = '{_CD_A}' THEN rk
                                 ELSE 0 END) AS BIGINT) AS r_a,
                   CAST(COUNT(CASE WHEN event_type = '{_CD_A}' THEN 1 END)
                        AS BIGINT) AS n_a,
                   CAST(COUNT(CASE WHEN event_type = '{_CD_B}' THEN 1 END)
                        AS BIGINT) AS n_b
            FROM r
        ),
        u AS (
            SELECT n_a, n_b,
                   r_a - ((n_a * (n_a + 1)) // 2) AS u_a
            FROM g
        ),
        e AS (
            SELECT n_a, n_b, u_a,
                   CAST(u_a AS DOUBLE)
                       / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS vda
            FROM u
        )
        SELECT n_a, n_b, u_a, vda,
               2.0 * vda - 1.0 AS cliffs_delta,
               CASE WHEN abs(2.0 * vda - 1.0) < CAST(0.147 AS DOUBLE)
                         THEN 'negligible'
                    WHEN abs(2.0 * vda - 1.0) < CAST(0.33 AS DOUBLE)
                         THEN 'small'
                    WHEN abs(2.0 * vda - 1.0) < CAST(0.474 AS DOUBLE)
                         THEN 'medium'
                    ELSE 'large' END AS magnitude
        FROM e
    """,
    doc="Cliff's delta (Cliff 1993) and Vargha-Delaney A (2000) — the "
    "nonparametric effect sizes for the purchase-vs-click value "
    "comparison, derived exactly from the same combined bucketed rank "
    "the Mann-Whitney U uses (A = U_a/(n_a n_b), delta = 2A - 1; "
    "ties broken deterministically by event_id, the agg_mannwhitney_u "
    "convention, midranks documented-omitted). Magnitude labels use "
    "the Romano et al. 2006 thresholds (0.147/0.33/0.474), pinned as "
    "CAST(... AS DOUBLE) so neither engine compares against a DECIMAL "
    "literal. The effect-size companion the A/B family "
    "(events_abtest_ztest, agg_mannwhitney_u) reports next to its "
    "p-values — significance without magnitude is the classic "
    "misread. Exact integer rank sums, two divisions.",
)
def agg_cliffs_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.io import count_cached

    ev = _persist(
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin(_CD_A, _CD_B))
        .select("event_id", "event_type", "value")
    )
    # Memoized filtered count (r8 verdict #3 / review finding): n_rows
    # only sizes the rank buckets, and the filtered cardinality is a
    # pure function of the dataset.
    n_rows = count_cached(
        sf_dir, "events", f"type_in_{_CD_A}_{_CD_B}", lambda: ev.count()
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=[],
        value_col="value",
        tie_col="event_id",
        n_rows=n_rows,
        out_col="__rank",
    )
    g = ranked.agg(
        F.sum(F.when(F.col("event_type") == _CD_A, F.col("__rank")).otherwise(0))
        .cast("long")
        .alias("r_a"),
        F.count(F.when(F.col("event_type") == _CD_A, F.lit(1)))
        .cast("long")
        .alias("n_a"),
        F.count(F.when(F.col("event_type") == _CD_B, F.lit(1)))
        .cast("long")
        .alias("n_b"),
    )
    u = g.withColumn("u_a", F.expr("r_a - ((n_a * (n_a + 1)) div 2)"))
    vda = F.col("u_a").cast("double") / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    e = u.select("n_a", "n_b", "u_a", vda.alias("vda"))
    delta = F.lit(2.0) * F.col("vda") - F.lit(1.0)
    return e.select(
        "n_a",
        "n_b",
        "u_a",
        "vda",
        delta.alias("cliffs_delta"),
        F.when(F.abs(delta) < 0.147, "negligible")
        .when(F.abs(delta) < 0.33, "small")
        .when(F.abs(delta) < 0.474, "medium")
        .otherwise("large")
        .alias("magnitude"),
    )


# ---------------------------------------------------------------------------
# Friedman test + Kendall's W (panel: day blocks x event-type treatments)
# ---------------------------------------------------------------------------

_SQL_PANEL = """days AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        types AS (SELECT DISTINCT event_type FROM events),
        panel AS (
            SELECT d.day, t.event_type,
                   CAST(COUNT(e.event_id) AS BIGINT) AS cnt
            FROM days d
            CROSS JOIN types t
            LEFT JOIN events e
              ON CAST(date_trunc('day', e.ts) AS DATE) = d.day
             AND e.event_type = t.event_type
            GROUP BY d.day, t.event_type
        )"""


def _panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete (day, event_type, cnt) panel — the day and type spines
    cross-joined so absent cells count 0 in BOTH engines (the
    privacy_t_closeness spine device)."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    )
    days = ev.select("day").distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("day", "event_type").agg(
        F.count("*").cast("long").alias("c0")
    )
    return (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("c0", F.lit(0)).cast("long").alias("cnt"),
        )
    )


@register(
    "agg_friedman_kendall_w",
    oracle=f"""
        WITH {_SQL_PANEL},
        mr AS (
            SELECT day, event_type,
                   CAST(rank() OVER (PARTITION BY day ORDER BY cnt)
                        AS DOUBLE)
                   + (CAST(COUNT(*) OVER (PARTITION BY day, cnt) AS DOUBLE)
                      - 1.0) / 2.0 AS midrank
            FROM panel
        ),
        rj AS (
            SELECT event_type, SUM(midrank) AS r_j
            FROM mr GROUP BY event_type
        ),
        dims AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM days) AS d
            FROM types
        ),
        s AS (
            SELECT SUM(r_j * r_j) AS sum_r2, dims.k, dims.d
            FROM rj CROSS JOIN dims
            GROUP BY dims.k, dims.d
        )
        SELECT d AS n_blocks, k AS k_treatments,
               12.0 * sum_r2
                   / (CAST(d AS DOUBLE) * CAST(k AS DOUBLE)
                      * CAST(k + 1 AS DOUBLE))
               - 3.0 * CAST(d AS DOUBLE) * CAST(k + 1 AS DOUBLE)
                   AS chi2_friedman,
               (12.0 * sum_r2
                   / (CAST(d AS DOUBLE) * CAST(k AS DOUBLE)
                      * CAST(k + 1 AS DOUBLE))
               - 3.0 * CAST(d AS DOUBLE) * CAST(k + 1 AS DOUBLE))
                   / (CAST(d AS DOUBLE) * CAST(k - 1 AS DOUBLE))
                   AS kendalls_w
        FROM s
    """,
    doc="Friedman rank test (1937) + Kendall's coefficient of "
    "concordance W (= chi2_F / (D (k-1))) on the complete (day x "
    "event-type) activity panel: within each day-block the k "
    "treatment counts take MIDRANKS (rank() + (ties-1)/2 — exact "
    "dyadic halves, so every sum below is exact double arithmetic "
    "with no rounding), R_j column rank-sums feed the classic "
    "12/(Dk(k+1)) SUM R_j^2 - 3D(k+1) statistic. The tie-CORRECTION "
    "denominator is deliberately omitted (documented; both engines "
    "share the spelling — counts on this panel rarely tie). W in "
    "[0,1] reads as 'do the days agree on the event-type ordering' — "
    "the seasonality-robustness check next to "
    "events_seasonality_profile. Panel work is one corpus count "
    "aggregate; everything after runs on the calendar x type grid.",
)
def agg_friedman_kendall_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = _persist(_panel(spark, sf_dir))
    wd = Window.partitionBy("day").orderBy("cnt")
    wt = Window.partitionBy("day", "cnt")
    mr = panel.select(
        "event_type",
        (
            F.rank().over(wd).cast("double")
            + (F.count("*").over(wt).cast("double") - F.lit(1.0)) / F.lit(2.0)
        ).alias("midrank"),
    )
    rj = mr.groupBy("event_type").agg(F.sum("midrank").alias("r_j"))
    dims = panel.agg(
        F.countDistinct("event_type").cast("long").alias("k"),
        F.countDistinct("day").cast("long").alias("d"),
    )
    s = rj.crossJoin(F.broadcast(dims)).groupBy("k", "d").agg(
        F.sum(F.col("r_j") * F.col("r_j")).alias("sum_r2")
    )
    dD = F.col("d").cast("double")
    kD = F.col("k").cast("double")
    chi2 = (
        F.lit(12.0) * F.col("sum_r2") / (dD * kD * (F.col("k") + 1).cast("double"))
        - F.lit(3.0) * dD * (F.col("k") + 1).cast("double")
    )
    return s.select(
        F.col("d").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        chi2.alias("chi2_friedman"),
        (chi2 / (dD * (F.col("k") - 1).cast("double"))).alias("kendalls_w"),
    )


# ---------------------------------------------------------------------------
# Cochran's Q (binary panel)
# ---------------------------------------------------------------------------


@register(
    "agg_cochrans_q",
    oracle=f"""
        WITH {_SQL_PANEL},
        totals AS (
            SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS tot,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM panel GROUP BY event_type
        ),
        b AS (
            SELECT p.day, p.event_type,
                   CASE WHEN p.cnt * t.d > t.tot THEN 1 ELSE 0 END AS x
            FROM panel p JOIN totals t USING (event_type)
        ),
        cj AS (
            SELECT event_type, CAST(SUM(x) AS BIGINT) AS c_j
            FROM b GROUP BY event_type
        ),
        ri AS (
            SELECT day, CAST(SUM(x) AS BIGINT) AS r_i
            FROM b GROUP BY day
        ),
        agg AS (
            SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cj) AS k,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM ri) AS d,
                   (SELECT CAST(SUM(c_j) AS BIGINT) FROM cj) AS n,
                   (SELECT CAST(SUM(c_j * c_j) AS BIGINT) FROM cj) AS sum_c2,
                   (SELECT CAST(SUM(r_i * r_i) AS BIGINT) FROM ri) AS sum_r2
        )
        SELECT d AS n_blocks, k AS k_treatments, n AS n_success,
               CASE WHEN k * n - sum_r2 > 0
                    THEN CAST((k - 1) * (k * sum_c2 - n * n) AS DOUBLE)
                         / CAST(k * n - sum_r2 AS DOUBLE)
                    ELSE CAST(NULL AS DOUBLE) END AS cochrans_q
        FROM agg
    """,
    doc="Cochran's Q test (1950) on the binarized activity panel: "
    "cell (day, type) is a success iff that day's count exceeds the "
    "type's own panel mean — an EXACT integer comparison "
    "(cnt * n_days > total), no float threshold. Q = (k-1)(k SUM C_j^2 "
    "- N^2) / (k N - SUM R_i^2) from integer column/row success "
    "totals — every term exact, one final division (NULL when the "
    "denominator degenerates: all-identical rows). The k-sample "
    "extension of McNemar (agg_mcnemar): do the event types differ in "
    "their tendency to run above their own baseline on the same "
    "days? Integer panel algebra over the calendar x type grid.",
)
def agg_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    panel = _persist(_panel(spark, sf_dir))
    totals = panel.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("tot"),
        F.count("*").cast("long").alias("d"),
    )
    b = panel.join(F.broadcast(totals), "event_type").select(
        "day",
        "event_type",
        F.when(F.col("cnt") * F.col("d") > F.col("tot"), 1).otherwise(0).alias("x"),
    )
    b = _persist(b)
    cj = b.groupBy("event_type").agg(F.sum("x").cast("long").alias("c_j"))
    ri = b.groupBy("day").agg(F.sum("x").cast("long").alias("r_i"))
    cagg = cj.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("c_j").cast("long").alias("n"),
        F.sum(F.col("c_j") * F.col("c_j")).cast("long").alias("sum_c2"),
    )
    ragg = ri.agg(
        F.count("*").cast("long").alias("d"),
        F.sum(F.col("r_i") * F.col("r_i")).cast("long").alias("sum_r2"),
    )
    agg = cagg.crossJoin(F.broadcast(ragg))
    den = F.col("k") * F.col("n") - F.col("sum_r2")
    num = (F.col("k") - 1) * (F.col("k") * F.col("sum_c2") - F.col("n") * F.col("n"))
    return agg.select(
        F.col("d").alias("n_blocks"),
        F.col("k").alias("k_treatments"),
        F.col("n").alias("n_success"),
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(F.lit(None).cast("double"))
        .alias("cochrans_q"),
    )


# ---------------------------------------------------------------------------
# Gini mean difference (orders.o_totalprice)
# ---------------------------------------------------------------------------


@register(
    "agg_gini_mean_difference",
    oracle=f"""
        WITH r AS (
            SELECT o_totalprice AS x,
                   CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS rk
            FROM orders
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        s AS (
            SELECT n.n,
                   {sql_ssum('CAST(2 * r.rk - n.n - 1 AS DOUBLE) * r.x')} AS gsum,
                   {sql_dsum('r.x')} AS xsum
            FROM r CROSS JOIN n
            GROUP BY n.n
        )
        SELECT n AS n_rows,
               xsum / CAST(n AS DOUBLE) AS mean_price,
               2.0 * gsum / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))
                   AS gmd,
               (2.0 * gsum / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   / (2.0 * (xsum / CAST(n AS DOUBLE))) AS gini
        FROM s
    """,
    doc="Gini mean difference of order prices — GMD = 2/(n(n-1)) "
    "SUM_r (2r - n - 1) x_(r) (the classic O(n log n) rank identity; "
    "Gini coefficient = GMD / (2 mean)): the O(n^2) pairwise "
    "|x_i - x_j| expectation collapses to ONE pass over the bucketed "
    "corpus rank (operators/prefix — no global single-task sort). "
    "Ties broken by o_orderkey; within a tie block the coefficient "
    "sum is permutation-invariant, so the row_number convention is "
    "exact, not approximate. The rank-weighted sum crosses engines "
    "via ssum (wide-range products), the plain sum via dsum. The "
    "dispersion companion of curation_gini_balance (which reads "
    "SHARES; this reads the underlying value spread).",
)
def agg_gini_mean_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _persist(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    ranked = bucketed_value_rank(
        od,
        part_cols=[],
        value_col="o_totalprice",
        tie_col="o_orderkey",
        n_rows=table_row_count(sf_dir, "orders"),
        out_col="__rank",
    )
    nrel = ranked.agg(F.count("*").cast("long").alias("n"))
    s = (
        ranked.crossJoin(F.broadcast(nrel))
        .groupBy("n")
        .agg(
            ssum(
                (2 * F.col("__rank") - F.col("n") - 1).cast("double")
                * F.col("o_totalprice")
            ).alias("gsum"),
            dsum(F.col("o_totalprice")).alias("xsum"),
        )
    )
    nD = F.col("n").cast("double")
    gmd = F.lit(2.0) * F.col("gsum") / (nD * (F.col("n") - 1).cast("double"))
    mean = F.col("xsum") / nD
    return s.select(
        F.col("n").alias("n_rows"),
        mean.alias("mean_price"),
        gmd.alias("gmd"),
        (gmd / (F.lit(2.0) * mean)).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Lorenz deciles
# ---------------------------------------------------------------------------


@register(
    "agg_lorenz_deciles",
    oracle="""
        WITH r AS (
            SELECT o_totalprice AS x,
                   CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS rk
            FROM orders
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        d AS (
            SELECT CAST((10 * rk + n - 1) // n AS BIGINT) AS decile,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   SUM(CAST(x AS DECIMAL(27,6))) AS s_dec
            FROM r CROSS JOIN n
            GROUP BY 1
        )
        SELECT decile, n_rows,
               CAST(s_dec AS DOUBLE) AS decile_sum,
               CAST(SUM(s_dec) OVER (ORDER BY decile) AS DOUBLE)
                   / CAST(SUM(s_dec) OVER () AS DOUBLE) AS cum_share
        FROM d
    """,
    doc="Lorenz curve at decile resolution over order prices: rows "
    "rank via the bucketed two-level scan, decile = ceil(10 r / n) in "
    "EXACT integer arithmetic ((10r + n - 1) div n), per-decile sums "
    "and the cumulative both accumulate in DECIMAL(27,6) — exact "
    "under any partitioning and frame association — with single casts "
    "to double at the end. cum_share at decile d is L(d/10), the "
    "curve the Gini coefficient integrates (agg_gini_mean_difference "
    "reports the scalar; this is the shape — where the concentration "
    "actually lives), complementing events_pareto_concentration's "
    "top-share reading. Ten output rows at any corpus size.",
)
def agg_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.functions.numeric import DEC

    od = _persist(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    ranked = bucketed_value_rank(
        od,
        part_cols=[],
        value_col="o_totalprice",
        tie_col="o_orderkey",
        n_rows=table_row_count(sf_dir, "orders"),
        out_col="__rank",
    )
    nrel = ranked.agg(F.count("*").cast("long").alias("n"))
    d = (
        ranked.crossJoin(F.broadcast(nrel))
        .groupBy(
            F.expr("CAST((10 * __rank + n - 1) div n AS BIGINT)").alias("decile")
        )
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias("s_dec"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    return d.select(
        "decile",
        "n_rows",
        F.col("s_dec").cast("double").alias("decile_sum"),
        (
            F.sum("s_dec").over(wcum).cast("double")
            / F.sum("s_dec").over(wall).cast("double")
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Quartile coefficient of dispersion
# ---------------------------------------------------------------------------


@register(
    "agg_quartile_dispersion",
    oracle="""
        WITH r AS (
            SELECT o_totalprice AS x,
                   CAST(row_number() OVER (ORDER BY o_totalprice, o_orderkey)
                        AS BIGINT) AS rk
            FROM orders
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        q AS (
            SELECT MIN(CASE WHEN rk = (n + 3) // 4 THEN x END) AS q1,
                   MIN(CASE WHEN rk = (3 * n + 3) // 4 THEN x END) AS q3,
                   ANY_VALUE(n) AS n
            FROM r CROSS JOIN n
        )
        SELECT n AS n_rows, q1, q3, q3 - q1 AS iqr,
               (q3 - q1) / (q3 + q1) AS qcd
        FROM q
    """,
    doc="Quartile coefficient of dispersion of order prices — QCD = "
    "(Q3 - Q1)/(Q3 + Q1), the scale-free robust spread statistic "
    "(Bonett 2006 contract): quartiles are the TYPE-1 exact order "
    "statistics at ranks ceil(n/4), ceil(3n/4) (integer arithmetic "
    "(n+3) div 4 — no interpolation, so both engines pick the "
    "identical corpus element and the gate hashes exactly). Ranks "
    "via the bucketed two-level scan; the quartile pick is one "
    "conditional aggregate, no per-group list. The robust companion "
    "of agg_skew_kurtosis_exact's moment-based spread.",
)
def agg_quartile_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _persist(
        load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    ranked = bucketed_value_rank(
        od,
        part_cols=[],
        value_col="o_totalprice",
        tie_col="o_orderkey",
        n_rows=table_row_count(sf_dir, "orders"),
        out_col="__rank",
    )
    nrel = ranked.agg(F.count("*").cast("long").alias("n"))
    q = (
        ranked.crossJoin(F.broadcast(nrel))
        .agg(
            F.min(
                F.when(
                    F.col("__rank") == F.expr("(n + 3) div 4"),
                    F.col("o_totalprice"),
                )
            ).alias("q1"),
            F.min(
                F.when(
                    F.col("__rank") == F.expr("(3 * n + 3) div 4"),
                    F.col("o_totalprice"),
                )
            ).alias("q3"),
            F.first("n").alias("n"),
        )
    )
    return q.select(
        F.col("n").alias("n_rows"),
        "q1",
        "q3",
        (F.col("q3") - F.col("q1")).alias("iqr"),
        ((F.col("q3") - F.col("q1")) / (F.col("q3") + F.col("q1"))).alias("qcd"),
    )


# ---------------------------------------------------------------------------
# Cronbach's alpha (document length-feature consistency)
# ---------------------------------------------------------------------------

_CA_K = 3


@register(
    "agg_cronbach_alpha",
    oracle=f"""
        WITH items AS (
            SELECT n_chars AS x1,
                   CAST(len({sql_tokens('text')}) AS BIGINT) AS x2,
                   CAST(length(text) - length(replace(text, 'e', ''))
                        AS BIGINT) AS x3
            FROM documents
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x1 * x1) AS BIGINT) AS q1,
                   CAST(SUM(x2) AS BIGINT) AS s2, CAST(SUM(x2 * x2) AS BIGINT) AS q2,
                   CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(x3 * x3) AS BIGINT) AS q3,
                   CAST(SUM(x1 + x2 + x3) AS BIGINT) AS st,
                   CAST(SUM((x1 + x2 + x3) * (x1 + x2 + x3)) AS BIGINT) AS qt
            FROM items
        ),
        v AS (
            SELECT n,
                   (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS v1,
                   (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS v2,
                   (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS v3,
                   (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                        / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS vt
            FROM s
        )
        SELECT n AS n_docs, CAST({_CA_K} AS BIGINT) AS k_items,
               ((v1 + v2) + v3) AS sum_item_var,
               vt AS total_var,
               (CAST({_CA_K} AS DOUBLE) / CAST({_CA_K} - 1 AS DOUBLE))
                   * (1.0 - ((v1 + v2) + v3) / vt) AS cronbach_alpha
        FROM v
    """,
    doc="Cronbach's alpha (1951) internal-consistency coefficient over "
    f"{_CA_K} per-document length items (n_chars, whitespace token "
    "count, 'e'-character count — three integer measurements of the "
    "same latent 'document size' construct, so alpha lands near 1 and "
    "the statistic is exercised end to end): alpha = k/(k-1) (1 - "
    "SUM var_items / var_total). Every moment is an EXACT BIGINT "
    "power sum (items are integers; squares stay far under 2^63); "
    "population variances and the final algebra are then pure "
    "double arithmetic from identical exact inputs, with the 3-term "
    "variance sum parenthesized ((v1+v2)+v3) in BOTH engines. The "
    "reliability gauge for multi-feature quality scores "
    "(curation_rater_agreement_kappa covers categorical raters; this "
    "covers numeric item batteries).",
)
def agg_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    items = docs.select(
        F.col("n_chars").alias("x1"),
        F.size(tokens("text")).cast("long").alias("x2"),
        (
            F.length("text") - F.length(F.expr("replace(text, 'e', '')"))
        ).cast("long").alias("x3"),
    )
    x1, x2, x3 = F.col("x1"), F.col("x2"), F.col("x3")
    t = x1 + x2 + x3
    s = items.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x1).cast("long").alias("s1"),
        F.sum(x1 * x1).cast("long").alias("q1"),
        F.sum(x2).cast("long").alias("s2"),
        F.sum(x2 * x2).cast("long").alias("q2"),
        F.sum(x3).cast("long").alias("s3"),
        F.sum(x3 * x3).cast("long").alias("q3"),
        F.sum(t).cast("long").alias("st"),
        F.sum(t * t).cast("long").alias("qt"),
    )
    nD = F.col("n").cast("double")

    def _var(q, sm):
        return (
            F.col(q).cast("double")
            - F.col(sm).cast("double") * F.col(sm).cast("double") / nD
        ) / nD

    v = s.select(
        "n",
        _var("q1", "s1").alias("v1"),
        _var("q2", "s2").alias("v2"),
        _var("q3", "s3").alias("v3"),
        _var("qt", "st").alias("vt"),
    )
    sum_items = (F.col("v1") + F.col("v2")) + F.col("v3")
    return v.select(
        F.col("n").alias("n_docs"),
        F.lit(_CA_K).cast("long").alias("k_items"),
        sum_items.alias("sum_item_var"),
        F.col("vt").alias("total_var"),
        (
            F.lit(float(_CA_K) / (_CA_K - 1))
            * (F.lit(1.0) - sum_items / F.col("vt"))
        ).alias("cronbach_alpha"),
    )
