"""Round-7 diagnostics: the Wald-Wolfowitz runs test on the daily
event-count series, the Durbin-Watson autocorrelation statistic on
per-type daily OLS residuals, Newman modularity of the label-propagation
communities (the quality audit for graph_label_propagation), and the
QUALIFY window-filter surface (Spark lacks the clause; DuckDB runs the
real one).

Reference parity: none of this exists in the reference engine (single
SELECT, no windows — /root/reference/src/planner/mod.rs:193-207); these
compose the repo's aggregate/window/graph surfaces.

Determinism: runs-test counts and the modularity numerator are exact
integers (modularity's Q is emitted as the integer 4m^2*Q alongside the
single final division); Durbin-Watson's order-dependent residual sums
go through ssum's shared IEEE rounding; QUALIFY's percent_rank is the
exact (rank-1)/(n-1) integer ratio.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register


@register(
    "agg_runs_test",
    oracle="""
        WITH daily AS (
            SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        signs AS (
            SELECT d,
                   CASE WHEN c > LAG(c) OVER (ORDER BY d) THEN 1
                        WHEN c < LAG(c) OVER (ORDER BY d) THEN -1
                        ELSE NULL END AS s
            FROM daily
        ),
        seq AS (
            SELECT s,
                   LAG(s) OVER (ORDER BY d) AS prev_s
            FROM (SELECT d, s FROM signs WHERE s IS NOT NULL)
        ),
        agg AS (
            SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_up,
                   CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_down,
                   CAST(1 + SUM(CASE WHEN prev_s IS NOT NULL
                                      AND s <> prev_s THEN 1 ELSE 0 END)
                        AS BIGINT) AS runs
            FROM seq
        )
        SELECT n_up, n_down, runs,
               CAST(1.0 AS DOUBLE)
               + (CAST(2 * n_up * n_down AS DOUBLE)
                  / CAST(n_up + n_down AS DOUBLE)) AS mu,
               (CAST(runs AS DOUBLE)
                - (CAST(1.0 AS DOUBLE)
                   + (CAST(2 * n_up * n_down AS DOUBLE)
                      / CAST(n_up + n_down AS DOUBLE))))
               / sqrt(CAST(2 * n_up * n_down
                           * (2 * n_up * n_down - n_up - n_down) AS DOUBLE)
                      / (CAST((n_up + n_down) * (n_up + n_down) AS DOUBLE)
                         * CAST(n_up + n_down - 1 AS DOUBLE))) AS z
        FROM agg
    """,
    doc="Wald-Wolfowitz runs test for randomness of the daily event- "
    "count series: signs are up/down vs the previous day (ties "
    "dropped, the standard treatment), R = 1 + sign changes, and "
    "z = (R - mu)/sigma with mu = 1 + 2*n1*n2/n and sigma^2 = "
    "2*n1*n2*(2*n1*n2 - n)/(n^2*(n-1)) — every count an exact BIGINT "
    "over the DAY-domain relation (one corpus grouped count; both lag "
    "windows are day-domain-sized), divisions and sqrt only in the "
    "final closed form. Wald & Wolfowitz 1940.",
)
def agg_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    ).agg(F.count("*").cast("long").alias("c"))
    wd = Window.orderBy("d")
    signs = daily.select(
        "d",
        F.when(F.col("c") > F.lag("c").over(wd), F.lit(1))
        .when(F.col("c") < F.lag("c").over(wd), F.lit(-1))
        .alias("s"),
    ).where(F.col("s").isNotNull())
    seq = signs.select("s", F.lag("s").over(wd).alias("prev_s"))
    agg = seq.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("long").alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0)).cast("long").alias("n_down"),
        (
            F.lit(1)
            + F.sum(
                F.when(
                    F.col("prev_s").isNotNull() & (F.col("s") != F.col("prev_s")), 1
                ).otherwise(0)
            )
        )
        .cast("long")
        .alias("runs"),
    )
    n1d = F.col("n_up").cast("double")
    n2d = F.col("n_down").cast("double")
    nd = (F.col("n_up") + F.col("n_down")).cast("double")
    mu = F.lit(1.0) + ((2 * F.col("n_up") * F.col("n_down")).cast("double") / nd)
    var = (
        2 * F.col("n_up") * F.col("n_down")
        * (2 * F.col("n_up") * F.col("n_down") - F.col("n_up") - F.col("n_down"))
    ).cast("double") / (
        ((F.col("n_up") + F.col("n_down")) * (F.col("n_up") + F.col("n_down")))
        .cast("double")
        * (F.col("n_up") + F.col("n_down") - 1).cast("double")
    )
    _ = (n1d, n2d)
    return agg.select(
        "n_up",
        "n_down",
        "runs",
        mu.alias("mu"),
        ((F.col("runs").cast("double") - mu) / F.sqrt(var)).alias("z"),
    )


_DW_SCALE = "1000000000.0"


@register(
    "agg_durbin_watson",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
                   {sql_dsum("value")} / CAST(COUNT(*) AS DOUBLE) AS ybar
            FROM events GROUP BY event_type, CAST(ts AS DATE)
        ),
        m AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(d) AS BIGINT) AS sx,
                   CAST(SUM(d * d) AS BIGINT) AS sxx,
                   {sql_dsum("ybar")} AS sy,
                   {sql_ssum("CAST(d AS DOUBLE) * ybar", scale=_DW_SCALE)} AS sxy
            FROM daily GROUP BY event_type
        ),
        fit AS (
            SELECT event_type, n,
                   (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
                   sy / CAST(n AS DOUBLE) AS my,
                   CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx
            FROM m
        ),
        resid AS (
            SELECT daily.event_type, d,
                   ybar - (my + slope * (CAST(d AS DOUBLE) - mx)) AS e
            FROM daily JOIN fit ON daily.event_type = fit.event_type
        ),
        lagged AS (
            SELECT event_type, e,
                   LAG(e) OVER (PARTITION BY event_type ORDER BY d) AS e_prev
            FROM resid
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_ssum(
                   "CASE WHEN e_prev IS NULL THEN CAST(0.0 AS DOUBLE) "
                   "ELSE (e - e_prev) * (e - e_prev) END",
                   scale=_DW_SCALE,
               )}
               / {sql_ssum("e * e", scale=_DW_SCALE)} AS dw
        FROM lagged
        GROUP BY event_type
    """,
    doc="Durbin-Watson first-order autocorrelation statistic of the "
    "per-type daily-mean OLS residuals: fit y_d = a + b*d closed-form "
    "(the agg_ols_hourly_trend sums, centered spelling so a single "
    "slope double feeds the residual), then DW = sum (e_d - e_{d-1})^2 "
    "/ sum e_d^2 over the DAY-domain relation — the corpus-sized work "
    "is one grouped mean; the residual lag window is day-domain-sized "
    "per type. Residual reductions cross engines via ssum. DW ~ 2 "
    "means no autocorrelation; Durbin & Watson 1950.",
)
def agg_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    scale = float(_DW_SCALE)
    daily = _persist(
        ev.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("d"),
        ).agg((dsum("value") / F.count("*").cast("double")).alias("ybar"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("d").cast("long").alias("sx"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sxx"),
        dsum("ybar").alias("sy"),
        ssum(F.col("d").cast("double") * F.col("ybar"), scale=scale).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    fit = m.select(
        "event_type",
        (
            (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy"))
            / (
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("slope"),
        (F.col("sy") / nd).alias("my"),
        (F.col("sx").cast("double") / nd).alias("mx"),
    )
    resid = daily.join(fit, "event_type").select(
        "event_type",
        "d",
        (
            F.col("ybar")
            - (F.col("my") + F.col("slope") * (F.col("d").cast("double") - F.col("mx")))
        ).alias("e"),
    )
    wl = Window.partitionBy("event_type").orderBy("d")
    lagged = resid.select(
        "event_type", "e", F.lag("e").over(wl).alias("e_prev")
    )
    return lagged.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        (
            ssum(
                F.when(F.col("e_prev").isNull(), F.lit(0.0)).otherwise(
                    (F.col("e") - F.col("e_prev")) * (F.col("e") - F.col("e_prev"))
                ),
                scale=scale,
            )
            / ssum(F.col("e") * F.col("e"), scale=scale)
        ).alias("dw"),
    )


@register(
    "graph_modularity",
    oracle=None,  # composed below from the label-propagation SQL parts
    doc="Newman modularity of the label-propagation communities — the "
    "quality audit for graph_label_propagation: Q = sum_c [e_c/m - "
    "(d_c/2m)^2] over the SAME undirected kNN edge set and the SAME "
    "2-round deterministic LPA labels, kept EXACT as the integer "
    "numerator 4m*sum(e_c) - sum(d_c^2) over 4m^2 (one final "
    "division). intra-community edges come from one edge-sized join "
    "against the label relation; degrees and community sums are "
    "bounded aggregates. Newman & Girvan 2004. The DuckDB oracle "
    "re-runs the full unrolled LPA + the same integer algebra.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared, und_both_dirs, und_edges

    g = knn_graph_shared(spark, sf_dir)
    und = _persist(und_edges(g))
    edges = _persist(und_both_dirs(und))
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(2):
        counts = (
            edges.join(labels.select(F.col("node").alias("dst"), "label"), "dst")
            .groupBy(F.col("src").alias("node"), "label")
            .agg(F.count("*").cast("long").alias("n"))
        )
        labels = (
            counts.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
    labels = _persist(labels)
    m_rel = und.agg(F.count("*").cast("long").alias("m"))
    la = labels.select(F.col("node").alias("a"), F.col("label").alias("la"))
    lb = labels.select(F.col("node").alias("b"), F.col("label").alias("lb"))
    intra = (
        und.join(la, "a")
        .join(lb, "b")
        .where(F.col("la") == F.col("lb"))
        .groupBy(F.col("la").alias("label"))
        .agg(F.count("*").cast("long").alias("e_c"))
    )
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    d_c = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.sum("deg").cast("long").alias("d_c"))
    )
    per_c = d_c.join(intra, "label", "left").select(
        "label", "d_c", F.coalesce(F.col("e_c"), F.lit(0)).cast("long").alias("e_c")
    )
    s = per_c.agg(
        F.count("*").cast("long").alias("n_communities"),
        F.sum("e_c").cast("long").alias("sum_ec"),
        F.sum(F.col("d_c") * F.col("d_c")).cast("long").alias("sum_dc2"),
    )
    return s.crossJoin(F.broadcast(m_rel)).select(
        "n_communities",
        "m",
        (4 * F.col("m") * F.col("sum_ec") - F.col("sum_dc2"))
        .cast("long")
        .alias("q_num_x4m2"),
        (
            (4 * F.col("m") * F.col("sum_ec") - F.col("sum_dc2")).cast("double")
            / (4 * F.col("m") * F.col("m")).cast("double")
        ).alias("modularity"),
    )


def _fix_modularity_oracle() -> None:
    from sql_engine_spark.operators.graph import sql_knn_shared
    from sql_engine_spark.queries.round5_graph import _sql_lpa_iter
    from sql_engine_spark.registry import _REGISTRY

    _REGISTRY["graph_modularity"].oracle = f"""
        WITH knn AS ({sql_knn_shared()}),
        und AS (
            SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM knn
        ),
        lpa_edges AS (
            SELECT a AS src, b AS dst FROM und
            UNION ALL
            SELECT b AS src, a AS dst FROM und
        ),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM lpa_edges),
        {_sql_lpa_iter('l0', 'l1')},
        {_sql_lpa_iter('l1', 'l2')},
        m_rel AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM und),
        intra AS (
            SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_c
            FROM und
            JOIN l2 la ON und.a = la.node
            JOIN l2 lb ON und.b = lb.node
            WHERE la.label = lb.label
            GROUP BY la.label
        ),
        deg AS (
            SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg
            FROM lpa_edges GROUP BY src
        ),
        d_c AS (
            SELECT label, CAST(SUM(deg) AS BIGINT) AS d_c
            FROM l2 JOIN deg ON l2.node = deg.node
            GROUP BY label
        ),
        per_c AS (
            SELECT d_c.label, d_c.d_c,
                   CAST(COALESCE(intra.e_c, 0) AS BIGINT) AS e_c
            FROM d_c LEFT JOIN intra ON d_c.label = intra.label
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
                   CAST(SUM(e_c) AS BIGINT) AS sum_ec,
                   CAST(SUM(d_c * d_c) AS BIGINT) AS sum_dc2
            FROM per_c
        )
        SELECT n_communities, m,
               CAST(4 * m * sum_ec - sum_dc2 AS BIGINT) AS q_num_x4m2,
               CAST(4 * m * sum_ec - sum_dc2 AS DOUBLE)
               / CAST(4 * m * m AS DOUBLE) AS modularity
        FROM s CROSS JOIN m_rel
    """


_fix_modularity_oracle()


@register(
    "window_qualify",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               PERCENT_RANK() OVER w AS pr
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey)
        QUALIFY rn <= 2 OR pr >= 0.9
    """,
    doc="The QUALIFY clause (window filter; SQL:2023 via Snowflake/ "
    "DuckDB/BigQuery) — keep each customer's top-2 orders by price "
    "plus its bottom decile by percent_rank: Spark SQL has no QUALIFY, so the "
    "engine spells it as window columns + a post-filter (exactly what "
    "QUALIFY desugars to); the DuckDB oracle runs the REAL clause "
    "with a named WINDOW, pinning the desugaring. percent_rank is the "
    "exact (rank-1)/(n-1) integer ratio; partitions are per-customer "
    "(many small keys — no global window).",
)
def window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.percent_rank().over(w).alias("pr"),
        )
        .where((F.col("rn") <= 2) | (F.col("pr") >= 0.9))
    )
