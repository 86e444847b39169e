"""Round-7 quality set 2: exact Spearman rank correlation (domain-
midrank spelling), precision-recall AUC / average precision with the
best-F1 operating point, the Murphy (1973) Brier-score decomposition
(reliability / resolution / uncertainty), and cumulative gains / lift
deciles — the model-evaluation quartet a curation stack runs beside its
ROC audit (quality_roc_auc).

Reference parity: the reference engine's aggregation surface is
min/max/sum/count/avg over a hash aggregate
(/root/reference/src/executor/aggregation.rs:23-228); every operator
here composes those primitives plus the repo's own bucketed rank — none
of it is expressible there.

Determinism (house rules): midranks are EXACT integers (doubled to
clear the half), co-moments are exact DECIMAL(38,0)/HUGEINT integer
sums cast to double only for the final closed form; order-dependent
double reductions go through `ssum` (shared IEEE rounding, exact
decimal reduction); divisions and sqrt are single IEEE-exact ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

_D38 = "decimal(38,0)"
_D19 = "decimal(19,0)"


def _midrank2(df: DataFrame, col: str, n_rows: int, out: str) -> DataFrame:
    """Doubled midranks of `col`'s DISTINCT-value domain: 2*rank_avg =
    2*(#rows below) + (#ties) + 1 — an exact integer, computed on the
    domain relation (one grouped count) with the cross-domain cumsum
    through the two-level bucketed scan, never a single global window."""
    dom = df.groupBy(col).agg(F.count("*").cast("long").alias("__cnt"))
    ranked = bucketed_value_rank(
        dom,
        part_cols=[],
        value_col=col,
        tie_col=col,
        n_rows=n_rows,
        out_col="__cum",
        weight_col="__cnt",
    )
    return ranked.select(
        col,
        (2 * (F.col("__cum") - F.col("__cnt")) + F.col("__cnt") + 1)
        .cast("long")
        .alias(out),
    )


@register(
    "agg_spearman_rho",
    oracle="""
        WITH li AS (
            SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
        ),
        domx AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY x),
        rx AS (
            SELECT x,
                   CAST(2 * (SUM(cnt) OVER (ORDER BY x) - cnt) + cnt + 1
                        AS BIGINT) AS r2x
            FROM domx
        ),
        domy AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS cnt FROM li GROUP BY y),
        ry AS (
            SELECT y,
                   CAST(2 * (SUM(cnt) OVER (ORDER BY y) - cnt) + cnt + 1
                        AS BIGINT) AS r2y
            FROM domy
        ),
        j AS (
            SELECT r2x, r2y FROM li JOIN rx USING (x) JOIN ry USING (y)
        ),
        s AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(r2x AS HUGEINT)) AS sx,
                   SUM(CAST(r2y AS HUGEINT)) AS sy,
                   SUM(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT)) AS sxx,
                   SUM(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT)) AS syy,
                   SUM(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT)) AS sxy
            FROM j
        )
        SELECT n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   AS spearman_rho
        FROM s
    """,
    doc="Exact Spearman rank correlation (with tie midranks) between "
    "l_quantity and l_extendedprice: each column's midranks come from "
    "its DISTINCT-value domain relation — doubled to stay integer — "
    "so the corpus-sized work is two grouped counts and two value "
    "joins, never a per-row global rank window; the domain cumsums run "
    "through the two-level bucketed scan (l_extendedprice's domain is "
    "corpus-sized). Co-moments are exact DECIMAL(38,0)/HUGEINT integer "
    "sums; Pearson's closed form on the doubled midranks (scale- "
    "invariant) is evaluated once in double. Spearman 1904; midrank "
    "ties per Kendall's treatment.",
)
def agg_spearman_rho(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _persist(
        load(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
        )
    )
    n_rows = li.count()
    rx = _midrank2(li, "x", n_rows, "r2x")
    ry = _midrank2(li, "y", n_rows, "r2y")
    j = li.join(rx, "x").join(ry, "y")
    s = j.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("r2x").cast(_D38)).alias("sx"),
        F.sum(F.col("r2y").cast(_D38)).alias("sy"),
        F.sum(F.col("r2x").cast(_D19) * F.col("r2x").cast(_D19)).alias("sxx"),
        F.sum(F.col("r2y").cast(_D19) * F.col("r2y").cast(_D19)).alias("syy"),
        F.sum(F.col("r2x").cast(_D19) * F.col("r2y").cast(_D19)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    return s.select(
        "n",
        (
            (nd * sxy - sx * sy)
            / (F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy))
        ).alias("spearman_rho"),
    )


_AP_SCALE = "1000000000.0"


@register(
    "quality_pr_auc",
    oracle=f"""
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
            SELECT score, c_pos,
                   CAST(SUM(c_pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
                   CAST(SUM(c_neg) OVER (ORDER BY score DESC) AS BIGINT) AS fp
            FROM per_score
        ),
        ap AS (
            SELECT {sql_ssum(
                "(CAST(c_pos AS DOUBLE) / CAST(n_pos AS DOUBLE))"
                " * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))",
                scale=_AP_SCALE,
            )} AS ap
            FROM cum CROSS JOIN tot
        ),
        best AS (
            SELECT score AS best_f1_threshold, f1 AS best_f1
            FROM (
                SELECT score,
                       (CAST(2.0 AS DOUBLE) * CAST(tp AS DOUBLE))
                       / CAST(tp + fp + n_pos AS DOUBLE) AS f1,
                       ROW_NUMBER() OVER (
                           ORDER BY (CAST(2.0 AS DOUBLE) * CAST(tp AS DOUBLE))
                                    / CAST(tp + fp + n_pos AS DOUBLE) DESC,
                                    score ASC
                       ) AS rn
                FROM cum CROSS JOIN tot
            )
            WHERE rn = 1
        )
        SELECT n_pos, n_neg, ap, best_f1_threshold, best_f1
        FROM tot CROSS JOIN ap CROSS JOIN best
    """,
    doc="Precision-recall AUC as average precision at threshold "
    "granularity — AP = sum over distinct scores s of "
    "(c_pos(s)/P) * precision(s) with TP/FP from a descending "
    "cumulative over the DISTINCT-SCORE relation (the same domain- "
    "bounded device as quality_roc_auc: the corpus-sized work is one "
    "grouped count; the window is domain-sized) — plus the best-F1 "
    "operating point (F1 = 2TP/(TP+FP+P), tie-broken to the smallest "
    "threshold). The AP reduction crosses engines via ssum's shared "
    "IEEE rounding at 1e-9 granularity. Davis & Goadrich 2006 on "
    "PR-vs-ROC; sklearn's average_precision step formula.",
)
def quality_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    per_score = docs.groupBy("score").agg(
        F.sum("y").cast("long").alias("c_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("c_neg"),
    )
    tot = docs.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("y")).cast("long").alias("n_neg"),
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = _persist(
        per_score.select(
            "score",
            "c_pos",
            F.sum("c_pos").over(w).cast("long").alias("tp"),
            F.sum("c_neg").over(w).cast("long").alias("fp"),
        ).crossJoin(F.broadcast(tot))
    )
    ap = cum.agg(
        ssum(
            (F.col("c_pos").cast("double") / F.col("n_pos").cast("double"))
            * (
                F.col("tp").cast("double")
                / (F.col("tp") + F.col("fp")).cast("double")
            ),
            scale=float(_AP_SCALE),
        ).alias("ap")
    )
    f1 = (F.lit(2.0) * F.col("tp").cast("double")) / (
        F.col("tp") + F.col("fp") + F.col("n_pos")
    ).cast("double")
    wb = Window.orderBy(F.col("f1").desc(), F.col("score").asc())
    best = (
        cum.withColumn("f1", f1)
        .withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            F.col("score").alias("best_f1_threshold"), F.col("f1").alias("best_f1")
        )
    )
    return (
        tot.crossJoin(F.broadcast(ap))
        .crossJoin(F.broadcast(best))
        .select("n_pos", "n_neg", "ap", "best_f1_threshold", "best_f1")
    )


_BR_SCALE = "1000000000.0"
_BR_BINS = 10


@register(
    "quality_brier_decomposition",
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
        binned AS (
            SELECT LEAST(CAST(FLOOR(p * {_BR_BINS}) AS BIGINT),
                         {_BR_BINS - 1}) AS bin,
                   p, y
            FROM fc
        ),
        per_bin AS (
            SELECT bin,
                   CAST(COUNT(*) AS BIGINT) AS n_k,
                   {sql_ssum("p", scale=_BR_SCALE)} AS sum_p,
                   CAST(SUM(y) AS BIGINT) AS pos_k
            FROM binned GROUP BY bin
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos,
                   {sql_ssum(
                       "(p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE))",
                       scale=_BR_SCALE,
                   )} AS brier_sum
            FROM binned
        ),
        parts AS (
            SELECT
                {sql_ssum(
                    "CAST(n_k AS DOUBLE)"
                    " * (sum_p / CAST(n_k AS DOUBLE)"
                    "    - CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE))"
                    " * (sum_p / CAST(n_k AS DOUBLE)"
                    "    - CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE))",
                    scale=_BR_SCALE,
                )} AS rel_sum,
                {sql_ssum(
                    "CAST(n_k AS DOUBLE)"
                    " * (CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE)"
                    "    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))"
                    " * (CAST(pos_k AS DOUBLE) / CAST(n_k AS DOUBLE)"
                    "    - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))",
                    scale=_BR_SCALE,
                )} AS res_sum
            FROM per_bin CROSS JOIN tot
        )
        SELECT n,
               CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS base_rate,
               brier_sum / CAST(n AS DOUBLE) AS brier,
               rel_sum / CAST(n AS DOUBLE) AS reliability,
               res_sum / CAST(n AS DOUBLE) AS resolution,
               (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(1.0 AS DOUBLE)
                  - CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                   AS uncertainty
        FROM tot CROSS JOIN parts
    """,
    doc="Murphy (1973) decomposition of the Brier score of a min-max- "
    "normalized length 'forecast' of lang='en': brier = mean (p-y)^2, "
    f"reliability / resolution over {_BR_BINS} equal-width forecast "
    "bins, uncertainty = base_rate*(1-base_rate). One corpus pass "
    f"builds the per-bin relation ({_BR_BINS} rows); every cross-bin "
    "and corpus double reduction goes through ssum's shared IEEE "
    "rounding so the order-dependent sums agree across engines; the "
    "bounds crossJoin is a broadcast 1-row relation.",
)
def quality_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.min("n_chars").cast("double").alias("lo"),
        F.max("n_chars").cast("double").alias("hi"),
    )
    fc = docs.crossJoin(F.broadcast(bounds)).select(
        ((F.col("n_chars").cast("double") - F.col("lo")) / (F.col("hi") - F.col("lo")))
        .alias("p"),
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    binned = _persist(
        fc.select(
            F.least(
                F.floor(F.col("p") * _BR_BINS).cast("long"), F.lit(_BR_BINS - 1)
            ).alias("bin"),
            "p",
            "y",
        )
    )
    scale = float(_BR_SCALE)
    per_bin = binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_k"),
        ssum(F.col("p"), scale=scale).alias("sum_p"),
        F.sum("y").cast("long").alias("pos_k"),
    )
    tot = binned.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
        ssum(
            (F.col("p") - F.col("y").cast("double"))
            * (F.col("p") - F.col("y").cast("double")),
            scale=scale,
        ).alias("brier_sum"),
    )
    nk = F.col("n_k").cast("double")
    pbar = F.col("sum_p") / nk
    ybar_k = F.col("pos_k").cast("double") / nk
    ybar = F.col("n_pos").cast("double") / F.col("n").cast("double")
    parts = per_bin.crossJoin(F.broadcast(tot)).agg(
        ssum(nk * (pbar - ybar_k) * (pbar - ybar_k), scale=scale).alias("rel_sum"),
        ssum(nk * (ybar_k - ybar) * (ybar_k - ybar), scale=scale).alias("res_sum"),
    )
    nd = F.col("n").cast("double")
    base = F.col("n_pos").cast("double") / nd
    return tot.crossJoin(F.broadcast(parts)).select(
        "n",
        base.alias("base_rate"),
        (F.col("brier_sum") / nd).alias("brier"),
        (F.col("rel_sum") / nd).alias("reliability"),
        (F.col("res_sum") / nd).alias("resolution"),
        (base * (F.lit(1.0) - base)).alias("uncertainty"),
    )


_LIFT_DECILES = 10


@register(
    "quality_lift_deciles",
    oracle=f"""
        WITH labeled AS (
            SELECT doc_id, n_chars AS score,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM documents
        ),
        tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM labeled
        ),
        ranked AS (
            SELECT y,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rk
            FROM labeled
        ),
        dec AS (
            SELECT CAST(FLOOR(((rk - 1) * {_LIFT_DECILES}) / n) AS BIGINT)
                       AS decile,
                   y
            FROM ranked CROSS JOIN tot
        ),
        per_dec AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(y) AS BIGINT) AS n_pos_dec
            FROM dec GROUP BY decile
        ),
        cum AS (
            SELECT decile, n_docs, n_pos_dec,
                   CAST(SUM(n_docs) OVER (ORDER BY decile) AS BIGINT) AS cum_n,
                   CAST(SUM(n_pos_dec) OVER (ORDER BY decile) AS BIGINT)
                       AS cum_pos
            FROM per_dec
        )
        SELECT decile, n_docs, n_pos_dec, cum_n, cum_pos,
               CAST(CAST(cum_pos AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
               / CAST(CAST(cum_n AS HUGEINT) * CAST(n_pos AS HUGEINT) AS DOUBLE)
                   AS cum_lift,
               CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE) AS capture_rate
        FROM cum CROSS JOIN tot
    """,
    doc="Cumulative gains / lift table per equal-mass score decile "
    "(score = n_chars descending as the model score, y = lang='en'): "
    "rank every row through the two-level bucketed rank (descending "
    "spelled as ascending on the negated score, tie-broken by doc_id "
    "— never one global window), bucket into "
    f"{_LIFT_DECILES} deciles, then a {_LIFT_DECILES}-row cumulative. "
    "cum_lift = (cum_pos*N)/(cum_n*P) as an exact integer cross- "
    "multiplication (DECIMAL/HUGEINT) with ONE final division. The "
    "standard campaign-targeting gains chart.",
)
def quality_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _persist(
        load(spark, sf_dir, "documents").select(
            "doc_id",
            (-F.col("n_chars")).cast("long").alias("neg_score"),
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("y"),
        )
    )
    n_rows = docs.count()
    ranked = bucketed_value_rank(
        docs,
        part_cols=[],
        value_col="neg_score",
        tie_col="doc_id",
        n_rows=n_rows,
        out_col="rk",
    )
    tot = docs.agg(
        F.count("*").cast("long").alias("n"), F.sum("y").cast("long").alias("n_pos")
    )
    dec = ranked.crossJoin(F.broadcast(tot)).select(
        (((F.col("rk") - 1) * _LIFT_DECILES) / F.col("n")).cast("long").alias(
            "decile"
        ),
        "y",
        "n",
        "n_pos",
    )
    per_dec = dec.groupBy("decile", "n", "n_pos").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("n_pos_dec"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_dec.select(
        "decile",
        "n_docs",
        "n_pos_dec",
        F.sum("n_docs").over(w).cast("long").alias("cum_n"),
        F.sum("n_pos_dec").over(w).cast("long").alias("cum_pos"),
        "n",
        "n_pos",
    )
    return cum.select(
        "decile",
        "n_docs",
        "n_pos_dec",
        "cum_n",
        "cum_pos",
        (
            (F.col("cum_pos").cast(_D19) * F.col("n").cast(_D19)).cast("double")
            / (F.col("cum_n").cast(_D19) * F.col("n_pos").cast(_D19)).cast("double")
        ).alias("cum_lift"),
        (F.col("cum_pos").cast("double") / F.col("n_pos").cast("double")).alias(
            "capture_rate"
        ),
    )
