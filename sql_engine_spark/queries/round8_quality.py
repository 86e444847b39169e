"""Round-8 model-evaluation kit, part 2: threshold-space confusion
sweep, Matthews correlation, Youden-J operating point, and multiclass
macro-F1 — completing the binary-scorer evaluation family
(quality_roc_auc / quality_pr_auc / quality_ece / quality_lift_deciles)
with the OPERATING-POINT side: what happens when you actually pick a
cutoff.

Scorer under test (shared with the AUC family): document length
n_chars against the binary label lang = 'en'. All confusion cells are
EXACT INTEGERS from cumulative counts over the DISTINCT-SCORE relation
(the domain-decomposition house device — no per-threshold corpus
rescan); derived metrics are exact rationals with one final division,
or sqrt of exact integers (MCC) — no libm in hashed outputs. The
reference engine has no evaluation surface (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.registry import register

# Threshold grid for the confusion sweep: predict positive when
# score >= t. Spans the observed n_chars range (47..558 at sf0.001).
_THRESHOLDS = (100, 150, 200, 250, 300, 400)

_CONFUSION_SQL = f"""
        labeled AS (
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
            SELECT score,
                   CAST(SUM(c_pos) OVER (ORDER BY score
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pos_le,
                   CAST(SUM(c_neg) OVER (ORDER BY score
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS neg_le
            FROM per_score
        ),
        th(t) AS (VALUES {", ".join(f"({t})" for t in _THRESHOLDS)}),
        cells AS (
            SELECT CAST(t AS BIGINT) AS threshold,
                   n_pos - COALESCE(MAX(CASE WHEN score < t THEN pos_le END),
                                    0) AS tp,
                   n_neg - COALESCE(MAX(CASE WHEN score < t THEN neg_le END),
                                    0) AS fp,
                   COALESCE(MAX(CASE WHEN score < t THEN pos_le END), 0) AS fn,
                   COALESCE(MAX(CASE WHEN score < t THEN neg_le END), 0) AS tn
            FROM th CROSS JOIN tot LEFT JOIN cum ON TRUE
            GROUP BY t, n_pos, n_neg
        )"""


def _confusion_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(threshold, tp, fp, fn, tn) — exact integers for every grid
    threshold, from ONE pass to the distinct-score relation: a pair of
    cumulative counts at each score, then per-threshold cells read off
    the largest score below t. No per-threshold corpus rescan."""
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    tot = docs.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    per_score = docs.groupBy("score").agg(
        F.sum("y").cast("long").alias("c_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("c_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    cum = _persist(
        per_score.select(
            "score",
            F.sum("c_pos").over(w).cast("long").alias("pos_le"),
            F.sum("c_neg").over(w).cast("long").alias("neg_le"),
        )
    )
    th = spark.createDataFrame([(t,) for t in _THRESHOLDS], "t long")
    below = (
        F.broadcast(th)
        .crossJoin(cum)
        .where(F.col("score") < F.col("t"))
        .groupBy("t")
        .agg(
            F.max("pos_le").cast("long").alias("pos_below"),
            F.max("neg_le").cast("long").alias("neg_below"),
        )
    )
    return (
        th.join(below, "t", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("t").alias("threshold"),
            (F.col("n_pos") - F.coalesce("pos_below", F.lit(0))).alias("tp"),
            (F.col("n_neg") - F.coalesce("neg_below", F.lit(0))).alias("fp"),
            F.coalesce("pos_below", F.lit(0)).alias("fn"),
            F.coalesce("neg_below", F.lit(0)).alias("tn"),
        )
    )


@register(
    "quality_confusion_sweep",
    oracle=f"""
        WITH {_CONFUSION_SQL}
        SELECT threshold, tp, fp, fn, tn,
               CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision_,
               CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall_,
               (2.0 * CAST(tp AS DOUBLE))
                   / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
        FROM cells
    """,
    doc="Confusion-matrix sweep of the n_chars->lang='en' scorer over "
    f"the threshold grid {_THRESHOLDS} (predict positive when score "
    ">= t): exact integer TP/FP/FN/TN per threshold from ONE pair of "
    "cumulative counts over the DISTINCT-SCORE relation (the "
    "quality_roc_auc domain-decomposition device — a threshold's "
    "cells are the cumulative counts at the largest score below it, "
    "so the sweep never rescans the corpus), plus precision/recall/F1 "
    "as exact rationals with one final division each (F1 spelled "
    "2TP/(2TP+FP+FN) — a single division, no P*R/(P+R) intermediate "
    "rounding). The operating-point companion to quality_roc_auc's "
    "threshold-free ranking view.",
)
def quality_confusion_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _confusion_cells(spark, sf_dir)
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cells.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        (tp.cast("double") / (tp + fp).cast("double")).alias("precision_"),
        (tp.cast("double") / (tp + fn).cast("double")).alias("recall_"),
        (
            (F.lit(2.0) * tp.cast("double"))
            / (2 * tp + fp + fn).cast("double")
        ).alias("f1"),
    )


@register(
    "quality_mcc_sweep",
    oracle=f"""
        WITH {_CONFUSION_SQL}
        SELECT threshold, tp, fp, fn, tn,
               (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
               / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                      * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE))
                   AS mcc
        FROM cells
    """,
    doc="Matthews correlation coefficient at every grid threshold — "
    "the balanced single-number summary of the confusion matrix "
    "(Matthews 1975), robust where accuracy and F1 mislead on "
    "imbalanced labels (the en/non-en split is ~40/60): MCC = "
    "(TP*TN - FP*FN) / sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)). Cells are "
    "the same exact integers as quality_confusion_sweep (shared "
    "distinct-score cumulative device); the numerator products cast "
    "to double BEFORE multiplying (cell counts can be ~1e11 at "
    "100 TB, so the integer product would overflow BIGINT; the "
    "double product is identical IEEE in both engines), and the only "
    "non-arithmetic op is one sqrt.",
)
def quality_mcc_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _confusion_cells(spark, sf_dir)
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    mcc = (d("tp") * d("tn") - d("fp") * d("fn")) / F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn")).cast("double")
        * (F.col("tn") + F.col("fp")).cast("double")
        * (F.col("tn") + F.col("fn")).cast("double")
    )
    return cells.select("threshold", "tp", "fp", "fn", "tn", mcc.alias("mcc"))


@register(
    "quality_youden_threshold",
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
            SELECT score,
                   CAST(COALESCE(SUM(c_pos) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS pos_below,
                   CAST(COALESCE(SUM(c_neg) OVER (ORDER BY score
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS BIGINT) AS neg_below
            FROM per_score
        ),
        j AS (
            SELECT score AS threshold,
                   n_pos - pos_below AS tp, n_neg - neg_below AS fp,
                   pos_below AS fn, neg_below AS tn,
                   (n_pos - pos_below) * n_neg - (n_neg - neg_below) * n_pos
                       AS j_num
            FROM cum CROSS JOIN tot
        )
        SELECT threshold, tp, fp, fn, tn,
               CAST(j_num AS DOUBLE)
                   / (CAST((SELECT n_pos FROM tot) AS DOUBLE)
                      * CAST((SELECT n_neg FROM tot) AS DOUBLE)) AS youden_j
        FROM j
        ORDER BY j_num DESC, threshold ASC
        LIMIT 1
    """,
    doc="Youden-J optimal operating point: the score threshold "
    "maximizing J = TPR - FPR = TP/P - FP/N over EVERY candidate "
    "cutoff (each distinct score), not just a fixed grid — the "
    "standard ROC-curve operating-point picker (Youden 1950). The "
    "argmax runs on the EXACT INTEGER cross-multiplied numerator "
    "TP*N - FP*P over the distinct-score relation (ties break to the "
    "smallest threshold in both engines — no double comparison "
    "decides the winner); J itself divides once at the end. Same "
    "cumulative domain-decomposition as the sweep operators.",
)
def quality_youden_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    tot = docs.agg(
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("n_neg"),
    )
    per_score = docs.groupBy("score").agg(
        F.sum("y").cast("long").alias("c_pos"),
        F.sum(1 - F.col("y")).cast("long").alias("c_neg"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_score.select(
        "score",
        F.coalesce(F.sum("c_pos").over(w), F.lit(0)).cast("long").alias("pos_below"),
        F.coalesce(F.sum("c_neg").over(w), F.lit(0)).cast("long").alias("neg_below"),
    )
    j = cum.crossJoin(F.broadcast(tot)).select(
        F.col("score").alias("threshold"),
        (F.col("n_pos") - F.col("pos_below")).alias("tp"),
        (F.col("n_neg") - F.col("neg_below")).alias("fp"),
        F.col("pos_below").alias("fn"),
        F.col("neg_below").alias("tn"),
        (
            (F.col("n_pos") - F.col("pos_below")) * F.col("n_neg")
            - (F.col("n_neg") - F.col("neg_below")) * F.col("n_pos")
        ).alias("j_num"),
        "n_pos",
        "n_neg",
    )
    wbest = Window.orderBy(F.desc("j_num"), F.asc("threshold"))
    return (
        j.withColumn("__rk", F.row_number().over(wbest))
        .where(F.col("__rk") == 1)
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            "tn",
            (
                F.col("j_num").cast("double")
                / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
            ).alias("youden_j"),
        )
    )


@register(
    "quality_macro_f1_lang",
    oracle="""
        WITH pred AS (
            SELECT doc_id, lang,
                   CASE WHEN n_chars % 5 = 0 THEN 'en'
                        WHEN n_chars % 5 = 1 THEN 'fr'
                        WHEN n_chars % 5 = 2 THEN 'de'
                        WHEN n_chars % 5 = 3 THEN 'es'
                        ELSE 'zh' END AS pred_lang
            FROM documents
        ),
        classes AS (SELECT DISTINCT lang AS cls FROM documents),
        per_class AS (
            SELECT c.cls,
                   CAST(COALESCE(SUM(CASE WHEN p.lang = c.cls
                             AND p.pred_lang = c.cls THEN 1 END), 0)
                        AS BIGINT) AS tp,
                   CAST(COALESCE(SUM(CASE WHEN p.lang <> c.cls
                             AND p.pred_lang = c.cls THEN 1 END), 0)
                        AS BIGINT) AS fp,
                   CAST(COALESCE(SUM(CASE WHEN p.lang = c.cls
                             AND p.pred_lang <> c.cls THEN 1 END), 0)
                        AS BIGINT) AS fn
            FROM classes c LEFT JOIN pred p ON TRUE
            GROUP BY c.cls
        )
        SELECT cls, tp, fp, fn,
               (2.0 * CAST(tp AS DOUBLE))
                   / CAST(2 * tp + fp + fn AS DOUBLE) AS f1
        FROM per_class
    """,
    doc="Per-class F1 of a deterministic multiclass baseline predictor "
    "(n_chars mod 5 mapped onto the 5 language classes — a fixed "
    "length-hash rule, deliberately weak: the operator under test is "
    "the EVALUATOR, and a near-random predictor exercises every "
    "confusion cell) against the true lang label. Per-class TP/FP/FN "
    "are exact integers from one (label, prediction)-conditional "
    "aggregate per class over the class grid (5 classes — bounded "
    "broadcast relation); F1 = 2TP/(2TP+FP+FN) is one division. The "
    "macro average is the caller's trivial mean over this relation — "
    "emitting per-class rows keeps every cell auditable (and "
    "hash-checkable) instead of one opaque scalar.",
)
def quality_macro_f1_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    pred = docs.select(
        "lang",
        F.when(F.col("n_chars") % 5 == 0, "en")
        .when(F.col("n_chars") % 5 == 1, "fr")
        .when(F.col("n_chars") % 5 == 2, "de")
        .when(F.col("n_chars") % 5 == 3, "es")
        .otherwise("zh")
        .alias("pred_lang"),
    )
    classes = docs.select(F.col("lang").alias("cls")).distinct()
    joined = F.broadcast(classes).crossJoin(pred)
    per_class = joined.groupBy("cls").agg(
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") != F.col("cls"))
                    & (F.col("pred_lang") == F.col("cls")),
                    1,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("fp"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("lang") == F.col("cls"))
                    & (F.col("pred_lang") != F.col("cls")),
                    1,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("fn"),
    )
    return per_class.select(
        "cls",
        "tp",
        "fp",
        "fn",
        (
            (F.lit(2.0) * F.col("tp").cast("double"))
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double")
        ).alias("f1"),
    )
