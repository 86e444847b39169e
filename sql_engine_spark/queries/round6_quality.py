"""Round-6 quality-measurement operators: inter-rater agreement between
two quality signals, score calibration against rule-based truth, and a
seasonal-naive forecast backtest.

Measurement discipline as everywhere in this repo: exact integer
contingency/decile counts, decimal-exact means, single shared-order
double divisions, no libm log — Cohen's kappa and calibration curves
are exact rationals, which is why they hash where an AUC (rank-sum of
ties under floating scores) would be fragile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators import text as T
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.operators.text import (
    hashed_linear_score,
    sql_hashed_linear_score,
)
from sql_engine_spark.registry import _REGISTRY, register


@register(
    "curation_rater_agreement_kappa",
    oracle=None,  # spliced below (composes the gopher oracle)
    doc="Cohen's kappa between the repo's two quality raters — the "
    "Gopher rule conjunction and the hashed-linear classifier "
    "(score > 0, its native decision threshold) — per source: "
    "chance-corrected agreement kappa = (po - pe) / (1 - pe) from the "
    "exact 2x2 contingency counts. THE metric for deciding whether "
    "two filters are redundant or complementary before stacking them "
    "in a pipeline (and the standard label-quality check when one "
    "'rater' is a human pass). One map pass computes both verdicts "
    "per doc; the contingency table is a bounded per-source "
    "aggregate; kappa is an exact rational evaluated in shared double "
    "order.",
)
def curation_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    gq = T.gopher_quality(docs, "text", "doc_id").select(
        "doc_id", F.col("pass_gopher").alias("a")
    )
    sc = hashed_linear_score(
        docs, id_col="doc_id", text_col="text", carry_cols=["source"]
    ).select("doc_id", "source", (F.col("score") > 0).alias("b"))
    j = sc.join(gq, "doc_id")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    g = j.groupBy("source").agg(
        F.count("*").cast("long").alias("n"),
        one(F.col("a") & F.col("b")).alias("n11"),
        one(F.col("a") & ~F.col("b")).alias("n10"),
        one(~F.col("a") & F.col("b")).alias("n01"),
        one(~F.col("a") & ~F.col("b")).alias("n00"),
    )
    nD = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / nD
    pe = (
        ((F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))).cast(
            "double"
        )
        + ((F.col("n00") + F.col("n01")) * (F.col("n00") + F.col("n10"))).cast(
            "double"
        )
    ) / (nD * nD)
    return g.select(
        "source",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


def _kappa_oracle() -> str:
    gopher = _REGISTRY["text_gopher_quality"].oracle
    return f"""
        WITH gq AS (SELECT doc_id, pass_gopher AS a FROM ({gopher})),
        sc AS (
            SELECT s.doc_id, d.source, s.score > 0 AS b
            FROM ({sql_hashed_linear_score()}) s
            JOIN documents d USING (doc_id)
        ),
        j AS (SELECT sc.source, gq.a, sc.b FROM sc JOIN gq USING (doc_id)),
        g AS (
            SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
                   CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
                   CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01,
                   CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00
            FROM j GROUP BY source
        )
        SELECT source, n, n11, n10, n01, n00,
               CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE) AS po,
               (CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                + CAST((n00 + n01) * (n00 + n10) AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
               ((CAST(n11 + n00 AS DOUBLE) / CAST(n AS DOUBLE))
                - ((CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                    + CAST((n00 + n01) * (n00 + n10) AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
               / (1.0 - ((CAST((n11 + n10) * (n11 + n01) AS DOUBLE)
                          + CAST((n00 + n01) * (n00 + n10) AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) AS kappa
        FROM g
    """


_REGISTRY["curation_rater_agreement_kappa"].oracle = _kappa_oracle()


_CAL_BUCKETS = 10


@register(
    "curation_score_calibration",
    oracle=None,  # spliced below
    doc="Calibration curve for the hashed-linear quality score against "
    "the Gopher rule verdict: docs are split into 10 equal-mass score "
    "deciles (GLOBAL rank via the bucketed two-level scan — never a "
    "single-task sort) and each decile reports its empirical pass "
    "rate and decimal-exact mean score — the reliability diagram "
    "(Niculescu-Mizil & Caruana 2005) read before trusting a scorer's "
    "threshold. A well-calibrated scorer's pass rate rises "
    "monotonically across deciles; flat segments mark score ranges "
    "the filter cannot separate.",
)
def curation_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    gq = T.gopher_quality(docs, "text", "doc_id").select(
        "doc_id", F.col("pass_gopher").alias("label")
    )
    scored = _persist(
        hashed_linear_score(docs, id_col="doc_id", text_col="text")
        .select("doc_id", "score")
        .join(gq, "doc_id")
    )
    n_rows = scored.count()
    ranked = bucketed_value_rank(
        scored,
        part_cols=[],
        value_col="score",
        tie_col="doc_id",
        n_rows=n_rows,
        out_col="rk",
    )
    n = scored.agg(F.count("*").cast("long").alias("n"))
    dec = ranked.crossJoin(F.broadcast(n)).select(
        (((F.col("rk") - 1) * _CAL_BUCKETS) / F.col("n"))
        .cast("long")
        .alias("decile"),
        "score",
        "label",
    )
    return dec.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_docs"),
        (dsum("score") / F.count("*")).alias("mean_score"),
        F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("long").alias("n_pass"),
        (
            F.sum(F.when(F.col("label"), 1).otherwise(0)).cast("double")
            / F.count("*").cast("double")
        ).alias("pass_rate"),
    )


def _calibration_oracle() -> str:
    gopher = _REGISTRY["text_gopher_quality"].oracle
    return f"""
        WITH gq AS (SELECT doc_id, pass_gopher AS label FROM ({gopher})),
        scored AS (
            SELECT s.doc_id, s.score, gq.label
            FROM ({sql_hashed_linear_score()}) s JOIN gq USING (doc_id)
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
        r AS (
            SELECT score, label,
                   CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)
                       AS rk
            FROM scored
        ),
        dec AS (
            SELECT CAST(FLOOR(((rk - 1) * {_CAL_BUCKETS}) / n.n) AS BIGINT)
                       AS decile,
                   score, label
            FROM r CROSS JOIN n
        )
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               {sql_dsum('score')} / COUNT(*) AS mean_score,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS pass_rate
        FROM dec GROUP BY decile
    """


_REGISTRY["curation_score_calibration"].oracle = _calibration_oracle()


@register(
    "events_seasonal_naive_backtest",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ),
        paired AS (
            SELECT a.day, a.cnt AS actual, f.cnt AS forecast
            FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
        )
        SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_dsum('CAST(abs(actual - forecast) AS DOUBLE)')} / COUNT(*)
                   AS mae,
               {sql_dsum('CAST(actual - forecast AS DOUBLE)')} / COUNT(*)
                   AS mean_bias
        FROM paired GROUP BY 1
    """,
    doc="Seasonal-naive forecast backtest: predict each day's event "
    "count with the SAME WEEKDAY one week earlier (the baseline every "
    "forecasting system must beat — Hyndman's 'snaive'), and report "
    "MAE and mean bias per day-of-week over the full history. Errors "
    "are exact integer differences reduced through decimal; the "
    "calendar-bounded day relation makes the self-join and windows "
    "trivially safe at any corpus size. DOW convention pinned to "
    "Spark's dayofweek.",
)
def events_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = _persist(
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
            F.count("*").cast("long").alias("cnt")
        )
    )
    a = daily.alias("a")
    f = daily.alias("f")
    paired = a.join(
        f, F.col("f.day") == F.date_sub(F.col("a.day"), 7)
    ).select(
        F.col("a.day").alias("day"),
        F.col("a.cnt").alias("actual"),
        F.col("f.cnt").alias("forecast"),
    )
    err = (F.col("actual") - F.col("forecast")).cast("double")
    return paired.groupBy(
        F.dayofweek("day").cast("long").alias("dow")
    ).agg(
        F.count("*").cast("long").alias("n_days"),
        (dsum(F.abs(err)) / F.count("*")).alias("mae"),
        (dsum(err) / F.count("*")).alias("mean_bias"),
    )


@register(
    "text_langid_confusion",
    oracle=None,  # spliced below from the lang-id oracle
    doc="Language-ID confusion matrix: (labeled, predicted) counts plus "
    "per-true-language recall — the evaluation every classifier gate "
    "needs before its predictions route documents (a filter that "
    "misroutes one language silently biases the mixture; per-class "
    "recall is the row a mixture owner actually reads). Composes "
    "text_lang_id (stopword-vote prediction, pure map work); the "
    "matrix is one bounded (true, pred) aggregate and recall a "
    "per-true-language join.",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.text import text_lang_id

    pred = text_lang_id(spark, sf_dir)
    m = pred.groupBy(
        F.col("labeled_lang").alias("lang_true"),
        F.col("predicted_lang").alias("lang_pred"),
    ).agg(F.count("*").cast("long").alias("n"))
    totals = m.groupBy(F.col("lang_true").alias("__t")).agg(
        F.sum("n").cast("long").alias("n_true")
    )
    return (
        m.join(F.broadcast(totals), F.col("lang_true") == F.col("__t"))
        .select(
            "lang_true",
            "lang_pred",
            "n",
            (F.col("n").cast("double") / F.col("n_true").cast("double")).alias(
                "frac_of_true"
            ),
        )
    )


def _langid_confusion_oracle() -> str:
    langid = _REGISTRY["text_lang_id"].oracle
    return f"""
        WITH pred AS ({langid}),
        m AS (
            SELECT labeled_lang AS lang_true, predicted_lang AS lang_pred,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM pred GROUP BY 1, 2
        ),
        t AS (
            SELECT lang_true, CAST(SUM(n) AS BIGINT) AS n_true
            FROM m GROUP BY lang_true
        )
        SELECT m.lang_true, m.lang_pred, m.n,
               CAST(m.n AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS frac_of_true
        FROM m JOIN t USING (lang_true)
    """


_REGISTRY["text_langid_confusion"].oracle = _langid_confusion_oracle()


@register(
    "emb_knn_label_accuracy",
    oracle=None,  # spliced below from the kNN-graph oracle
    doc="kNN label-vote accuracy over the embedding graph: each vector "
    "predicted as the MAJORITY label of its (up to) 5 approximate "
    "nearest neighbors (ties to the smallest label — deterministic), "
    "scored against its own label, reported per class — the "
    "leave-one-out sanity check that the embedding space actually "
    "separates the labels (the companion to ann_centroid_classify's "
    "centroid rule: kNN-vote is the local/nonparametric evaluation). "
    "Composes the kNN graph (bounded out-degree); the vote is one "
    "(node, label) count + a node-keyed argmax window over <= k "
    "candidate rows.",
)
def emb_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from sql_engine_spark.operators.graph import knn_graph_shared

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph_shared(spark, sf_dir)
    labels = emb.select("vec_id", "label")
    votes = (
        g.join(
            labels.select(
                F.col("vec_id").alias("dst"), F.col("label").alias("nb_label")
            ),
            "dst",
        )
        .groupBy("src", "nb_label")
        .agg(F.count("*").cast("long").alias("v"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("v"), F.asc("nb_label"))
    pred = (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("src", F.col("nb_label").alias("pred_label"))
    )
    scored = pred.join(
        labels.select(F.col("vec_id").alias("src"), F.col("label").alias("true_label")),
        "src",
    )
    return scored.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        (
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("double")
            / F.count("*").cast("double")
        ).alias("accuracy"),
    )


def _knn_label_oracle() -> str:
    from sql_engine_spark.operators.graph import sql_knn_shared

    return f"""
        WITH knn AS ({sql_knn_shared()}),
        votes AS (
            SELECT k.src, e.label AS nb_label, CAST(COUNT(*) AS BIGINT) AS v
            FROM knn k JOIN embeddings e ON k.dst = e.vec_id
            GROUP BY k.src, e.label
        ),
        pred AS (
            SELECT src, nb_label AS pred_label FROM (
                SELECT src, nb_label,
                       row_number() OVER (
                           PARTITION BY src ORDER BY v DESC, nb_label) AS rk
                FROM votes
            ) WHERE rk = 1
        ),
        scored AS (
            SELECT e.label AS true_label, p.pred_label
            FROM pred p JOIN embeddings e ON p.src = e.vec_id
        )
        SELECT true_label AS label,
               CAST(COUNT(*) AS BIGINT) AS n_scored,
               CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
        FROM scored GROUP BY true_label
    """


_REGISTRY["emb_knn_label_accuracy"].oracle = _knn_label_oracle()
