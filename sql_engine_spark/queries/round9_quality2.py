"""Round-9 late quality/monitoring batch: kNN label-noise candidates
over the shared embedding graph, the EWMA control chart on the daily
series, and per-user bot-regularity flags.

House discipline: the kNN consumer SCANS the shared materialized graph
(SURVEY 7.6), the EWMA recurrence uses the exact halving fold (binary
alpha = 1/2 — no libm pow), inter-arrival gaps are exact integers via
the trunc-to-second timestampdiff device (events.py sessionize
convention), and every non-binary-exact constant is pinned CAST(AS
DOUBLE).

The reference engine has none of this surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# emb_label_noise_candidates — Confident-Learning-style noise screen
# ---------------------------------------------------------------------------

_NOISE_MIN_DISAGREE = 4


def _noise_oracle() -> str:
    from sql_engine_spark.operators.graph import sql_knn_shared

    return f"""
        WITH knn AS ({sql_knn_shared()}),
        j AS (
            SELECT k.src, es.label AS own_label, ed.label AS nb_label
            FROM knn k
            JOIN embeddings es ON k.src = es.vec_id
            JOIN embeddings ed ON k.dst = ed.vec_id
        )
        SELECT src AS vec_id, own_label AS label,
               CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(SUM(CASE WHEN nb_label != own_label THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_disagree,
               SUM(CASE WHEN nb_label != own_label THEN 1 ELSE 0 END)
                   >= {_NOISE_MIN_DISAGREE} AS is_candidate
        FROM j GROUP BY src, own_label
    """


@register(
    "emb_label_noise_candidates",
    oracle=_noise_oracle(),
    doc="Label-noise candidate screen over the SHARED kNN graph "
    "(the neighborhood-disagreement heuristic behind Confident "
    "Learning / Cleanlab triage, Northcutt et al. JAIR 2021): a vector "
    f"whose label disagrees with >= {_NOISE_MIN_DISAGREE} of its (up "
    "to) 5 approximate nearest neighbors is flagged for relabel "
    "review. Mislabeled examples measurably damage fine-tune quality; "
    "this is the cheap first-pass triage a labeling pipeline runs "
    "before paying for human re-review. One scan of the materialized "
    "graph + two broadcast label joins + a bounded aggregate — the "
    "20th consumer of the shared build, costing no new similarity "
    "search.",
)
def emb_label_noise_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.graph import knn_graph_shared

    knn = knn_graph_shared(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "label")
    own = emb.select(
        F.col("vec_id").alias("src"), F.col("label").alias("own_label")
    )
    nb = emb.select(
        F.col("vec_id").alias("dst"), F.col("label").alias("nb_label")
    )
    j = knn.join(F.broadcast(own), "src").join(F.broadcast(nb), "dst")
    dis = F.sum(
        F.when(F.col("nb_label") != F.col("own_label"), 1).otherwise(0)
    )
    return j.groupBy(
        F.col("src").alias("vec_id"), F.col("own_label").alias("label")
    ).agg(
        F.count("*").cast("long").alias("n_neighbors"),
        dis.cast("long").alias("n_disagree"),
        (dis >= _NOISE_MIN_DISAGREE).alias("is_candidate"),
    )


# ---------------------------------------------------------------------------
# events_ewma_control_chart — Roberts EWMA chart on the daily series
# ---------------------------------------------------------------------------

_EWMA_CC_W = 16

_SQL_DAILY = """daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        )"""


@register(
    "events_ewma_control_chart",
    oracle=f"""
        WITH {_SQL_DAILY},
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(cnt) AS BIGINT) AS s,
                   CAST(SUM(cnt * cnt) AS BIGINT) AS ss
            FROM daily
        ),
        lim AS (
            SELECT CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS center,
                   3.0 * sqrt((CAST(ss AS DOUBLE)
                               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                                 / CAST(n AS DOUBLE))
                              / CAST(n - 1 AS DOUBLE))
                       * sqrt(1.0 / 3.0) AS half_width
            FROM m
        ),
        w AS (
            SELECT day, cnt,
                   list(CAST(cnt AS DOUBLE)) OVER (
                       ORDER BY day
                       ROWS BETWEEN {_EWMA_CC_W - 1} PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM daily
        ),
        e AS (
            SELECT day, cnt,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                               (a, x) -> a * 0.5 + x)
                   / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                           list_transform(vals, x -> CAST(1.0 AS DOUBLE))),
                               (a, x) -> a * 0.5 + x) AS ewma
            FROM w
        )
        SELECT day, cnt, ewma, center,
               center - half_width AS lcl,
               center + half_width AS ucl,
               ewma < center - half_width OR ewma > center + half_width
                   AS out_of_control
        FROM e CROSS JOIN lim
    """,
    doc="EWMA control chart on the daily event rate (Roberts, "
    "Technometrics 1959; the small-shift-sensitive companion to the "
    "Shewhart chart): the smoothed statistic uses the exact HALVING "
    "fold (alpha = 1/2, 16-day frame — binary arithmetic, bit-identical "
    "across engines, the events_ewma_half device on the calendar grid), "
    "and the control limits are center +- 3 * sigma * sqrt(lambda/"
    "(2-lambda)) with lambda = 1/2 giving the exact rational factor "
    "sqrt(1/3); sigma comes from EXACT BIGINT count moments. "
    "Complements Page-Hinkley (drift-since-low) and CUSUM (single "
    "level shift) with the classic steady-state in/out-of-control "
    "banding. Calendar-bounded windows only.",
)
def events_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    return ewma_cc_from_daily(daily)


def ewma_cc_from_daily(daily: DataFrame) -> DataFrame:
    """EWMA control chart over a (day, cnt) relation — shared by the
    batch operator and the fleet streaming twin."""
    m = daily.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("ss"),
    )
    nd = F.col("n").cast("double")
    lim = m.select(
        (F.col("s").cast("double") / nd).alias("center"),
        (
            F.lit(3.0)
            * F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double") / nd
                )
                / (F.col("n") - 1).cast("double")
            )
            * F.sqrt(F.lit(1.0) / F.lit(3.0))
        ).alias("half_width"),
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-(_EWMA_CC_W - 1), Window.currentRow)
    )
    e = daily.withColumn(
        "__vals", F.collect_list(F.col("cnt").cast("double")).over(w)
    ).select(
        "day",
        "cnt",
        (
            F.expr(
                "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
            )
            / F.expr(
                "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + 1.0D)"
            )
        ).alias("ewma"),
    )
    out = e.crossJoin(F.broadcast(lim))
    lcl = F.col("center") - F.col("half_width")
    ucl = F.col("center") + F.col("half_width")
    return out.select(
        "day",
        "cnt",
        "ewma",
        "center",
        lcl.alias("lcl"),
        ucl.alias("ucl"),
        ((F.col("ewma") < lcl) | (F.col("ewma") > ucl)).alias(
            "out_of_control"
        ),
    )


# ---------------------------------------------------------------------------
# events_bot_regularity_flags — machine-like inter-arrival regularity
# ---------------------------------------------------------------------------

_BOT_MIN_GAPS = 10
_BOT_CV2 = "0.1"


@register(
    "events_bot_regularity_flags",
    oracle=f"""
        WITH g AS (
            SELECT user_id,
                   date_diff('second', lag(ts) OVER w, ts) AS gap
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        u AS (
            SELECT user_id,
                   CAST(COUNT(gap) AS BIGINT) AS n_gaps,
                   CAST(SUM(gap) AS BIGINT) AS s,
                   CAST(SUM(gap * gap) AS BIGINT) AS ss
            FROM g WHERE gap IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, n_gaps,
               CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_gap_s,
               ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n_gaps AS DOUBLE)) / CAST(n_gaps - 1 AS DOUBLE))
                   / ((CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                   AS cv2,
               ((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n_gaps AS DOUBLE)) / CAST(n_gaps - 1 AS DOUBLE))
                   / ((CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                      * (CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
                   < CAST({_BOT_CV2} AS DOUBLE) AS bot_like
        FROM u WHERE n_gaps >= {_BOT_MIN_GAPS} AND s > 0
    """,
    doc="Bot/automation regularity screen per user: squared coefficient "
    "of variation of inter-event gaps, CV^2 = var/mean^2. A Poisson "
    "(human-ish) arrival process has CV^2 ~ 1; schedulers and scripts "
    "fire on near-constant intervals, CV^2 -> 0 — the classic "
    "traffic-fingerprinting feature (cf. burstiness measures in "
    "Barabasi 2005, and the text_burstiness twin on tokens). Flags "
    f"users with >= {_BOT_MIN_GAPS} gaps and CV^2 < {_BOT_CV2} "
    "(pinned literal). Bot text/PII poisons training mixtures, so the "
    "upstream user-level screen is a data-pipeline operator, not just "
    "an anti-abuse one. Gaps are EXACT INTEGER seconds (trunc-to-"
    "second timestampdiff, the sessionize device), so all moments are "
    "BIGINT-exact; one user-keyed window + one rollup.",
)
def events_bot_regularity_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), "
        "date_trunc('second', ts))"
    )
    g = ev.select("user_id", gap.alias("gap")).where(F.col("gap").isNotNull())
    u = g.groupBy("user_id").agg(
        F.count("gap").cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(F.col("gap") * F.col("gap")).cast("long").alias("ss"),
    )
    nd = F.col("n_gaps").cast("double")
    mean = F.col("s").cast("double") / nd
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / nd
    ) / (F.col("n_gaps") - 1).cast("double")
    cv2 = var / (mean * mean)
    return u.where(
        (F.col("n_gaps") >= _BOT_MIN_GAPS) & (F.col("s") > 0)
    ).select(
        "user_id",
        "n_gaps",
        mean.alias("mean_gap_s"),
        cv2.alias("cv2"),
        (cv2 < F.lit(float(_BOT_CV2))).alias("bot_like"),
    )
