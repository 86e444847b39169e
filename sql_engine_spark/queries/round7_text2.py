"""Round-7 text set 2: token burstiness (the dispersion-index audit
behind stopword-vs-content-word separation) and position-based (U-shaped)
marketing attribution — one text-statistics operator and one journey
operator, both exact-integer at the core.

Determinism: burstiness's variance-to-mean ratio is a single division
of two exact integer products (DECIMAL/HUGEINT); attribution credits
are fixed rational literals (1, 1/2, 2/5, and 0.2/(L-2) as a shared
double division) reduced through ssum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

_D19 = "decimal(19,0)"
_D38 = "decimal(38,0)"
_BURST_K = 20


@register(
    "text_burstiness",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, token FROM (
                SELECT doc_id, unnest({sql_tokens('text')}) AS token
                FROM documents
            ) WHERE token <> ''
        ),
        per_dt AS (
            SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY token, doc_id
        ),
        per_t AS (
            SELECT token,
                   SUM(CAST(c AS HUGEINT)) AS total,
                   SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS sum_c2,
                   CAST(COUNT(*) AS BIGINT) AS doc_freq
            FROM per_dt GROUP BY token
        ),
        nd AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM documents),
        top AS (
            SELECT token, total, sum_c2, doc_freq
            FROM per_t ORDER BY total DESC, token LIMIT {_BURST_K}
        )
        SELECT token,
               CAST(total AS BIGINT) AS total_count,
               doc_freq,
               CAST(n * sum_c2 - total * total AS DOUBLE)
               / CAST(n * total AS DOUBLE) AS vmr
        FROM top CROSS JOIN nd
    """,
    doc="Token burstiness: the variance-to-mean ratio (dispersion "
    f"index) of per-document counts for the top-{_BURST_K} tokens — "
    "content words are bursty (VMR >> 1: absent from most docs, "
    "repeated where present) while function words are near-Poisson "
    "(Church & Gale 1995; Katz 1996), so this separates topical terms "
    "from glue without any model. Absent-doc zeros are handled in "
    "closed form: VMR = (N*sum(c^2) - total^2)/(N*total) over exact "
    "DECIMAL/HUGEINT integers with ONE final division. Corpus work is "
    "the (token, doc) count; the head selection is TakeOrdered "
    "(sort+limit), never a vocabulary-wide window.",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).where(F.col("token") != "")
    per_dt = tok.groupBy("token", "doc_id").agg(F.count("*").cast("long").alias("c"))
    per_t = per_dt.groupBy("token").agg(
        F.sum(F.col("c").cast(_D38)).alias("total"),
        F.sum(F.col("c").cast(_D19) * F.col("c").cast(_D19)).alias("sum_c2"),
        F.count("*").cast("long").alias("doc_freq"),
    )
    nd = docs.agg(F.count("*").cast(_D19).alias("n"))
    top = per_t.orderBy(F.desc("total"), F.asc("token")).limit(_BURST_K)
    return top.crossJoin(F.broadcast(nd)).select(
        "token",
        F.col("total").cast("long").alias("total_count"),
        "doc_freq",
        (
            (F.col("n") * F.col("sum_c2") - F.col("total") * F.col("total")).cast(
                "double"
            )
            / (F.col("n") * F.col("total")).cast("double")
        ).alias("vmr"),
    )


_ATTR_SCALE = "1000000000.0"


@register(
    "events_attribution_position",
    oracle=f"""
        WITH fp AS (
            SELECT user_id, ts AS fts, event_id AS feid FROM (
                SELECT user_id, ts, event_id,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events WHERE event_type = 'purchase'
            ) WHERE rn = 1
        ),
        touches AS (
            SELECT e.user_id, e.event_id, e.event_type, e.ts
            FROM events e JOIN fp ON e.user_id = fp.user_id
            WHERE e.event_type <> 'purchase'
              AND (e.ts < fp.fts OR (e.ts = fp.fts AND e.event_id < fp.feid))
        ),
        ranked AS (
            SELECT event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rk,
                   COUNT(*) OVER (PARTITION BY user_id) AS len
            FROM touches
        ),
        credited AS (
            SELECT event_type,
                   CASE WHEN len = 1 THEN CAST(1.0 AS DOUBLE)
                        WHEN len = 2 THEN CAST(0.5 AS DOUBLE)
                        WHEN rk = 1 OR rk = len THEN CAST(0.4 AS DOUBLE)
                        ELSE CAST(0.2 AS DOUBLE) / CAST(len - 2 AS DOUBLE)
                   END AS credit
            FROM ranked
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_touches,
               {sql_ssum("credit", scale=_ATTR_SCALE)} AS total_credit
        FROM credited
        GROUP BY event_type
    """,
    doc="Position-based (U-shaped) attribution: each user's touchpoints "
    "before their FIRST purchase share credit 40% first / 40% last / "
    "20% split across the middle (1.0 and 0.5/0.5 for 1- and 2-touch "
    "journeys) — the standard middle ground between first-touch and "
    "Markov removal (both already in the registry). Per-user windows "
    "only (bounded history); credits are fixed rational literals with "
    "the one data-dependent division (0.2/(L-2)) spelled identically "
    "in both engines; the per-channel reduction crosses engines via "
    "ssum. Credit mass conservation (sum = #users with touches) is "
    "pinned in tests.",
)
def events_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id", F.row_number().over(wp).alias("rn")
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id", F.col("ts").alias("fts"), F.col("event_id").alias("feid")
        )
    )
    touches = (
        ev.where(F.col("event_type") != "purchase")
        .join(fp, "user_id")
        .where(
            (F.col("ts") < F.col("fts"))
            | ((F.col("ts") == F.col("fts")) & (F.col("event_id") < F.col("feid")))
        )
        .select("user_id", "event_id", "event_type", "ts")
    )
    wu = Window.partitionBy("user_id")
    ranked = touches.select(
        "event_type",
        F.row_number().over(wp).alias("rk"),
        F.count("*").over(wu).alias("len"),
    )
    credit = (
        F.when(F.col("len") == 1, F.lit(1.0))
        .when(F.col("len") == 2, F.lit(0.5))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("len")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("len") - 2).cast("double"))
    )
    return (
        ranked.select("event_type", credit.alias("credit"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            ssum(F.col("credit"), scale=float(_ATTR_SCALE)).alias("total_credit"),
        )
    )
