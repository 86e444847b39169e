"""Round-9 late text/events batch: boilerplate prefix detection,
circular hour-of-day statistics (Rayleigh test via the literal trig
grid), and the attribution-window sensitivity sweep.

House discipline: trig of the 24 clock angles is a module-import
LITERAL array (no runtime transcendental), timestamp arithmetic stays
in ntz + day-time intervals (no session-tz function), small double
folds cross engines via ssum, and counts are exact BIGINTs.

The reference engine has none of this surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.textprep import sql_tokens, tokens
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# text_boilerplate_prefix — shared-prefix boilerplate detection
# ---------------------------------------------------------------------------

_BP_MAXPOS = 20


@register(
    "text_boilerplate_prefix",
    oracle=f"""
        WITH toks AS (
            SELECT source, doc_id, {sql_tokens('text')} AS t FROM documents
        ),
        nd AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM toks GROUP BY source
        ),
        pos AS (
            SELECT source, doc_id, CAST(i AS BIGINT) AS pos, t[i] AS token
            FROM (SELECT source, doc_id, t,
                         unnest(range(1, least(len(t), {_BP_MAXPOS}) + 1)) AS i
                  FROM toks)
        ),
        agree AS (
            SELECT p.source, p.pos,
                   CAST(COUNT(*) AS BIGINT) AS n_at_pos,
                   CAST(COUNT(DISTINCT p.token) AS BIGINT) AS n_distinct,
                   MIN(p.token) AS token
            FROM pos p GROUP BY p.source, p.pos
        ),
        lcp AS (
            SELECT a.source,
                   COALESCE(MIN(CASE WHEN NOT (a.n_at_pos = nd.n_docs
                                               AND a.n_distinct = 1)
                                     THEN a.pos END),
                            {_BP_MAXPOS + 1}) - 1 AS lcp
            FROM agree a JOIN nd USING (source)
            GROUP BY a.source
        )
        SELECT nd.source, nd.n_docs, lcp.lcp,
               COALESCE(string_agg(a.token, ' ' ORDER BY a.pos), '')
                   AS prefix_text
        FROM nd
        JOIN lcp USING (source)
        LEFT JOIN agree a ON a.source = nd.source AND a.pos <= lcp.lcp
        GROUP BY nd.source, nd.n_docs, lcp.lcp
    """,
    doc="Boilerplate shared-prefix detector per source (the RefinedWeb/"
    "CCNet boilerplate-stripping decision input): the longest token "
    "prefix on which EVERY document from a source agrees (a position "
    "counts only when all n_docs reach it and carry one distinct "
    f"token; positions capped at {_BP_MAXPOS}). Sources that prepend "
    "navigation chrome, license headers, or template greetings show a "
    "non-zero LCP and the prefix text itself is returned for the strip "
    "rule; this synthetic corpus has none (LCP 0 everywhere), which "
    "the oracle still exact-checks — the operator's value is the "
    "audit, not this dataset's answer. Shape: one bounded explode "
    f"(<= {_BP_MAXPOS} positions/doc), one (source, pos) aggregate — "
    "no pairwise document comparison anywhere.",
)
def text_boilerplate_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "source", "doc_id", tokens("text").alias("__t")
    )
    nd = docs.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    pos = docs.select(
        "source",
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, least(size(__t), {_BP_MAXPOS})), "
                "i -> struct(CAST(i AS BIGINT) AS pos, "
                "element_at(__t, i) AS token))"
            )
        ).alias("s"),
    ).select("source", "doc_id", "s.pos", "s.token")
    agree = pos.groupBy("source", "pos").agg(
        F.count("*").cast("long").alias("n_at_pos"),
        F.countDistinct("token").cast("long").alias("n_distinct"),
        F.min("token").alias("token"),
    )
    lcp = (
        agree.join(F.broadcast(nd), "source")
        .groupBy("source")
        .agg(
            (
                F.coalesce(
                    F.min(
                        F.when(
                            ~(
                                (F.col("n_at_pos") == F.col("n_docs"))
                                & (F.col("n_distinct") == 1)
                            ),
                            F.col("pos"),
                        )
                    ),
                    F.lit(_BP_MAXPOS + 1),
                )
                - 1
            )
            .cast("long")
            .alias("lcp")
        )
    )
    base = nd.join(lcp, "source")
    ptoks = agree.select(
        F.col("source").alias("__psrc"), "pos", "token"
    )
    pref = (
        base.join(
            ptoks,
            (F.col("__psrc") == F.col("source"))
            & (F.col("pos") <= F.col("lcp")),
            "left",
        )
        .groupBy("source", "n_docs", "lcp")
        .agg(
            F.coalesce(
                F.expr(
                    "array_join(transform(array_sort("
                    "collect_list(struct(pos, token))), s -> s.token), ' ')"
                ),
                F.lit(""),
            ).alias("prefix_text")
        )
    )
    return pref


# ---------------------------------------------------------------------------
# events_circular_hour_stats — Rayleigh uniformity test on the clock
# ---------------------------------------------------------------------------

_COS24 = [math.cos(2.0 * math.pi * h / 24.0) for h in range(24)]
_SIN24 = [math.sin(2.0 * math.pi * h / 24.0) for h in range(24)]
_SQL_COS24 = "[" + ", ".join(f"CAST({repr(c)} AS DOUBLE)" for c in _COS24) + "]"
_SQL_SIN24 = "[" + ", ".join(f"CAST({repr(s)} AS DOUBLE)" for s in _SIN24) + "]"
# -ln(0.05): Rayleigh large-n critical value at alpha = 0.05 (Mardia &
# Jupp eq. 6.3.2, z = -ln(alpha)) — pinned literal.
_RAYLEIGH_CRIT = "2.995732273553991"


@register(
    "events_circular_hour_stats",
    oracle=f"""
        WITH h AS (
            SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                   CAST(COUNT(*) AS BIGINT) AS n_h
            FROM events GROUP BY 1
        ),
        c AS (
            SELECT CAST(SUM(n_h) AS BIGINT) AS n,
                   {sql_ssum(f'CAST(n_h AS DOUBLE) * {_SQL_COS24}[hr + 1]')}
                       AS c_sum,
                   {sql_ssum(f'CAST(n_h AS DOUBLE) * {_SQL_SIN24}[hr + 1]')}
                       AS s_sum
            FROM h
        )
        SELECT n, c_sum, s_sum,
               sqrt(c_sum * c_sum + s_sum * s_sum) / CAST(n AS DOUBLE)
                   AS r_bar,
               CAST(n AS DOUBLE)
                   * (sqrt(c_sum * c_sum + s_sum * s_sum)
                      / CAST(n AS DOUBLE))
                   * (sqrt(c_sum * c_sum + s_sum * s_sum)
                      / CAST(n AS DOUBLE)) AS rayleigh_z,
               CAST(n AS DOUBLE)
                   * (sqrt(c_sum * c_sum + s_sum * s_sum)
                      / CAST(n AS DOUBLE))
                   * (sqrt(c_sum * c_sum + s_sum * s_sum)
                      / CAST(n AS DOUBLE))
                   > CAST({_RAYLEIGH_CRIT} AS DOUBLE) AS nonuniform_hours
        FROM c
    """,
    doc="Circular statistics of the event clock (Mardia & Jupp, "
    "'Directional Statistics'): hour-of-day as an angle on the 24-hour "
    "circle, mean resultant length R-bar from the trig moments, and "
    "the Rayleigh uniformity test z = n * R-bar^2 against the "
    "large-n critical value -ln(0.05) (PINNED literal). Linear "
    "statistics on hours lie (23:00 and 01:00 average to noon); the "
    "circular resultant is the correct load-profile concentration "
    "measure for diurnal traffic. cos/sin of the 24 clock angles are "
    "module-import LITERAL arrays (the trig-grid device) — no runtime "
    "transcendental; the corpus work is one 24-row hour histogram and "
    "the folds cross engines via ssum.",
)
def events_circular_hour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(F.hour("ts").cast("long").alias("hr")).agg(
        F.count("*").cast("long").alias("n_h")
    )
    cosarr = F.array(*[F.lit(c) for c in _COS24])
    sinarr = F.array(*[F.lit(s) for s in _SIN24])
    c = h.agg(
        F.sum("n_h").cast("long").alias("n"),
        ssum(
            F.col("n_h").cast("double")
            * F.element_at(cosarr, (F.col("hr") + 1).cast("int"))
        ).alias("c_sum"),
        ssum(
            F.col("n_h").cast("double")
            * F.element_at(sinarr, (F.col("hr") + 1).cast("int"))
        ).alias("s_sum"),
    )
    r_bar = (
        F.sqrt(F.col("c_sum") * F.col("c_sum") + F.col("s_sum") * F.col("s_sum"))
        / F.col("n").cast("double")
    )
    z = F.col("n").cast("double") * r_bar * r_bar
    return c.select(
        "n",
        "c_sum",
        "s_sum",
        r_bar.alias("r_bar"),
        z.alias("rayleigh_z"),
        (z > F.lit(float(_RAYLEIGH_CRIT))).alias("nonuniform_hours"),
    )


# ---------------------------------------------------------------------------
# events_attribution_window_sweep — conversion-window sensitivity
# ---------------------------------------------------------------------------

_ATTR_WINDOWS = [1, 3, 7, 14]


@register(
    "events_attribution_window_sweep",
    oracle=f"""
        WITH u AS (
            SELECT user_id,
                   MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts,
                   MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS p_ts
            FROM events GROUP BY user_id
        ),
        eligible AS (
            SELECT user_id, v_ts, p_ts FROM u WHERE v_ts IS NOT NULL
        ),
        w(w_days) AS (VALUES {', '.join(f'({w})' for w in _ATTR_WINDOWS)})
        SELECT w_days,
               CAST(COUNT(*) AS BIGINT) AS n_viewers,
               CAST(SUM(CASE WHEN p_ts IS NOT NULL AND p_ts >= v_ts
                              AND p_ts <= v_ts + to_days(CAST(w_days AS INTEGER))
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
               CAST(SUM(CASE WHEN p_ts IS NOT NULL AND p_ts >= v_ts
                              AND p_ts <= v_ts + to_days(CAST(w_days AS INTEGER))
                             THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS conversion_rate
        FROM eligible CROSS JOIN w
        GROUP BY w_days
    """,
    doc="Attribution-window sensitivity sweep (the 'how long after the "
    "first view does a purchase still count' policy knob every "
    "marketing/e-commerce metric depends on): per candidate window "
    f"({', '.join(str(w) for w in _ATTR_WINDOWS)} days), the fraction "
    "of first-view users whose first purchase lands inside the window. "
    "A metric that moves sharply across windows is attribution-driven, "
    "not behavior-driven — the sweep quantifies that before anyone "
    "ships a number. Timestamp arithmetic stays ntz + day-time "
    "interval (no session-tz function, per the house timestamp rule); "
    "corpus work is ONE user rollup crossed with the 4-row window "
    "grid; counts exact.",
)
def events_attribution_window_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("v_ts"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "p_ts"
        ),
    )
    eligible = u.where(F.col("v_ts").isNotNull())
    w = spark.createDataFrame(
        [(w,) for w in _ATTR_WINDOWS], ["w_days"]
    ).select(F.col("w_days").cast("int").alias("w_days"))
    hit = (
        F.col("p_ts").isNotNull()
        & (F.col("p_ts") >= F.col("v_ts"))
        & (
            F.col("p_ts")
            <= F.expr("v_ts + make_dt_interval(w_days, 0, 0, 0)")
        )
    )
    return (
        eligible.crossJoin(F.broadcast(w))
        .groupBy("w_days")
        .agg(
            F.count("*").cast("long").alias("n_viewers"),
            F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_converted"),
            (
                F.sum(F.when(hit, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double")
            ).alias("conversion_rate"),
        )
    )
