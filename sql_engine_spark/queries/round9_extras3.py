"""Round-9 late engine/scale batch: a rank-synopsis quantile sketch
with its error audit, the sweep-line session-concurrency profile, and
a row-group statistics audit that cross-checks two independent parquet
metadata readers.

The reference engine has none of this surface (single-SELECT Volcano
executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load, table_row_count
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

# ---------------------------------------------------------------------------
# approx_rank_synopsis_quantiles — k-point quantile synopsis + audit
# ---------------------------------------------------------------------------

_SYN_K = 64
_SYN_QS = [0.25, 0.5, 0.9, 0.99]


def _syn_ranks(n: int) -> list[int]:
    return sorted({max(1, math.ceil(i * n / _SYN_K)) for i in range(1, _SYN_K + 1)})


def _syn_targets(n: int) -> list[tuple[float, int]]:
    return [(q, max(1, math.ceil(q * n))) for q in _SYN_QS]


def _syn_oracle(sf_dir: str) -> str:
    n = table_row_count(sf_dir, "lineitem")
    ranks = ", ".join(str(r) for r in _syn_ranks(n))
    qvals = ", ".join(
        f"(CAST({q} AS DOUBLE), CAST({t} AS BIGINT))"
        for q, t in _syn_targets(n)
    )
    bound = math.ceil(n / _SYN_K)
    return f"""
        WITH r AS (
            SELECT l_extendedprice AS v,
                   CAST(row_number() OVER (
                       ORDER BY l_extendedprice,
                                l_orderkey * 8 + l_linenumber)
                        AS BIGINT) AS rk
            FROM lineitem
        ),
        syn AS (SELECT v, rk FROM r WHERE rk IN ({ranks})),
        q(q, target_rank) AS (VALUES {qvals}),
        approx AS (
            SELECT q.q, q.target_rank, s.v AS approx_value,
                   s.rk AS synopsis_rank
            FROM q JOIN syn s ON s.rk = (
                SELECT MIN(rk) FROM syn WHERE rk >= q.target_rank)
        )
        SELECT a.q, a.target_rank, a.approx_value, a.synopsis_rank,
               e.v AS exact_value,
               a.synopsis_rank - a.target_rank AS rank_error,
               a.synopsis_rank - a.target_rank < {bound} AS within_bound
        FROM approx a JOIN r e ON e.rk = a.target_rank
    """


@register(
    "approx_rank_synopsis_quantiles",
    oracle=_syn_oracle,
    doc=f"Rank-sample quantile synopsis with its own error audit: keep "
    f"the values at the {_SYN_K} evenly spaced ranks ceil(i*n/{_SYN_K}) "
    "(one exact ranking pass through the bucketed two-level scan, then "
    f"a {_SYN_K}-row synopsis), answer each requested quantile with the "
    "synopsis point at the smallest rank >= ceil(q*n), and report the "
    "guaranteed rank error (< ceil(n/k) BY CONSTRUCTION — the audit "
    "column proves the bound on this corpus, with the exact order "
    "statistic alongside). This is the q-digest/GK trade spelled "
    "deterministically: at 100 TB the synopsis is what a pipeline "
    "persists per partition/day for later quantile queries at "
    "k-row cost, and the rank-error guarantee (unlike a sampled "
    "sketch's probabilistic bound) is absolute. The synopsis ranks "
    "are data-derived, so the oracle is a CALLABLE rendered against "
    "the gate's dataset (registry convention).",
)
def approx_rank_synopsis_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("tie"),
    )
    n = table_row_count(sf_dir, "lineitem")
    ranked = bucketed_value_rank(
        li,
        part_cols=[],
        value_col="v",
        tie_col="tie",
        n_rows=n,
        out_col="rk",
    )
    ranks = _syn_ranks(n)
    targets = _syn_targets(n)
    bound = math.ceil(n / _SYN_K)
    syn = ranked.where(F.col("rk").isin(ranks)).select("v", "rk")
    q = spark.createDataFrame(
        [(float(qv), int(t)) for qv, t in targets], ["q", "target_rank"]
    ).select(
        F.col("q").cast("double"), F.col("target_rank").cast("long")
    )
    # Smallest synopsis rank >= target: rank the candidates per q.
    cand = F.broadcast(q).join(
        syn.withColumnRenamed("v", "approx_value").withColumnRenamed(
            "rk", "synopsis_rank"
        ),
        F.col("synopsis_rank") >= F.col("target_rank"),
    )
    wq = Window.partitionBy("q").orderBy("synopsis_rank")
    approx = (
        cand.withColumn("__rn", F.row_number().over(wq))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    exact = ranked.select(
        F.col("rk").alias("target_rank"), F.col("v").alias("exact_value")
    )
    return approx.join(exact, "target_rank").select(
        "q",
        "target_rank",
        "approx_value",
        "synopsis_rank",
        "exact_value",
        (F.col("synopsis_rank") - F.col("target_rank")).alias("rank_error"),
        (F.col("synopsis_rank") - F.col("target_rank") < bound).alias(
            "within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# events_concurrency_profile — sweep-line session concurrency
# ---------------------------------------------------------------------------

_SESS_GAP_MIN = 30


@register(
    "events_concurrency_profile",
    oracle=f"""
        WITH o AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                         OR date_diff('second', lag(ts) OVER w, ts)
                            > {_SESS_GAP_MIN * 60}
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, ts,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess
            FROM o
        ),
        sess AS (
            SELECT user_id, sess, MIN(ts) AS s_ts, MAX(ts) AS e_ts
            FROM s GROUP BY user_id, sess
        ),
        b AS (
            SELECT CAST(date_trunc('day', s_ts) AS DATE) AS day,
                   s_ts AS t, CAST(1 AS BIGINT) AS delta, user_id, sess
            FROM sess
            UNION ALL
            SELECT CAST(date_trunc('day', s_ts) AS DATE) AS day,
                   e_ts AS t, CAST(-1 AS BIGINT) AS delta, user_id, sess
            FROM sess
        ),
        sweep AS (
            SELECT day,
                   CAST(SUM(delta) OVER (PARTITION BY day
                        ORDER BY t, delta DESC, user_id, sess
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS live
            FROM b
        ),
        ns AS (
            SELECT CAST(date_trunc('day', s_ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions
            FROM sess GROUP BY 1
        ),
        mx AS (
            SELECT day, CAST(MAX(live) AS BIGINT) AS max_concurrent
            FROM sweep GROUP BY day
        )
        SELECT ns.day, ns.n_sessions, mx.max_concurrent
        FROM ns JOIN mx USING (day)
    """,
    doc=f"Session-concurrency profile via the classic SWEEP-LINE: "
    f"{_SESS_GAP_MIN}-minute-gap sessionization, then +1/-1 boundary "
    "events ordered (time, starts-before-ends at ties, user, session) "
    "with a running sum whose per-day maximum is the peak number of "
    "simultaneously live sessions — the load number capacity planning "
    "actually needs, unobtainable from per-hour event counts. The "
    "sweep is PARTITIONED BY DAY (sessions are attributed to their "
    "start day; a 30-min-gap session crossing midnight counts on its "
    "start day only — documented simplification that keeps every "
    "running sum calendar-partitioned instead of one corpus-wide "
    "ordered window). Exact integers throughout.",
)
def events_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), "
        "date_trunc('second', ts))"
    )
    o = ev.withColumn(
        "is_new",
        F.when(gap.isNull() | (gap > _SESS_GAP_MIN * 60), 1).otherwise(0),
    )
    ws = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = o.withColumn("sess", F.sum("is_new").over(ws).cast("long"))
    sess = s.groupBy("user_id", "sess").agg(
        F.min("ts").alias("s_ts"), F.max("ts").alias("e_ts")
    )
    day = F.date_trunc("day", "s_ts").cast("date").alias("day")
    b = sess.select(
        day, F.col("s_ts").alias("t"), F.lit(1).cast("long").alias("delta"),
        "user_id", "sess"
    ).unionAll(
        sess.select(
            day,
            F.col("e_ts").alias("t"),
            F.lit(-1).cast("long").alias("delta"),
            "user_id",
            "sess",
        )
    )
    wd = (
        Window.partitionBy("day")
        .orderBy(F.asc("t"), F.desc("delta"), F.asc("user_id"), F.asc("sess"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = b.withColumn("live", F.sum("delta").over(wd).cast("long"))
    n_sess = sess.groupBy(day).agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    mx = sweep.groupBy("day").agg(
        F.max("live").cast("long").alias("max_concurrent")
    )
    return n_sess.join(mx, "day")


# ---------------------------------------------------------------------------
# scan_rowgroup_stats_audit — two independent footer readers agree
# ---------------------------------------------------------------------------


def _rowgroup_oracle(sf_dir: str) -> str:
    return f"""
        SELECT CAST(row_group_id AS BIGINT) AS row_group_id,
               CAST(row_group_num_rows AS BIGINT) AS num_rows,
               CAST(stats_min_value AS BIGINT) AS min_orderkey,
               CAST(stats_max_value AS BIGINT) AS max_orderkey,
               CAST(stats_null_count AS BIGINT) AS null_count
        FROM parquet_metadata('{sf_dir}/lineitem.parquet')
        WHERE path_in_schema = 'l_orderkey'
    """


@register(
    "scan_rowgroup_stats_audit",
    oracle=_rowgroup_oracle,
    doc="Row-group statistics audit: the parquet FOOTER min/max/null "
    "stats for l_orderkey per row group, read by TWO INDEPENDENT "
    "implementations — pyarrow's C++ metadata reader on the Spark side "
    "(a driver-side, file-list-sized read: zero Spark jobs, the "
    "lakehouse-maintenance posture) and DuckDB's native "
    "parquet_metadata() as the oracle. These stats ARE the zone map "
    "that every engine's row-group skipping trusts "
    "(scan_zonemap_prune); a writer bug that mis-stamps them silently "
    "corrupts pruning at any scale, and cross-checking two readers is "
    "the audit that catches stale/foreign-written footers before a "
    "100 TB scan plan believes them.",
)
def scan_rowgroup_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "lineitem.parquet")
    md = pq.ParquetFile(path).metadata
    rows = []
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema == "l_orderkey":
                st = c.statistics
                rows.append(
                    (
                        g,
                        rg.num_rows,
                        int(st.min),
                        int(st.max),
                        int(st.null_count),
                    )
                )
    return spark.createDataFrame(
        rows,
        "row_group_id long, num_rows long, min_orderkey long, "
        "max_orderkey long, null_count long",
    )
