"""Event-stream analytics over the `events` table (batch side; the same
logic runs incrementally in sql_engine_spark.streaming).

Timestamps are timestamp_ntz end-to-end; bucketing uses wall-clock
components (make_timestamp_ntz / date components), never session-tz
dependent functions, so results match the oracle under any driver tz.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum
from sql_engine_spark.io import load
from sql_engine_spark.operators.asof import asof_join, range_join_buckets
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.sketch import (
    countmin_heavy_hitters,
    sql_countmin_heavy_hitters,
)
from sql_engine_spark.registry import register

SESSION_GAP_S = 1800


@register(
    "events_sessionize",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts, event_id,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM flagged
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               MIN(ts) AS session_start, MAX(ts) AS session_end,
               COUNT(*) AS n_events,
               date_diff('second', MIN(ts), MAX(ts)) AS duration_s
        FROM sessions GROUP BY user_id, session_id
    """,
    doc="Batch sessionization: 30-min-gap sessions via lag + running sum "
    "(one shuffle on user_id). The streaming twin uses session_window / "
    "applyInPandasWithState (streaming/).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # date_diff('second', a, b) in the oracle counts second-boundary crossings
    # (truncate each operand, then subtract); truncate before diffing to match.
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), date_trunc('second', ts))"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0).alias("new_session"),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(run).cast("long"))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.expr(
            "timestampdiff(SECOND, date_trunc('second', min(ts)), date_trunc('second', max(ts)))"
        ).alias("duration_s"),
    )


@register(
    "events_tumbling_window",
    oracle=f"""
        SELECT event_type,
               make_timestamp(year(ts), month(ts), day(ts), hour(ts),
                              CAST(floor(minute(ts) / 5) * 5 AS INT), 0.0) AS window_start,
               COUNT(*) AS n,
               {sql_dsum('value')} AS sum_value,
               MIN(value) AS min_value, MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """,
    doc="5-minute tumbling-window aggregate per event type, built from "
    "wall-clock components (tz-independent). Streaming twin: "
    "window(ts, '5 minutes') + watermark.",
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    win = F.expr(
        "make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), "
        "CAST(floor(minute(ts) / 5) * 5 AS INT), 0)"
    )
    return (
        ev.groupBy("event_type", win.alias("window_start"))
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "events_json_extract",
    oracle="""
        SELECT event_id, event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
    doc="JSON property extraction from the props column (semi-structured "
    "surface; reference has no JSON support at all).",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", "event_type", k.alias("k")).where(F.col("k") > 50)


_ASOF_ORACLE = """
    WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    views AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT max(v.ts) FROM views v
            WHERE v.user_id = p.user_id AND v.ts <= p.ts)              AS asof_ts,
           (SELECT max(v.event_id) FROM views v
            WHERE v.user_id = p.user_id
              AND v.ts = (SELECT max(v2.ts) FROM views v2
                          WHERE v2.user_id = p.user_id AND v2.ts <= p.ts))
                                                                        AS asof_event_id
    FROM purchases p
"""


@register(
    "asof_join_events",
    oracle=_ASOF_ORACLE,
    doc="As-of join: each purchase matched to the user's latest prior "
    "view. Implemented union+ordered-window (one shuffle on user_id, "
    "O(n log n)) — not a range join. Reference/Spark lack this operator.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")


_BUCKETS = [(0.0, 100.0, "xs"), (100.0, 200.0, "s"), (200.0, 300.0, "m"),
            (300.0, 400.0, "l"), (400.0, 1000.0, "xl")]

_RANGE_ORACLE = """
    WITH buckets(lo, hi, bucket) AS (
        VALUES (0.0, 100.0, 'xs'), (100.0, 200.0, 's'), (200.0, 300.0, 'm'),
               (300.0, 400.0, 'l'), (400.0, 1000.0, 'xl')
    )
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
    FROM events LEFT JOIN buckets ON value >= lo AND value < hi
    GROUP BY bucket
"""


@register(
    "range_join_buckets",
    oracle=_RANGE_ORACLE,
    doc="Range (interval) join of event values into broadcast bucket "
    "boundaries + per-bucket aggregate.",
)
def range_join_buckets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # VALUES-literal plan (LocalRelation), not createDataFrame: the latter
    # ships a Python RDD (applySchemaToPythonRDD) and replans it every run.
    rows = ", ".join(f"({lo}D, {hi}D, '{b}')" for lo, hi, b in _BUCKETS)
    buckets = spark.sql(f"SELECT * FROM VALUES {rows} AS buckets(lo, hi, bucket)")
    return (
        range_join_buckets(ev, buckets, value_col="value")
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
    )


@register(
    "events_user_funnel",
    oracle=f"""
        SELECT user_id,
               COUNT(*) AS n_events,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END)     AS n_views,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases,
               COUNT(DISTINCT event_type) AS n_types,
               MIN(ts) AS first_seen, MAX(ts) AS last_seen,
               {sql_dsum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")}
                   AS purchase_value
        FROM events GROUP BY user_id
    """,
    doc="Per-user funnel stats: conditional counts, distinct types, "
    "first/last timestamps, conditional sums.",
)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    is_purchase = F.col("event_type") == "purchase"
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
        F.count(F.when(is_purchase, 1)).alias("n_purchases"),
        F.countDistinct("event_type").alias("n_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        dsum(F.when(is_purchase, F.col("value")).otherwise(0.0)).alias("purchase_value"),
    )


@register(
    "asof_join_tolerance",
    oracle=f"""
        WITH matched AS ({_ASOF_ORACLE})
        SELECT event_id, user_id, ts,
               CASE WHEN epoch_us(ts) - epoch_us(asof_ts) <= 600 * 1000000
                    THEN asof_ts END       AS asof_ts,
               CASE WHEN epoch_us(ts) - epoch_us(asof_ts) <= 600 * 1000000
                    THEN asof_event_id END AS asof_event_id
        FROM matched
    """,
    doc="As-of join with a 10-minute tolerance: matches older than the "
    "window null out (exact microsecond comparison — second-granularity "
    "diffs truncate differently across engines). Same single-shuffle "
    "union+window plan as asof_join_events.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    return asof_join(
        purchases,
        views,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id"],
        tolerance_seconds=600,
    ).select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")


@register(
    "events_time_rollup",
    oracle=f"""
        WITH b AS (
            SELECT make_timestamp(year(ts), month(ts), day(ts), 0, 0, 0.0) AS day_b,
                   make_timestamp(year(ts), month(ts), day(ts), hour(ts), 0, 0.0) AS hour_b,
                   value
            FROM events
        )
        SELECT day_b, hour_b, COUNT(*) AS n, {sql_dsum('value')} AS sum_value,
               CAST(grouping(day_b) AS BIGINT) AS g_day,
               CAST(grouping(hour_b) AS BIGINT) AS g_hour
        FROM b GROUP BY ROLLUP (day_b, hour_b)
    """,
    doc="Hypertable-style continuous-aggregate rollup: hour -> day -> grand "
    "total grains in ONE pass (GROUP BY ROLLUP expands map-side; one "
    "shuffle carries only pre-aggregated grain rows). This is the batch "
    "materialization of what a time-series store keeps incrementally.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "events").createOrReplaceTempView("__ev_rollup")
    return spark.sql(
        f"""
        WITH b AS (
            SELECT make_timestamp_ntz(year(ts), month(ts), day(ts), 0, 0, 0) AS day_b,
                   make_timestamp_ntz(year(ts), month(ts), day(ts), hour(ts), 0, 0) AS hour_b,
                   value
            FROM __ev_rollup
        )
        SELECT day_b, hour_b, COUNT(*) AS n, {sql_dsum('value')} AS sum_value,
               CAST(grouping(day_b) AS BIGINT) AS g_day,
               CAST(grouping(hour_b) AS BIGINT) AS g_hour
        FROM b GROUP BY ROLLUP (day_b, hour_b)
        """
    )


@register(
    "events_retention_cohort",
    oracle="""
        WITH first_seen AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        )
        SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) AS BIGINT)
                   AS day_offset,
               COUNT(DISTINCT e.user_id) AS active_users
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        GROUP BY 1, 2
    """,
    doc="Cohort retention: users bucketed by first-seen day, activity "
    "counted per (cohort, day-offset) cell. Two shuffles on user_id "
    "(first-seen agg, then join + distinct-count); the join key equals "
    "the aggregation key so AQE can co-locate them.",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("ts").cast("date"), F.col("cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "events_anomaly_zscore",
    oracle=f"""
        WITH m0 AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum('value')} AS s,
                   SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(13,6))) AS s2d
            FROM events GROUP BY event_type
        ),
        m AS (SELECT event_type, n, s,
                     CAST(CAST((s2d) - ((s2d) % 1) AS DECIMAL(27,0)) AS DOUBLE)
                         + CAST((s2d) % 1 AS DOUBLE) AS s2
              FROM m0),
        st AS (SELECT event_type, (s / n) AS mean,
                      sqrt((s2 / n) - ((s / n) * (s / n))) AS sd
               FROM m)
        SELECT e.event_id, e.event_type, e.value,
               ((e.value - st.mean) / st.sd) AS z
        FROM events e JOIN st USING (event_type)
        WHERE abs((e.value - st.mean) / st.sd) >= 2.5
    """,
    doc="Per-type z-score anomaly detection: population mean/std per "
    "event_type via exact decimal moments (bit-stable under any "
    "partitioning — functions/numeric.py), broadcast back onto the "
    "stream, flag |z| >= 2.5. The stats side is bounded by the distinct "
    "type count, so the corpus sees one map-side-combined aggregate and "
    "one broadcast join — no corpus-sized shuffle.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.extras import _DN, _DW, _exact_double

    ev = load(spark, sf_dir, "events")
    m0 = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dsum("value").alias("s"),
        F.sum(F.col("value").cast(_DW) * F.col("value").cast(_DN)).alias("s2d"),
    )
    m = m0.selectExpr("event_type", "n", "s", f"{_exact_double('s2d')} AS s2")
    st = m.selectExpr(
        "event_type",
        "(s / n) AS mean",
        "sqrt((s2 / n) - ((s / n) * (s / n))) AS sd",
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        ev.join(F.broadcast(st), "event_type")
        .where(F.abs(z) >= 2.5)
        .select("event_id", "event_type", "value", z.alias("z"))
    )


@register(
    "events_countmin_heavy_hitters",
    oracle=sql_countmin_heavy_hitters("user_id", "events", threshold=12),
    doc="Count-Min-Sketch heavy hitters (Cormode-Muthukrishnan 2005) "
    "over event user_ids: a 3x64 counter matrix built as three "
    "map-side-combinable hash aggregates (the sketch is 192 rows at ANY "
    "corpus size), broadcast back to estimate per-key counts; the "
    "overcount-only CMS guarantee is emitted as a checked boolean "
    "column. md5-derived hashing, all-integer arithmetic — the whole "
    "sketch hash-matches the DuckDB oracle.",
)
def events_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return countmin_heavy_hitters(ev, key_col="user_id", threshold=12)


@register(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        c AS (
            SELECT prev_type, event_type AS next_type, COUNT(*) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, event_type
        ),
        tot AS (SELECT prev_type, SUM(n) AS t FROM c GROUP BY prev_type)
        SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
               CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS p
        FROM c JOIN tot USING (prev_type)
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences (the behavioral-sequence miner): lag() within each "
    "user's total-ordered stream, then a bounded (types x types) count "
    "aggregate normalized to probabilities. The only corpus-wide work "
    "is one shuffle keyed by user_id (window width = one user's "
    "history) and one map-side-combinable pair count; the transition "
    "matrix itself is event-type-cardinality sized at any scale. Count "
    "ratios are exact-integer divisions, bit-identical cross-engine.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    tot = c.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        c.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            (F.col("n").cast("double") / F.col("t").cast("double")).alias("p"),
        )
    )


@register(
    "events_attribution_first_touch",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts, event_id, event_type,
                   SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        ),
        firsts AS (
            SELECT user_id, session_id,
                   MIN(ts) AS session_start,
                   arg_min(event_type, epoch_ns(ts)::HUGEINT * 10000000 + event_id) AS first_touch_type
            FROM sess GROUP BY user_id, session_id
        )
        SELECT s.event_id AS purchase_id, s.user_id, s.ts AS purchase_ts,
               CAST(s.session_id AS BIGINT) AS session_id,
               f.session_start, f.first_touch_type
        FROM sess s JOIN firsts f USING (user_id, session_id)
        WHERE s.event_type = 'purchase'
    """,
    doc="First-touch attribution: each purchase credited to the FIRST "
    "event of its gap-based session (30-min inactivity) — the "
    "marketing-analytics composition of sessionization + per-session "
    "aggregation. Windows are per-user (bounded history); the session "
    "firsts relation is one hash aggregate joined back on the "
    "(user, session) key. First event resolved by arg-min over the "
    "total order (ts, event_id), deterministic cross-engine.",
)
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Same second-boundary gap spelling as events_sessionize (the oracle
    # diffs truncated operands).
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), date_trunc('second', ts))"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0).alias("new_session"),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    firsts = sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.expr("min_by(event_type, struct(ts, event_id))").alias("first_touch_type"),
    )
    return (
        sess.where(F.col("event_type") == "purchase")
        .join(firsts, ["user_id", "session_id"])
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("session_id").cast("long").alias("session_id"),
            "session_start",
            "first_touch_type",
        )
    )


_OVL_CELL_S = 3600


@register(
    "join_interval_overlap",
    oracle=f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR date_diff('second', lag(ts) OVER w, ts) > {SESSION_GAP_S}
                        THEN 1 ELSE 0 END AS ns
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT user_id, ts,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM flagged
        ),
        iv AS (
            SELECT user_id, CAST(sid AS BIGINT) AS sid,
                   MIN(ts) AS s, MAX(ts) AS e
            FROM sess GROUP BY user_id, sid
        )
        SELECT a.user_id AS user_a, a.sid AS session_a,
               b.user_id AS user_b, b.sid AS session_b,
               greatest(a.s, b.s) AS overlap_start,
               least(a.e, b.e) AS overlap_end,
               CAST(date_diff('second', greatest(a.s, b.s), least(a.e, b.e))
                    AS BIGINT) AS overlap_s
        FROM iv a JOIN iv b
          ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    """,
    doc="Interval-overlap join: pairs of DIFFERENT users' sessions that "
    "overlap in time — the join type behind concurrency analysis, "
    "co-presence, and conflict detection. A naive overlap theta-join "
    "is planned as a nested loop (quadratic); the scale spelling "
    "decomposes time into 1-hour cells, explodes each interval to its "
    "covered cells (bounded by duration/cell), equi-joins on the cell, "
    "dedupes candidates, and verifies the exact overlap predicate — "
    "the standard spatial-join grid trick applied to time. The oracle "
    "IS the naive theta join, so completeness of the decomposition is "
    "what the hash comparison proves.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.expr(
        "timestampdiff(SECOND, lag(date_trunc('second', ts)) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id), date_trunc('second', ts))"
    )
    sess = ev.select(
        "user_id",
        "ts",
        F.sum(F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("sid"),
    )
    iv = sess.groupBy("user_id", F.col("sid").cast("long").alias("sid")).agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    epoch = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"
    # Persisted: the self-join would otherwise evaluate the whole
    # session derivation (window + groupBy + explode) once per side
    # (r12, guide §1.2 don't compute twice). __scell (the interval's
    # START cell) rides along for the responsible-cell dedup below.
    cells = _persist(
        iv.select(
            "user_id",
            "sid",
            "s",
            "e",
            F.expr(
                f"CAST({epoch.format('s')} AS BIGINT) DIV {_OVL_CELL_S}"
            ).alias("__scell"),
            F.explode(
                F.expr(
                    f"sequence(CAST({epoch.format('s')} AS BIGINT) DIV {_OVL_CELL_S}, "
                    f"CAST({epoch.format('e')} AS BIGINT) DIV {_OVL_CELL_S})"
                )
            ).alias("__cell"),
        )
    )
    a, b = cells.alias("a"), cells.alias("b")
    # Responsible-cell dedup (the standard grid-join spelling, r12,
    # guide §2.4 remove shuffles outright): any two intervals sharing
    # >= 1 cell both cover cell max(start_a, start_b) — it lies between
    # both starts and any shared cell <= both ends — so emitting a pair
    # ONLY from that one cell yields exactly the dropDuplicates result
    # as a filter evaluated inside the join, with no candidate shuffle.
    cand = (
        a.join(
            b,
            (F.col("a.__cell") == F.col("b.__cell"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (
                F.col("a.__cell")
                == F.greatest(F.col("a.__scell"), F.col("b.__scell"))
            ),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sid").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sid").alias("session_b"),
            F.col("a.s").alias("sa"),
            F.col("a.e").alias("ea"),
            F.col("b.s").alias("sb"),
            F.col("b.e").alias("eb"),
        )
    )
    return (
        cand.where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        .select(
            "user_a",
            "session_a",
            "user_b",
            "session_b",
            F.greatest("sa", "sb").alias("overlap_start"),
            F.least("ea", "eb").alias("overlap_end"),
            F.expr(
                "timestampdiff(SECOND, date_trunc('second', greatest(sa, sb)), "
                "date_trunc('second', least(ea, eb)))"
            )
            .cast("long")
            .alias("overlap_s"),
        )
    )


@register(
    "events_path_mining",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lag(event_type, 1) OVER w AS p1,
                   lag(event_type, 2) OVER w AS p2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT p2 AS step1, p1 AS step2, event_type AS step3,
               COUNT(*) AS n
        FROM seq WHERE p2 IS NOT NULL
        GROUP BY p2, p1, event_type
        ORDER BY n DESC, step1, step2, step3
        LIMIT 20
    """,
    doc="Path mining: the 20 most common 3-step event sequences across "
    "all users — the product-analytics 'what do users do next' query. "
    "Two lags over the per-user total order (bounded windows), one "
    "map-side-combinable count on a types^3-bounded key, TakeOrdered "
    "top-20 with full deterministic tie-breaks.",
)
def events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    return (
        seq.groupBy(
            F.col("p2").alias("step1"),
            F.col("p1").alias("step2"),
            F.col("event_type").alias("step3"),
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(20)
    )
