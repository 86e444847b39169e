"""Round-5 events/time-series operators: EWMA smoothing, gap-fill and
nearest as-of joins, feature lags, rolling distinct, exact percentiles
via bucketed two-level rank, deterministic mode, manual correlation,
fixed-bin histograms, MAD outliers, conversion latency, DAU/WAU.

Split from queries/round5.py along domain lines (round-6 refactor);
semantics, registry keys, and oracles unchanged.
"""



from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.operators.text import hashed_linear_score, sql_hashed_linear_score
from sql_engine_spark.registry import register
from sql_engine_spark.operators.textprep import shingles, sql_shingles, sql_tokens, tokens  # noqa: F401,E501


_EWMA_W = 16


@register(
    "events_ewma_half",
    oracle=f"""
        WITH w AS (
            SELECT event_id, user_id, ts, value,
                   list(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW
                   ) AS vals
            FROM events
        )
        SELECT event_id, user_id, ts,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
                           (a, x) -> a * 0.5 + x)
               / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vals, x -> CAST(1.0 AS DOUBLE))),
                           (a, x) -> a * 0.5 + x) AS ewma
        FROM w
    """,
    doc="Exponentially-weighted moving average per user (alpha = 1/2, "
    "16-event window) — the standard smoothing pass over per-entity "
    "metric streams. The recurrence is spelled as a LEFT FOLD over the "
    "window frame's value list: acc*0.5 + x weights the newest value "
    "2^0 and the oldest 2^-15, normalized by the same fold over ones. "
    "Halving arithmetic is EXACT in binary floating point, so the "
    "result is bit-identical across engines and partitionings — no "
    "libm pow, no order-dependent double sums. The window keys on "
    "user_id (high cardinality): one corpus shuffle, frames bounded "
    "at 16 values.",
)
def events_ewma_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_W - 1), Window.currentRow)
    )
    return (
        ev.withColumn("__vals", F.collect_list("value").over(w))
        .select(
            "event_id",
            "user_id",
            "ts",
            (
                F.expr(
                    "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
                )
                / F.expr(
                    "aggregate(__vals, CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + 1.0D)"
                )
            ).alias("ewma"),
        )
    )


@register(
    "events_gap_fill_asof",
    oracle="""
        WITH dedup AS (
            SELECT user_id, ts, arg_max(value, event_id) AS value
            FROM events GROUP BY user_id, ts
        ),
        bounds AS (
            SELECT user_id,
                   date_trunc('hour', MIN(ts)) AS lo,
                   date_trunc('hour', MAX(ts)) AS hi
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                       AS grid_ts
            FROM bounds
        )
        SELECT g.user_id, g.grid_ts, e.value AS filled_value
        FROM grid g ASOF LEFT JOIN dedup e
          ON g.user_id = e.user_id AND g.grid_ts >= e.ts
    """,
    doc="Per-user hourly gap-fill with forward fill: generate each "
    "user's hourly grid between its first and last event (bounded "
    "per-user agg + sequence explode — grid is user-span-sized, never "
    "corpus^2) and carry the latest at-or-before reading onto every "
    "grid point — the resample/ffill step ahead of any window feature "
    "or seasonality model. Events are first deduped to one reading "
    "per (user, ts) (arg_max by event_id) so the as-of match is "
    "unambiguous in both engines; the fill itself is the union+window "
    "as-of join (operators/asof.py — one shuffle on user_id, no "
    "per-row subquery), and the DuckDB oracle is its native ASOF LEFT "
    "JOIN: two independent spellings, same semantics.",
)
def events_gap_fill_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    dedup = ev.groupBy("user_id", "ts").agg(
        F.max_by("value", "event_id").alias("value")
    )
    bounds = ev.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("__lo"),
        F.date_trunc("hour", F.max("ts")).alias("__hi"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.expr("sequence(__lo, __hi, INTERVAL 1 HOUR)")
        ).alias("grid_ts"),
    )
    return asof_join(
        grid,
        dedup,
        key="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        right_payload=["value"],
    ).select("user_id", "grid_ts", F.col("asof_value").alias("filled_value"))


_PCTS = (0.25, 0.5, 0.75)


@register(
    "agg_percentile_exact",
    oracle=f"""
        WITH g AS (
            SELECT event_type, list_sort(list(value)) AS vals
            FROM events GROUP BY event_type
        )
        SELECT event_type,
               CAST(len(vals) AS BIGINT) AS n,
               {", ".join(
                   "vals[CAST(FLOOR((len(vals) - 1) * " + str(p) + ") AS BIGINT) + 1] "
                   "+ ((len(vals) - 1) * " + str(p)
                   + " - FLOOR((len(vals) - 1) * " + str(p) + ")) "
                   "* (vals[least(CAST(FLOOR((len(vals) - 1) * " + str(p)
                   + ") AS BIGINT) + 2, len(vals))] "
                   "- vals[CAST(FLOOR((len(vals) - 1) * " + str(p) + ") AS BIGINT) + 1])"
                   f" AS p{int(p * 100)}"
                   for p in _PCTS
               )}
        FROM g
    """,
    doc="Exact interpolated percentiles (p25/p50/p75) per event type, "
    "spelled with ONE shared formula in both engines — h = (n-1)p, "
    "linear interpolation v[lo] + frac*(v[hi]-v[lo]) over the sorted "
    "multiset — instead of trusting each engine's quantile_cont to "
    "round identically (their interpolation spellings differ by an "
    "ulp). The oracle materializes each group's sorted list (DuckDB-"
    "side, fine at oracle scale); the SPARK plan must not — "
    "event_type cardinality is tiny, so a per-group collect_list "
    "funnels billions of doubles through single aggregation buffers "
    "at 100x. Exact percentiles only need the VALUES AT TWO RANKS "
    "per (group, p): rank every row with the bucketed two-level rank "
    "(operators/prefix.bucketed_running_sum of 1 over a range bucket "
    "of value — widest window is (event_type, bucket)-partitioned), "
    "derive the target ranks floor((n-1)p)+1 / +2 from the per-group "
    "counts (a broadcast-sized relation), and pick the ranked rows "
    "that hit them with a broadcast join. No per-group list anywhere; "
    "identical result by construction.",
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import bucketed_value_rank

    ev = _persist(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    )
    # Rank every row within its group by (value, event_id) via the
    # shared two-level bucketed scan (tie order is irrelevant to the
    # VALUE at a rank, which is all percentiles read).
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="__rank",
    )
    # Target ranks per (event_type, p): h = (n-1)p, lo = floor(h)+1,
    # hi = min(lo+1, n) — one row per group per percentile, built from
    # the per-group counts (group-cardinality relation, broadcast).
    counts = ev.groupBy(F.col("event_type").alias("__g")).agg(
        F.count("*").cast("long").alias("n")
    )
    h_structs = F.array(
        *[
            F.struct(
                F.lit(int(p * 100)).alias("pct"),
                ((F.col("n") - 1).cast("double") * F.lit(p)).alias("h"),
            )
            for p in _PCTS
        ]
    )
    targets = (
        counts.select("__g", "n", F.explode(h_structs).alias("t"))
        .select(
            "__g",
            "n",
            F.col("t.pct").alias("pct"),
            (F.floor("t.h").cast("long") + 1).alias("lo_rank"),
            F.least(F.floor("t.h").cast("long") + 2, F.col("n")).alias("hi_rank"),
            (F.col("t.h") - F.floor("t.h")).alias("frac"),
        )
    )
    hits = ranked.join(
        F.broadcast(targets),
        (F.col("event_type") == F.col("__g"))
        & (
            (F.col("__rank") == F.col("lo_rank"))
            | (F.col("__rank") == F.col("hi_rank"))
        ),
    )
    per_p = hits.groupBy("__g", "n", "pct", "lo_rank", "hi_rank", "frac").agg(
        F.max(F.when(F.col("__rank") == F.col("lo_rank"), F.col("value"))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("__rank") == F.col("hi_rank"), F.col("value"))).alias(
            "v_hi"
        ),
    )
    pv = per_p.select(
        "__g",
        "n",
        "pct",
        (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
            "pv"
        ),
    )
    return pv.groupBy(F.col("__g").alias("event_type"), "n").agg(
        *[
            F.max(F.when(F.col("pct") == int(p * 100), F.col("pv"))).alias(
                f"p{int(p * 100)}"
            )
            for p in _PCTS
        ]
    )


@register(
    "agg_mode_deterministic",
    oracle="""
        WITH c AS (
            SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY lang, source
        ),
        r AS (
            SELECT lang, source, n,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n DESC, source) AS rk
            FROM c
        )
        SELECT lang, source AS mode_source, n AS mode_count
        FROM r WHERE rk = 1
    """,
    doc="Deterministic per-group mode: the most frequent source per "
    "language, ties broken to the lexicographically smallest source — "
    "built-in mode() is tie-nondeterministic in BOTH engines, which "
    "makes it oracle-unhashable; the count + rank spelling pins the "
    "answer. The rank window runs over the (lang, source) COUNT "
    "relation (bounded by the key product), never corpus rows: the "
    "corpus-sized work is exactly one map-side-combinable count "
    "aggregate.",
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("source"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("lang", F.col("source").alias("mode_source"), F.col("n").alias("mode_count"))
    )


@register(
    "events_feature_lags",
    oracle="""
        SELECT event_id, user_id, ts, value,
               lag(value, 1) OVER w AS lag1,
               lag(value, 2) OVER w AS lag2,
               value - lag(value, 1) OVER w AS delta1,
               CAST(epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS BIGINT)
                   AS micros_since_prev
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Per-entity lag features — the bread-and-butter feature "
    "engineering pass for sequence models and churn/anomaly training "
    "sets: previous readings, first difference, and inter-event time, "
    "all from ONE user-keyed ordered window (high-cardinality "
    "partition key, one corpus shuffle, no funnel). Inter-event gap "
    "is exact integer microseconds (epoch_us both engines), not a "
    "float subtraction.",
)
def events_feature_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_micros = F.unix_micros(F.lag(F.col("ts").cast("timestamp"), 1).over(w))
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value", 1).over(w).alias("lag1"),
        F.lag("value", 2).over(w).alias("lag2"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta1"),
        (micros - prev_micros).cast("long").alias("micros_since_prev"),
    )


_ROLL_DISTINCT_W = 5


@register(
    "window_rolling_distinct",
    oracle=f"""
        SELECT event_id, user_id, ts,
               CAST(len(list_distinct(list(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {_ROLL_DISTINCT_W - 1} PRECEDING AND CURRENT ROW
               ))) AS BIGINT) AS n_distinct_types
        FROM events
    """,
    doc="Rolling COUNT(DISTINCT) over a window frame — a capability "
    "neither engine's window syntax allows directly (DISTINCT "
    "aggregates are invalid in OVER clauses): spelled as "
    "size(array_distinct(collect_list)) over the bounded 5-row frame, "
    "identical in the oracle with list_distinct(list(...)). Frames "
    "are bounded so the materialized lists are constant-size; the "
    "window keys on user_id (high cardinality, one shuffle). The "
    "behavioral-diversity signal (how many distinct actions in the "
    "last N) feeds session-quality and bot-detection features.",
)
def window_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_ROLL_DISTINCT_W - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.array_distinct(F.collect_list("event_type").over(w)))
        .cast("long")
        .alias("n_distinct_types"),
    )


from sql_engine_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum  # noqa: E402

_NEAREST_TOL_US = 1_800_000_000  # 30 minutes


@register(
    "join_asof_nearest",
    oracle=f"""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
        ),
        pairs AS (
            SELECT p.event_id AS pid, v.event_id AS vid, v.ts AS vts,
                   abs(epoch_us(v.ts) - epoch_us(p.ts)) AS d,
                   CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END AS dir
            FROM p JOIN v ON p.user_id = v.user_id
             AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= {_NEAREST_TOL_US}
        ),
        best AS (
            SELECT pid, vid, vts FROM (
                SELECT pid, vid, vts,
                       row_number() OVER (
                           PARTITION BY pid ORDER BY d, dir, vid DESC) AS rk
                FROM pairs
            ) WHERE rk = 1
        )
        SELECT p.event_id, p.user_id, p.ts,
               best.vid AS nearest_view_id, best.vts AS nearest_view_ts
        FROM p LEFT JOIN best ON best.pid = p.event_id
    """,
    doc="NEAREST-neighbor temporal join (either direction, 30-minute "
    "tolerance): each purchase matched to the closest same-user view "
    "by |time delta|, ties to the earlier side then the larger id — "
    "the sensor-alignment primitive pandas calls merge_asof("
    "direction='nearest'). Spelled as TWO union+window as-of passes "
    "(operators/asof.py) — backward on event time, forward on NEGATED "
    "time (an as-of join under order reversal) — then a per-row pick "
    "of the closer candidate: two user-keyed shuffles, no quadratic "
    "pairing. The oracle is the naive tolerance join + rank, so the "
    "hash match proves the two-pass decomposition complete.",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", micros.alias("tm")
    )
    v = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("v_event_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
        micros.alias("v_tm"),
    )
    back = asof_join(
        p,
        v,
        key="user_id",
        left_ts="tm",
        right_ts="v_tm",
        right_payload=["v_event_id", "v_ts"],
    ).select(
        "event_id",
        "user_id",
        "ts",
        "tm",
        F.col("asof_v_event_id").alias("b_id"),
        F.col("asof_v_ts").alias("b_ts"),
        # asof_ts is the matched right-side order value — here v_tm
        F.col("asof_ts").alias("b_tm"),
    )
    fwd = asof_join(
        p.withColumn("neg_tm", -F.col("tm")),
        v.withColumn("neg_v_tm", -F.col("v_tm")),
        key="user_id",
        left_ts="neg_tm",
        right_ts="neg_v_tm",
        right_payload=["v_event_id", "v_ts", "v_tm"],
    ).select(
        "event_id",
        F.col("asof_v_event_id").alias("f_id"),
        F.col("asof_v_ts").alias("f_ts"),
        F.col("asof_v_tm").alias("f_tm"),
    )
    both = back.join(fwd, "event_id", "left")
    b_d = F.col("tm") - F.col("b_tm")
    f_d = F.col("f_tm") - F.col("tm")
    b_ok = F.col("b_tm").isNotNull() & (b_d <= _NEAREST_TOL_US)
    f_ok = F.col("f_tm").isNotNull() & (f_d <= _NEAREST_TOL_US)
    # closer wins; ties -> backward (dir 0 first, matching the oracle)
    pick_b = b_ok & (~f_ok | (b_d <= f_d))
    pick_f = f_ok & ~pick_b
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(pick_b, F.col("b_id"))
        .when(pick_f, F.col("f_id"))
        .alias("nearest_view_id"),
        F.when(pick_b, F.col("b_ts"))
        .when(pick_f, F.col("f_ts"))
        .alias("nearest_view_ts"),
    )


@register(
    "agg_corr_manual",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   {sql_dsum('value')} AS sx,
                   {sql_dsum('value * value')} AS sxx,
                   {sql_dsum('CAST(hour(ts) AS DOUBLE)')} AS sy,
                   {sql_dsum('CAST(hour(ts) AS DOUBLE) * CAST(hour(ts) AS DOUBLE)')}
                       AS syy,
                   {sql_dsum('value * CAST(hour(ts) AS DOUBLE)')} AS sxy
            FROM events GROUP BY event_type
        )
        SELECT event_type, CAST(n AS BIGINT) AS n_rows,
               ((n * sxy) - (sx * sy))
                   / sqrt(((n * sxx) - (sx * sx)) * ((n * syy) - (sy * sy)))
                   AS corr_value_hour,
               ((n * sxy) - (sx * sy)) / ((n * syy) - (sy * sy))
                   AS regr_slope_on_hour
        FROM s
    """,
    doc="Pearson correlation + regression slope per group, from "
    "DECIMAL-exact co-moment sums: the built-in corr()/regr_slope() "
    "stream co-moments in engine-specific update orders (result "
    "depends on partitioning and differs across engines in the last "
    "ulps), so the five sufficient statistics are reduced exactly "
    "(DECIMAL(27,6), order-free) and the closed form evaluates in "
    "deterministic double arithmetic — same discipline as every "
    "dsum-based aggregate here. One map-side-combinable shuffle; "
    "sqrt is IEEE correctly-rounded, no libm hazard.",
)
def agg_corr_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn(
        "hr", F.hour("ts").cast("double")
    )
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        dsum("value").alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
        dsum("hr").alias("sy"),
        dsum(F.col("hr") * F.col("hr")).alias("syy"),
        dsum(F.col("value") * F.col("hr")).alias("sxy"),
    )
    cov_n = (F.col("n") * F.col("sxy")) - (F.col("sx") * F.col("sy"))
    var_x = (F.col("n") * F.col("sxx")) - (F.col("sx") * F.col("sx"))
    var_y = (F.col("n") * F.col("syy")) - (F.col("sy") * F.col("sy"))
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_rows"),
        (cov_n / F.sqrt(var_x * var_y)).alias("corr_value_hour"),
        (cov_n / var_y).alias("regr_slope_on_hour"),
    )


@register(
    "events_hourly_profile",
    oracle=f"""
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_davg('value')} AS avg_value
        FROM events GROUP BY event_type, hour(ts)
    """,
    doc="Hour-of-day seasonality profile per event type — the "
    "daily-rhythm baseline behind anomaly thresholds and traffic "
    "forecasting. One map-side-combinable aggregate over "
    "(type, hour); averages via exact decimal sums so the profile is "
    "partition-order-independent.",
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hour_of_day")
    ).agg(
        F.count("*").cast("long").alias("n"),
        davg("value").alias("avg_value"),
    )


_HIST_BINS = 10
_HIST_LO, _HIST_HI = 0.0, 1000.0


@register(
    "agg_histogram_fixed_bins",
    oracle=f"""
        SELECT event_type,
               CAST(least(FLOOR((value - {_HIST_LO})
                          * {_HIST_BINS} / ({_HIST_HI} - {_HIST_LO})),
                          {_HIST_BINS - 1}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(value) AS bin_min,
               MAX(value) AS bin_max
        FROM events
        WHERE value >= {_HIST_LO} AND value <= {_HIST_HI}
        GROUP BY 1, 2
    """,
    doc="Fixed-width histogram per event type (10 bins over the value "
    "domain, top edge closed) — the profiling aggregate behind every "
    "data-quality dashboard and the binned input to drift detection. "
    "Bin assignment is exact integer-from-double FLOOR arithmetic "
    "spelled identically in both engines; one map-side-combinable "
    "aggregate, (type x bins) output rows, pushed-down range filter.",
)
def agg_histogram_fixed_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").where(
        (F.col("value") >= _HIST_LO) & (F.col("value") <= _HIST_HI)
    )
    bin_col = F.least(
        F.floor(
            (F.col("value") - F.lit(_HIST_LO))
            * F.lit(_HIST_BINS)
            / F.lit(_HIST_HI - _HIST_LO)
        ),
        F.lit(_HIST_BINS - 1),
    ).cast("long")
    return ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


@register(
    "events_time_to_convert",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT user_id, ts FROM events WHERE event_type = 'view'
        ),
        matched AS (
            SELECT p.event_id,
                   epoch_us(p.ts) - max(epoch_us(v.ts)) AS delay_us
            FROM p JOIN v
              ON v.user_id = p.user_id AND v.ts <= p.ts
            GROUP BY p.event_id, p.ts
        ),
        d AS (
            SELECT list_sort(list(CAST(delay_us AS DOUBLE) / 1000000.0))
                       AS vals
            FROM matched
        )
        SELECT CAST(len(vals) AS BIGINT) AS n_converted,
               vals[CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 1]
               + ((len(vals) - 1) * 0.5 - FLOOR((len(vals) - 1) * 0.5))
                 * (vals[least(CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 2,
                               len(vals))]
                    - vals[CAST(FLOOR((len(vals) - 1) * 0.5) AS BIGINT) + 1])
                   AS p50_seconds,
               -- 0.9 pinned to DOUBLE: a bare 0.9 parses as DECIMAL in
               -- DuckDB, making (n-1)*0.9 exact where Spark's double
               -- product is not (0.5 is binary-exact and safe)
               vals[CAST(FLOOR((len(vals) - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1]
               + ((len(vals) - 1) * CAST(0.9 AS DOUBLE)
                  - FLOOR((len(vals) - 1) * CAST(0.9 AS DOUBLE)))
                 * (vals[least(CAST(FLOOR((len(vals) - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 2,
                               len(vals))]
                    - vals[CAST(FLOOR((len(vals) - 1) * CAST(0.9 AS DOUBLE)) AS BIGINT) + 1])
                   AS p90_seconds,
               vals[len(vals)] AS max_seconds
        FROM d
    """,
    doc="View-to-purchase conversion latency: each purchase matched to "
    "the user's LATEST prior view (the as-of semantics, spelled as a "
    "max-per-purchase group in the oracle and the union+window as-of "
    "join in Spark — two independent spellings), delays summarized as "
    "exact interpolated p50/p90/max in integer-microsecond-derived "
    "seconds. Funnel *latency* is the metric product teams pair with "
    "funnel *counts* (events_user_funnel). The exact percentiles run "
    "through the bucketed two-level rank + rank-targeted join "
    "(operators/prefix.bucketed_value_rank) — the delay relation is "
    "purchase-count-sized, so a single collect_list buffer would be "
    "the same funnel agg_percentile_exact was rewritten to avoid; "
    "only the oracle (DuckDB-side, oracle scale) materializes the "
    "sorted list.",
)
def events_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", micros.alias("tm")
    )
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", micros.alias("v_tm")
    )
    from sql_engine_spark.operators.dedup import _persist
    from sql_engine_spark.operators.prefix import bucketed_value_rank

    matched = _persist(
        asof_join(
            p,
            v.withColumn("__one", F.lit(1)),
            key="user_id",
            left_ts="tm",
            right_ts="v_tm",
            right_payload=["__one"],
        )
        .where(F.col("asof_ts").isNotNull())
        .select(
            "event_id",
            ((F.col("tm") - F.col("asof_ts")).cast("double") / 1e6).alias(
                "delay_s"
            ),
        )
    )
    n_rows = matched.count()
    ranked = bucketed_value_rank(
        matched,
        part_cols=[],
        value_col="delay_s",
        tie_col="event_id",
        n_rows=n_rows,
        out_col="rk",
    )
    n = matched.agg(
        F.count("*").cast("long").alias("n"),
        F.max("delay_s").alias("max_seconds"),
    )
    t_structs = F.array(
        *[
            F.struct(
                F.lit(name).alias("name"),
                ((F.col("n") - 1).cast("double") * F.lit(p_)).alias("h"),
            )
            for p_, name in ((0.5, "p50_seconds"), (0.9, "p90_seconds"))
        ]
    )
    targets = n.select("n", F.explode(t_structs).alias("t")).select(
        "n",
        F.col("t.name").alias("name"),
        (F.floor("t.h").cast("long") + 1).alias("lo_rank"),
        F.least(F.floor("t.h").cast("long") + 2, F.col("n")).alias("hi_rank"),
        (F.col("t.h") - F.floor("t.h")).alias("frac"),
    )
    hits = ranked.join(
        F.broadcast(targets),
        (F.col("rk") == F.col("lo_rank")) | (F.col("rk") == F.col("hi_rank")),
    )
    per_p = hits.groupBy("name", "lo_rank", "hi_rank", "frac").agg(
        F.max(F.when(F.col("rk") == F.col("lo_rank"), F.col("delay_s"))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("rk") == F.col("hi_rank"), F.col("delay_s"))).alias(
            "v_hi"
        ),
    )
    pv = per_p.select(
        "name",
        (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
            "pv"
        ),
    )
    wide = pv.groupBy().agg(
        F.max(F.when(F.col("name") == "p50_seconds", F.col("pv"))).alias(
            "p50_seconds"
        ),
        F.max(F.when(F.col("name") == "p90_seconds", F.col("pv"))).alias(
            "p90_seconds"
        ),
    )
    return n.crossJoin(wide).select(
        F.col("n").alias("n_converted"),
        "p50_seconds",
        "p90_seconds",
        "max_seconds",
    )


def _median_from_sorted(vals_expr: str, spark_side: bool) -> str:
    """Exact interpolated median over a sorted array column — the one
    shared formula (see agg_percentile_exact)."""
    size = f"size({vals_expr})" if spark_side else f"len({vals_expr})"
    el = (
        (lambda i: f"element_at({vals_expr}, {i})")
        if spark_side
        else (lambda i: f"({vals_expr})[{i}]")
    )
    h = f"CAST(({size} - 1) AS DOUBLE) * 0.5"
    lo = f"CAST(FLOOR({h}) AS {'INT' if spark_side else 'BIGINT'}) + 1"
    hi = f"least({lo} + 1, {size})"
    frac = f"({h} - FLOOR({h}))"
    return f"({el(lo)} + {frac} * ({el(hi)} - {el(lo)}))"


_MAD_K = 3.0


def _ranked_group_median(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    tie_col: str,
    n_rows: int,
    out_col: str = "med",
) -> DataFrame:
    """Exact interpolated per-group median with NO per-group value list:
    rank every row through the shared two-level bucketed scan
    (operators/prefix.bucketed_value_rank — widest window is
    (group, bucket)-partitioned), derive the two target ranks
    floor((n-1)/2)+1 / +2 from the per-group counts (a broadcast-sized
    relation), and read the values AT those ranks with a broadcast
    join. Identical to the sorted-list interpolation formula by
    construction; this is the agg_percentile_exact machinery
    specialized to p=0.5 so MAD-style operators can take TWO ranked
    passes instead of two collect_list funnels."""
    from sql_engine_spark.operators.prefix import bucketed_value_rank

    ranked = bucketed_value_rank(
        df,
        part_cols=[group_col],
        value_col=value_col,
        tie_col=tie_col,
        n_rows=n_rows,
        out_col="__rank",
    )
    h = (F.col("n") - 1).cast("double") * F.lit(0.5)
    targets = (
        df.groupBy(F.col(group_col).alias("__g"))
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "__g",
            (F.floor(h).cast("long") + 1).alias("lo_rank"),
            F.least(F.floor(h).cast("long") + 2, F.col("n")).alias("hi_rank"),
            (h - F.floor(h)).alias("frac"),
        )
    )
    hits = ranked.join(
        F.broadcast(targets),
        (F.col(group_col) == F.col("__g"))
        & (
            (F.col("__rank") == F.col("lo_rank"))
            | (F.col("__rank") == F.col("hi_rank"))
        ),
    )
    per = hits.groupBy("__g", "lo_rank", "hi_rank", "frac").agg(
        F.max(F.when(F.col("__rank") == F.col("lo_rank"), F.col(value_col))).alias(
            "v_lo"
        ),
        F.max(F.when(F.col("__rank") == F.col("hi_rank"), F.col(value_col))).alias(
            "v_hi"
        ),
    )
    return per.select(
        F.col("__g").alias(group_col),
        (F.col("v_lo") + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))).alias(
            out_col
        ),
    )


@register(
    "events_anomaly_mad",
    oracle=f"""
        WITH med AS (
            SELECT event_type,
                   {_median_from_sorted('list_sort(list(value))', False)} AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type,
                   {_median_from_sorted(
                       'list_sort(list(abs(e.value - m.med)))', False)} AS mad,
                   MIN(m.med) AS med
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type, e.value, m.med, m.mad,
               CASE WHEN m.mad > 0.0
                        AND abs(e.value - m.med) / m.mad > {_MAD_K}
                    THEN TRUE ELSE FALSE END AS is_outlier
        FROM events e JOIN mad m USING (event_type)
    """,
    doc="Robust outlier detection by median absolute deviation: flag "
    "events where |value - median| / MAD > 3 per event type — the "
    "robust alternative to z-scores (events_anomaly_zscore), immune "
    "to the outliers it hunts inflating the threshold. A median is "
    "the value at one rank, so BOTH grouped medians run through the "
    "bucketed two-level rank + broadcast rank-target join "
    "(_ranked_group_median, the agg_percentile_exact machinery): "
    "pass one ranks value, pass two ranks |value - med| with med "
    "broadcast from pass one. event_type cardinality is tiny, so a "
    "per-group collect_list would funnel billions of doubles through "
    "single aggregation buffers at 100x — no list exists anywhere in "
    "this plan. Zero-MAD groups flag nothing, explicitly, in both "
    "engines.",
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    ev = _persist(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    )
    n = ev.count()
    med = _ranked_group_median(
        ev, group_col="event_type", value_col="value", tie_col="event_id",
        n_rows=n, out_col="med",
    )
    dev = _persist(
        ev.join(F.broadcast(med), "event_type").select(
            "event_id",
            "event_type",
            "med",
            F.abs(F.col("value") - F.col("med")).alias("__adev"),
        )
    )
    mad = _ranked_group_median(
        dev, group_col="event_type", value_col="__adev", tie_col="event_id",
        n_rows=n, out_col="mad",
    ).join(F.broadcast(med), "event_type")
    return ev.join(F.broadcast(mad), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        "mad",
        (
            (F.col("mad") > 0.0)
            & (F.abs(F.col("value") - F.col("med")) / F.col("mad") > _MAD_K)
        ).alias("is_outlier"),
    )


@register(
    "events_dau_wau_stickiness",
    oracle="""
        WITH du AS (
            SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                            user_id
            FROM events
        ),
        days AS (SELECT DISTINCT day FROM du),
        dau AS (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day
        ),
        contrib AS (
            SELECT d.day AS target_day, u.user_id
            FROM du u JOIN days d
              ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
        ),
        wau AS (
            SELECT target_day AS day,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
            FROM contrib GROUP BY target_day
        )
        SELECT day, dau, wau,
               CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
        FROM dau JOIN wau USING (day)
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day — the product-"
    "analytics staple, spelled EXACTLY (no sketch): daily (day, user) "
    "distinct pairs, each contributing to its 7 covering target days "
    "via a bounded interval join (a 7-day band keyed on the day "
    "column, day-cardinality relation — never a row-level window, "
    "and COUNT(DISTINCT) inside a window is invalid SQL anyway). "
    "Corpus-sized work is ONE distinct over (day, user); everything "
    "after is day x users-per-day scale. Stickiness = DAU/WAU, the "
    "engagement ratio.",
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.operators.dedup import _persist

    ev = load(spark, sf_dir, "events")
    du = _persist(
        ev.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
        ).distinct()
    )
    dau = du.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    # Each (day, user) contributes to exactly the 7 target days
    # [day, day+6]: GENERATE them (explode of a 7-element sequence — a
    # pure map stage, constant 7 rows out per row in) instead of a
    # range-predicate join against the distinct-days relation, which
    # Catalyst plans as a broadcast nested loop whose per-row probe
    # count grows with history length. Target days with no activity
    # of their own drop at the final inner join with dau.
    contrib = du.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = contrib.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )
