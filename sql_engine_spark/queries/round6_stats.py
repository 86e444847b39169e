"""Round-6 exact-statistics operators: trimmed means, higher moments,
weighted medians, change-point detection, RFM segmentation,
inter-arrival percentiles, and seasonality profiles.

All rank-at-scale work reuses operators/prefix.bucketed_value_rank (the
two-level bucketed scan) — values AT RANKS, never a per-group
materialized list (the round-5 verdict's percentile discipline). All
floating reductions go through DECIMAL(27,6) (functions/numeric) so
results are order-independent and engine-exact; per-row double
arithmetic keeps one shared op order in both engines.

The reference engine (dylan-p-wong/sql-engine, src/planner/mod.rs
single-SELECT surface, aggregation.rs min/max/sum/count/avg only)
expresses none of these; they extend the analytics surface of
SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, sql_dsum, sql_ssum, ssum
from sql_engine_spark.io import load
from sql_engine_spark.operators.dedup import _persist
from sql_engine_spark.operators.prefix import bucketed_value_rank
from sql_engine_spark.registry import register

_TRIM_FRAC = 10  # drop floor(n/10) rows from each tail


@register(
    "agg_trimmed_mean_exact",
    oracle=f"""
        WITH r AS (
            SELECT event_type, event_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id) AS BIGINT) AS rk
            FROM events
        ),
        n AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        )
        SELECT r.event_type, n.n,
               CAST(FLOOR(n.n / {_TRIM_FRAC}) AS BIGINT) AS k_trim,
               {sql_dsum('value')} / COUNT(*) AS trimmed_mean
        FROM r JOIN n USING (event_type)
        WHERE rk > FLOOR(n.n / {_TRIM_FRAC})
          AND rk <= n.n - FLOOR(n.n / {_TRIM_FRAC})
        GROUP BY r.event_type, n.n
    """,
    doc="10%-trimmed mean per event type — the outlier-robust location "
    "estimate (drop the floor(n/10) smallest and largest values, "
    "average the rest). Needs only a RANK per row, so it runs through "
    "the bucketed two-level rank (operators/prefix.bucketed_value_rank "
    "— widest window is (event_type, value-bucket)-partitioned), a "
    "broadcast of the per-group counts, and one decimal-exact mean "
    "over the kept band. No per-group value list anywhere; the same "
    "discipline as agg_percentile_exact.",
)
def agg_trimmed_mean_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="rk",
    )
    counts = ev.groupBy(F.col("event_type").alias("__g")).agg(
        F.count("*").cast("long").alias("n")
    )
    j = ranked.join(
        F.broadcast(counts), F.col("event_type") == F.col("__g")
    ).where(
        (F.col("rk") > F.floor(F.col("n") / _TRIM_FRAC))
        & (F.col("rk") <= F.col("n") - F.floor(F.col("n") / _TRIM_FRAC))
    )
    return j.groupBy("event_type", "n").agg(
        F.floor(F.col("n") / _TRIM_FRAC).cast("long").alias("k_trim"),
        (dsum("value") / F.count("*")).alias("trimmed_mean"),
    ).select("event_type", "n", "k_trim", "trimmed_mean")


@register(
    "agg_skew_kurtosis_exact",
    oracle=f"""
        WITH s AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   {sql_dsum('value')} AS s1,
                   {sql_dsum('value * value')} AS s2,
                   {sql_ssum('(value * value) * value')} AS s3,
                   {sql_ssum('(value * value) * (value * value)')} AS s4
            FROM events GROUP BY event_type
        ),
        m AS (
            SELECT event_type, n,
                   s1 / CAST(n AS DOUBLE) AS mu,
                   s2 / CAST(n AS DOUBLE) AS r2,
                   s3 / CAST(n AS DOUBLE) AS r3,
                   s4 / CAST(n AS DOUBLE) AS r4
            FROM s
        ),
        c AS (
            SELECT event_type, n,
                   r2 - mu * mu AS m2,
                   r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
                   r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
                      - 3.0 * mu * mu * mu * mu AS m4
            FROM m
        )
        SELECT event_type, n,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) AS kurtosis
        FROM c
    """,
    doc="Sample skewness and kurtosis per event type — the "
    "distribution-shape moments a data-quality monitor tracks. ONE "
    "map-side-combinable aggregate pass collecting the raw power sums "
    "s1/s2 through DECIMAL(27,6) and the wide-range s3/s4 through the "
    "scaled-integer ssum (functions/numeric.ssum — the double->decimal "
    "cast itself rounds differently across engines for high powers, "
    "so the 6-decimal rounding runs in shared IEEE arithmetic), "
    "then the closed-form central moments evaluate in deterministic "
    "double arithmetic with one shared op order. g1 = m3/m2^1.5, "
    "g2 = m4/m2^2 (biased sample moments — the formula is part of the "
    "contract); sqrt is IEEE correctly-rounded, no libm log/pow.",
)
def agg_skew_kurtosis_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        dsum(v).alias("s1"),
        dsum(v * v).alias("s2"),
        ssum((v * v) * v).alias("s3"),
        ssum((v * v) * (v * v)).alias("s4"),
    )
    nD = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "n",
        (F.col("s1") / nD).alias("mu"),
        (F.col("s2") / nD).alias("r2"),
        (F.col("s3") / nD).alias("r3"),
        (F.col("s4") / nD).alias("r4"),
    )
    mu = F.col("mu")
    c = m.select(
        "event_type",
        "n",
        (F.col("r2") - mu * mu).alias("m2"),
        (F.col("r3") - F.lit(3.0) * mu * F.col("r2") + F.lit(2.0) * mu * mu * mu).alias(
            "m3"
        ),
        (
            F.col("r4")
            - F.lit(4.0) * mu * F.col("r3")
            + F.lit(6.0) * mu * mu * F.col("r2")
            - F.lit(3.0) * mu * mu * mu * mu
        ).alias("m4"),
    )
    return c.select(
        "event_type",
        "n",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias("skewness"),
        (F.col("m4") / (F.col("m2") * F.col("m2"))).alias("kurtosis"),
    )


@register(
    "agg_weighted_median_bytes",
    oracle="""
        WITH r AS (
            SELECT source, doc_id, n_chars,
                   CAST(SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY n_chars, doc_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumw
            FROM documents
        ),
        t AS (
            SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
            FROM documents GROUP BY source
        )
        SELECT r.source, t.w AS total_bytes,
               CAST(MIN(n_chars) AS BIGINT) AS weighted_median_len
        FROM r JOIN t USING (source)
        WHERE 2 * cumw >= w
        GROUP BY r.source, t.w
    """,
    doc="BYTE-weighted median document length per source: the length L "
    "such that half the corpus BYTES sit in docs of length <= L — the "
    "storage-planning stat ('half our data is in docs longer than X'), "
    "which the row-median badly understates under long-tail lengths. "
    "The cumulative weight is the bucketed two-level running sum "
    "(weight_col=n_chars) — never a per-source corpus window — and the "
    "half-mass threshold is the INTEGER test 2*cumw >= W (no doubles, "
    "no rounding seam). Corpus work: one shuffle + one bounded "
    "aggregate.",
)
def agg_weighted_median_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _persist(
        load(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    )
    ranked = bucketed_value_rank(
        docs,
        part_cols=["source"],
        value_col="n_chars",
        tie_col="doc_id",
        n_rows=docs.count(),
        weight_col="n_chars",
        out_col="cumw",
    )
    totals = docs.groupBy(F.col("source").alias("__g")).agg(
        F.sum("n_chars").cast("long").alias("w")
    )
    return (
        ranked.join(F.broadcast(totals), F.col("source") == F.col("__g"))
        .where(2 * F.col("cumw") >= F.col("w"))
        .groupBy("source", F.col("w").alias("total_bytes"))
        .agg(F.min("n_chars").cast("long").alias("weighted_median_len"))
    )


@register(
    "events_changepoint_cusum",
    oracle="""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM daily
        ),
        c AS (
            SELECT day, cnt,
                   CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rk,
                   CAST(SUM(cnt) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM daily
        ),
        s AS (
            SELECT day, cnt, d * cum - rk * n AS dev_scaled
            FROM c CROSS JOIN tot
        )
        SELECT day, cnt, dev_scaled,
               abs(dev_scaled) = MAX(abs(dev_scaled)) OVER () AS is_changepoint
        FROM s
    """,
    doc="Offline change-point detection on the daily event-rate series "
    "— the classic CUSUM split statistic S_k = cumsum(x - mean), whose "
    "argmax locates the most likely level shift (Page 1954; Taylor's "
    "changepoint bootstrap uses exactly this). Spelled EXACTLY in "
    "integers: dev_scaled = D*cum_k - k*N (the deviation scaled by "
    "D = n_days), so no double drift and a hashable oracle. Corpus "
    "work is ONE daily count aggregate; every window after runs on the "
    "CALENDAR-bounded day relation (days grow with time, not data "
    "volume — thousands of rows at any corpus size, hence the bare "
    "windows are safe here, unlike value ranks).",
)
def events_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("cnt"))
    tot = daily.agg(
        F.sum("cnt").cast("long").alias("n"), F.count("*").cast("long").alias("d")
    )
    w = Window.orderBy("day")
    c = daily.select(
        "day",
        "cnt",
        F.row_number().over(w).cast("long").alias("rk"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long")
        .alias("cum"),
    )
    s = c.crossJoin(F.broadcast(tot)).select(
        "day",
        "cnt",
        (F.col("d") * F.col("cum") - F.col("rk") * F.col("n")).alias("dev_scaled"),
    )
    wmax = Window.partitionBy()
    return s.select(
        "day",
        "cnt",
        "dev_scaled",
        (F.abs("dev_scaled") == F.max(F.abs("dev_scaled")).over(wmax)).alias(
            "is_changepoint"
        ),
    )


@register(
    "events_rfm_segments",
    oracle=f"""
        WITH anchor AS (SELECT MAX(ts) AS amax FROM events),
        u AS (
            SELECT user_id,
                   CAST(datediff('day', CAST(MAX(ts) AS DATE),
                                 CAST((SELECT amax FROM anchor) AS DATE))
                        AS BIGINT) AS recency_days,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   {sql_dsum('value')} AS monetary
            FROM events GROUP BY user_id
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   {sql_dsum('value')} AS total_value
            FROM events
        )
        SELECT user_id, recency_days, frequency, monetary,
               CASE WHEN frequency * n_users > n_events
                         AND monetary * CAST(n_users AS DOUBLE) > total_value
                        THEN 'champion'
                    WHEN monetary * CAST(n_users AS DOUBLE) > total_value
                        THEN 'big_spender'
                    WHEN frequency * n_users > n_events THEN 'frequent'
                    ELSE 'casual'
               END AS segment
        FROM u CROSS JOIN g
    """,
    doc="RFM (recency / frequency / monetary) per user with ABOVE-"
    "AVERAGE segmentation — the product-analytics staple. Thresholds "
    "are relative to the corpus (freq*U > N and monetary*U > total), "
    "so the segments stay meaningful at any scale factor; the "
    "frequency test is pure integer cross-multiplication and the "
    "monetary test compares decimal-exact doubles with one shared op "
    "order. One per-user aggregate (map-side combinable, keyed on "
    "high-cardinality user_id) + one broadcast scalar row.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(load(spark, sf_dir, "events"))
    anchor = ev.agg(F.max("ts").alias("amax"))
    g = ev.agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        dsum("value").alias("total_value"),
    )
    u = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max("amax").cast("date"), F.max("ts").cast("date")
            )
            .cast("long")
            .alias("recency_days"),
            F.count("*").cast("long").alias("frequency"),
            dsum("value").alias("monetary"),
        )
    )
    freq_hot = F.col("frequency") * F.col("n_users") > F.col("n_events")
    mon_hot = (
        F.col("monetary") * F.col("n_users").cast("double") > F.col("total_value")
    )
    return u.crossJoin(F.broadcast(g)).select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.when(freq_hot & mon_hot, "champion")
        .when(mon_hot, "big_spender")
        .when(freq_hot, "frequent")
        .otherwise("casual")
        .alias("segment"),
    )


_GAP_PCTS = (0.5, 0.9, 0.99)


def _pd(p: float) -> str:
    """Percentile literal pinned to DOUBLE in the oracle: a bare 0.99
    parses as DECIMAL(3,2) in DuckDB, making (n-1)*p EXACT where
    Spark's double product is not — 0.25/0.5/0.75 are binary-exact so
    agg_percentile_exact never hit this, 0.99 is not."""
    return f"CAST({p} AS DOUBLE)"


@register(
    "events_interarrival_profile",
    oracle=f"""
        WITH g AS (
            SELECT CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   AS BIGINT) AS gap_us,
                   event_id
            FROM events
        ),
        gaps AS (SELECT gap_us, event_id FROM g WHERE gap_us IS NOT NULL),
        r AS (
            SELECT gap_us,
                   CAST(row_number() OVER (ORDER BY gap_us, event_id)
                        AS BIGINT) AS rk
            FROM gaps
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM gaps)
        SELECT n.n AS n_gaps,
               {", ".join(
                   "CAST((SELECT gap_us FROM r WHERE rk = CAST(FLOOR((n.n - 1) * " + _pd(p)
                   + ") AS BIGINT) + 1) AS DOUBLE) "
                   "+ ((n.n - 1) * " + _pd(p) + " - FLOOR((n.n - 1) * " + _pd(p) + ")) "
                   "* (CAST((SELECT gap_us FROM r WHERE rk = least(CAST(FLOOR((n.n - 1) * "
                   + _pd(p) + ") AS BIGINT) + 2, n.n)) AS DOUBLE) "
                   "- CAST((SELECT gap_us FROM r WHERE rk = CAST(FLOOR((n.n - 1) * "
                   + _pd(p) + ") AS BIGINT) + 1) AS DOUBLE))"
                   f" AS p{int(p * 100)}_us"
                   for p in _GAP_PCTS
               )}
        FROM n
    """,
    doc="Inter-arrival time profile: exact interpolated p50/p90/p99 of "
    "the per-user event gap (microseconds) — the load-model stat "
    "behind capacity planning and bot detection. Gaps come from a "
    "per-user lag window (keyed on high-cardinality user_id, bounded "
    "rows per user); the GLOBAL percentiles then run through the "
    "bucketed two-level rank + rank-targeted broadcast join, same "
    "machinery and interpolation formula as agg_percentile_exact — "
    "no global sort, no value list.",
)
def events_interarrival_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = (F.unix_micros(F.col("ts").cast("timestamp")))
    gaps = _persist(
        ev.select((us - F.lag(us).over(w)).alias("gap_us"), "event_id").where(
            F.col("gap_us").isNotNull()
        )
    )
    n_rows = gaps.count()
    ranked = bucketed_value_rank(
        gaps,
        part_cols=[],
        value_col="gap_us",
        tie_col="event_id",
        n_rows=n_rows,
        out_col="rk",
    )
    n = gaps.agg(F.count("*").cast("long").alias("n"))
    t_structs = F.array(
        *[
            F.struct(
                F.lit(int(p * 100)).alias("pct"),
                ((F.col("n") - 1).cast("double") * F.lit(p)).alias("h"),
            )
            for p in _GAP_PCTS
        ]
    )
    targets = (
        n.select("n", F.explode(t_structs).alias("t"))
        .select(
            "n",
            F.col("t.pct").alias("pct"),
            (F.floor("t.h").cast("long") + 1).alias("lo_rank"),
            F.least(F.floor("t.h").cast("long") + 2, F.col("n")).alias("hi_rank"),
            (F.col("t.h") - F.floor("t.h")).alias("frac"),
        )
    )
    hits = ranked.join(
        F.broadcast(targets),
        (F.col("rk") == F.col("lo_rank")) | (F.col("rk") == F.col("hi_rank")),
    )
    per_p = hits.groupBy("n", "pct", "lo_rank", "hi_rank", "frac").agg(
        F.max(
            F.when(F.col("rk") == F.col("lo_rank"), F.col("gap_us"))
        ).alias("v_lo"),
        F.max(
            F.when(F.col("rk") == F.col("hi_rank"), F.col("gap_us"))
        ).alias("v_hi"),
    )
    pv = per_p.select(
        "n",
        "pct",
        (
            F.col("v_lo").cast("double")
            + F.col("frac")
            * (F.col("v_hi").cast("double") - F.col("v_lo").cast("double"))
        ).alias("pv"),
    )
    return pv.groupBy(F.col("n").alias("n_gaps")).agg(
        *[
            F.max(F.when(F.col("pct") == int(p * 100), F.col("pv"))).alias(
                f"p{int(p * 100)}_us"
            )
            for p in _GAP_PCTS
        ]
    )


@register(
    "events_seasonality_profile",
    oracle="""
        WITH c AS (
            SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        t AS (
            SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
            FROM c GROUP BY event_type
        )
        SELECT c.event_type, c.dow, c.cnt,
               CAST(7 * cnt AS DOUBLE) / CAST(n AS DOUBLE) AS dow_index
        FROM c JOIN t USING (event_type)
    """,
    doc="Day-of-week seasonality index per event type: observed count "
    "vs the uniform expectation, index = 7*cnt/total (1.0 = flat; the "
    "retail 'seasonal index'). Pure counting — one (type, dow) "
    "aggregate and a per-type total join; the only double op is the "
    "final single division, shared verbatim with the oracle. DOW "
    "convention pinned to Spark's dayofweek (1=Sunday..7); the oracle "
    "shifts DuckDB's 0-based value to match.",
)
def events_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count("*").cast("long").alias("cnt"))
    t = c.groupBy(F.col("event_type").alias("__g")).agg(
        F.sum("cnt").cast("long").alias("n")
    )
    return (
        c.join(F.broadcast(t), F.col("event_type") == F.col("__g"))
        .select(
            "event_type",
            "dow",
            "cnt",
            (
                (7 * F.col("cnt")).cast("double") / F.col("n").cast("double")
            ).alias("dow_index"),
        )
    )


@register(
    "agg_winsorized_mean",
    oracle=f"""
        WITH r AS (
            SELECT event_type, event_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value, event_id) AS BIGINT) AS rk
            FROM events
        ),
        n AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(FLOOR(COUNT(*) / {_TRIM_FRAC}) AS BIGINT) AS k
            FROM events GROUP BY event_type
        ),
        bounds AS (
            SELECT r.event_type,
                   MAX(CASE WHEN rk = k + 1 THEN value END) AS v_lo,
                   MAX(CASE WHEN rk = n - k THEN value END) AS v_hi
            FROM r JOIN n USING (event_type)
            GROUP BY r.event_type
        ),
        mid AS (
            SELECT r.event_type,
                   {sql_dsum('value')} AS mid_sum
            FROM r JOIN n USING (event_type)
            WHERE rk > k AND rk <= n - k
            GROUP BY r.event_type
        )
        SELECT n.event_type, n.n, n.k AS k_winsor, b.v_lo, b.v_hi,
               (mid_sum + CAST(n.k AS DOUBLE) * b.v_lo
                        + CAST(n.k AS DOUBLE) * b.v_hi)
                   / CAST(n.n AS DOUBLE) AS winsorized_mean
        FROM n JOIN bounds b USING (event_type) JOIN mid USING (event_type)
    """,
    doc="10%-winsorized mean per event type — the robust-location "
    "sibling of the trimmed mean that CLAMPS the tails to the band "
    "edges instead of dropping them (keeps n constant, the form used "
    "when downstream weights assume full mass). Same machinery: "
    "bucketed two-level rank, the two clamp values read AT RANKS "
    "k+1 / n-k via the rank-targeted broadcast join, one decimal-exact "
    "band sum; the clamp mass folds in closed form (k*v_lo + k*v_hi) "
    "— no second pass, no value lists.",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _persist(
        load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    )
    ranked = bucketed_value_rank(
        ev,
        part_cols=["event_type"],
        value_col="value",
        tie_col="event_id",
        n_rows=ev.count(),
        out_col="rk",
    )
    n = ev.groupBy(F.col("event_type").alias("__g")).agg(
        F.count("*").cast("long").alias("n"),
        F.floor(F.count("*") / _TRIM_FRAC).cast("long").alias("k"),
    )
    j = ranked.join(F.broadcast(n), F.col("event_type") == F.col("__g"))
    bounds = j.groupBy("event_type").agg(
        F.max(F.when(F.col("rk") == F.col("k") + 1, F.col("value"))).alias("v_lo"),
        F.max(
            F.when(F.col("rk") == F.col("n") - F.col("k"), F.col("value"))
        ).alias("v_hi"),
    )
    mid = (
        j.where((F.col("rk") > F.col("k")) & (F.col("rk") <= F.col("n") - F.col("k")))
        .groupBy(F.col("event_type").alias("__m"))
        .agg(dsum("value").alias("mid_sum"))
    )
    return (
        n.join(bounds, F.col("__g") == bounds.event_type)
        .join(mid, F.col("__g") == F.col("__m"))
        .select(
            "event_type",
            "n",
            F.col("k").alias("k_winsor"),
            "v_lo",
            "v_hi",
            (
                (
                    F.col("mid_sum")
                    + F.col("k").cast("double") * F.col("v_lo")
                    + F.col("k").cast("double") * F.col("v_hi")
                )
                / F.col("n").cast("double")
            ).alias("winsorized_mean"),
        )
    )


@register(
    "events_abtest_ztest",
    oracle="""
        WITH u AS (
            SELECT user_id,
                   CAST(user_id % 2 AS BIGINT) AS cohort,
                   CAST(CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                      THEN 1 ELSE 0 END)
                                > SUM(CASE WHEN event_type = 'view'
                                      THEN 1 ELSE 0 END)
                             THEN 1 ELSE 0 END AS BIGINT) AS converted
            FROM events GROUP BY user_id
        ),
        c AS (
            SELECT cohort,
                   CAST(COUNT(*) AS BIGINT) AS n_users,
                   CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM u GROUP BY cohort
        ),
        w AS (
            SELECT a.n_users AS n_a, a.n_converted AS c_a,
                   b.n_users AS n_b, b.n_converted AS c_b
            FROM c a JOIN c b ON a.cohort = 0 AND b.cohort = 1
        )
        SELECT n_a, c_a, n_b, c_b,
               CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
               CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
               CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b
                    THEN NULL ELSE
               (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
               / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 - CAST(c_a + c_b AS DOUBLE)
                               / CAST(n_a + n_b AS DOUBLE))
                      * (1.0 / CAST(n_a AS DOUBLE)
                         + 1.0 / CAST(n_b AS DOUBLE))) END AS z_stat,
               CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b
                    THEN NULL ELSE
               abs((CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                    - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                   / sqrt((CAST(c_a + c_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                          * (1.0 - CAST(c_a + c_b AS DOUBLE)
                                   / CAST(n_a + n_b AS DOUBLE))
                          * (1.0 / CAST(n_a AS DOUBLE)
                             + 1.0 / CAST(n_b AS DOUBLE)))) > 1.96
               END AS significant_95
        FROM w
    """,
    doc="Two-proportion z-test between user cohorts (user_id parity as "
    "the assignment): per-user conversion (any purchase), pooled-"
    "variance z statistic, and the |z| > 1.96 verdict — the A/B "
    "readout every experimentation platform computes (no t-table or "
    "erf needed for the fixed 95% threshold, so it stays libm-free: "
    "counts are exact integers, the statistic is shared-order double "
    "arithmetic and one IEEE sqrt). One per-user aggregate + one "
    "2-row cohort aggregate.",
)
def events_abtest_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        )
        .cast("long")
        .alias("converted")
    ).select((F.col("user_id") % 2).cast("long").alias("cohort"), "converted")
    c = u.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    a = c.where(F.col("cohort") == 0).select(
        F.col("n_users").alias("n_a"), F.col("n_converted").alias("c_a")
    )
    b = c.where(F.col("cohort") == 1).select(
        F.col("n_users").alias("n_b"), F.col("n_converted").alias("c_b")
    )
    w = a.crossJoin(b)
    p_a = F.col("c_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("c_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    degenerate = (F.col("c_a") + F.col("c_b") == 0) | (
        F.col("c_a") + F.col("c_b") == F.col("n_a") + F.col("n_b")
    )
    z = F.when(
        ~degenerate,
        (p_a - p_b)
        / F.sqrt(
            pool
            * (F.lit(1.0) - pool)
            * (
                F.lit(1.0) / F.col("n_a").cast("double")
                + F.lit(1.0) / F.col("n_b").cast("double")
            )
        ),
    )
    return w.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_95"),
    )
