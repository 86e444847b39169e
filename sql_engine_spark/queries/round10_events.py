"""Round-10 events batch — four sequence analyses, all libm-free:

- events_croston_forecast: Croston's method for intermittent demand
  (Croston 1972) with alpha = 1/2 so both EWMA recursions are exact
  halving folds (the events_ewma_half device).
- events_ordinal_patterns: order-3 ordinal pattern census of the daily
  series (Bandt & Pompe 2002's permutation-entropy primitive, kept in
  exact integer counts — the entropy is a reader-side log away).
- events_sampen_ratio: Sample-Entropy template matching (Richman &
  Moorman 2000) at m=2, r=0.2*sd, reporting the exact A/B match
  counts and ratio (SampEn = -ln(A/B), again reader-side).
- events_vshape_patterns: MATCH_RECOGNIZE-style V-shape detection
  (down-down-up-up over 5 consecutive per-user events) via lag
  windows — the pattern-matching surface without a dedicated clause.

Scale posture: daily series are calendar-bounded (<= days in the
window), so the sampen pair join and pattern census are O(days^2) and
O(days) — fixed cost at ANY corpus size; the corpus-proportional work
is one (type/day) or (user-ordered) aggregate. V-shape counting is a
user-partitioned window — one shuffle, frames of 5.

The reference engine has no windows/sequences at all (single-SELECT
Volcano executor, /root/reference/src/planner/mod.rs:202-207).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sql_engine_spark.io import load
from sql_engine_spark.registry import register

_CROSTON_THRESH = 150.0

# ---------------------------------------------------------------------------
# events_croston_forecast — intermittent-demand forecast, alpha = 1/2
# ---------------------------------------------------------------------------


@register(
    "events_croston_forecast",
    oracle=f"""
        WITH demand AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS d
            FROM events
            WHERE value > {_CROSTON_THRESH}
            GROUP BY 1, 2
        ),
        seq AS (
            SELECT event_type, day, d,
                   COALESCE(date_diff('day',
                       lag(day) OVER (PARTITION BY event_type
                                      ORDER BY day), day), 1) AS q
            FROM demand
        ),
        packed AS (
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_demand_days,
                   list_transform(list_sort(list(struct_pack(
                       day := day, d := d, q := q))), s -> s.d) AS ds,
                   list_transform(list_sort(list(struct_pack(
                       day := day, d := d, q := q))), s -> s.q) AS qs
            FROM seq GROUP BY event_type
        ),
        folded AS (
            SELECT event_type, n_demand_days,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(ds[-16:], x -> CAST(x AS DOUBLE))),
                       (a, x) -> a * 0.5 + x)
                   / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(ds[-16:], x -> CAST(1.0 AS DOUBLE))),
                       (a, x) -> a * 0.5 + x) AS z,
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(qs[-16:], x -> CAST(x AS DOUBLE))),
                       (a, x) -> a * 0.5 + x)
                   / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(qs[-16:], x -> CAST(1.0 AS DOUBLE))),
                       (a, x) -> a * 0.5 + x) AS p
            FROM packed
        )
        SELECT event_type, n_demand_days, z, p, z / p AS croston_forecast
        FROM folded
    """,
    doc="Croston's intermittent-demand forecast (Croston 1972) per "
    f"event type over daily 'demand' days (> {_CROSTON_THRESH}-value "
    "event counts): separate exponential smoothing of the nonzero "
    "demand sizes z and the inter-demand intervals q, forecast = "
    "z/p — the standard fix for EWMA's downward bias on sparse "
    "series (spare parts, rare event classes, long-tail sources). "
    "alpha = 1/2 over the last 16 demand points as normalized "
    "halving FOLDS (the events_ewma_half device): binary-exact, no "
    "libm pow, engine- and order-independent. The demand series is "
    "calendar-bounded (<= window days), so packing it per type is a "
    "bounded list; corpus work is one filtered (type, day) count.",
)
def events_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    demand = (
        ev.where(F.col("value") > _CROSTON_THRESH)
        .groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("day"),
        )
        .agg(F.count("*").cast("long").alias("d"))
    )
    wlag = Window.partitionBy("event_type").orderBy("day")
    seq = demand.select(
        "event_type",
        "day",
        "d",
        F.coalesce(
            F.datediff(F.col("day"), F.lag("day").over(wlag)), F.lit(1)
        )
        .cast("long")
        .alias("q"),
    )
    packed = seq.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_demand_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, d, q))), "
            "s -> s.d)"
        ).alias("ds"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, d, q))), "
            "s -> s.q)"
        ).alias("qs"),
    )

    def _fold_ewma(arr: str) -> F.Column:
        last16 = (
            f"slice({arr}, greatest(1, size({arr}) - 15), "
            f"least(size({arr}), 16))"
        )
        num = (
            f"aggregate(transform({last16}, x -> CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
        )
        den = (
            f"aggregate(transform({last16}, x -> CAST(1.0 AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (a, x) -> a * 0.5D + x)"
        )
        return F.expr(f"({num}) / ({den})")

    folded = packed.select(
        "event_type",
        "n_demand_days",
        _fold_ewma("ds").alias("z"),
        _fold_ewma("qs").alias("p"),
    )
    return folded.select(
        "event_type",
        "n_demand_days",
        "z",
        "p",
        (F.col("z") / F.col("p")).alias("croston_forecast"),
    )


# ---------------------------------------------------------------------------
# events_ordinal_patterns — order-3 ordinal pattern census of the daily series
# ---------------------------------------------------------------------------

_SQL_DAILY = """daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS x
            FROM events GROUP BY 1
        )"""


@register(
    "events_ordinal_patterns",
    oracle=f"""
        WITH {_SQL_DAILY},
        tri AS (
            SELECT x AS a,
                   lead(x, 1) OVER (ORDER BY day) AS b,
                   lead(x, 2) OVER (ORDER BY day) AS c
            FROM daily
        ),
        pat AS (
            SELECT CASE
                WHEN a <= b AND b <= c THEN '012'
                WHEN a <= c AND c < b  THEN '021'
                WHEN b < a  AND a <= c THEN '102'
                WHEN c < a  AND a <= b THEN '120'
                WHEN b <= c AND c < a  THEN '201'
                ELSE '210' END AS pattern
            FROM tri WHERE b IS NOT NULL AND c IS NOT NULL
        ),
        census AS (
            SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n
            FROM pat GROUP BY pattern
        )
        SELECT pattern, n,
               CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER () AS DOUBLE) AS share
        FROM census
    """,
    doc="Order-3 ordinal-pattern census of the daily event-count "
    "series (Bandt & Pompe PRL 2002 — the permutation-entropy "
    "primitive): each consecutive triple (a,b,c) classifies into one "
    "of the 6 rank orderings (ties resolved to the EARLIER index — "
    "the <=/< placement makes the census a partition, every triple "
    "lands in exactly one class). Reported as exact integer counts + "
    "shares; the entropy itself is a reader-side -sum(p ln p) away "
    "(kept out per the libm rule). A near-uniform census means "
    "complex/noisy dynamics; a census collapsed onto '012'/'210' "
    "means trend; missing patterns ('forbidden patterns') are the "
    "classic determinism signature. Series is calendar-bounded, so "
    "the window pass is fixed-cost; corpus work is one daily count.",
)
def events_ordinal_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    w = Window.orderBy("day")
    tri = daily.select(
        F.col("x").alias("a"),
        F.lead("x", 1).over(w).alias("b"),
        F.lead("x", 2).over(w).alias("c"),
    ).where(F.col("b").isNotNull() & F.col("c").isNotNull())
    pat = tri.select(
        F.when((F.col("a") <= F.col("b")) & (F.col("b") <= F.col("c")), "012")
        .when((F.col("a") <= F.col("c")) & (F.col("c") < F.col("b")), "021")
        .when((F.col("b") < F.col("a")) & (F.col("a") <= F.col("c")), "102")
        .when((F.col("c") < F.col("a")) & (F.col("a") <= F.col("b")), "120")
        .when((F.col("b") <= F.col("c")) & (F.col("c") < F.col("a")), "201")
        .otherwise("210")
        .alias("pattern")
    )
    census = pat.groupBy("pattern").agg(F.count("*").cast("long").alias("n"))
    return census.select(
        "pattern",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy()).cast("double")
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# events_sampen_ratio — SampEn template matches (m=2, r=0.2*sd), log-free
# ---------------------------------------------------------------------------


@register(
    "events_sampen_ratio",
    oracle=f"""
        WITH {_SQL_DAILY},
        idx AS (
            SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i,
                   CAST(x AS DOUBLE) AS x
            FROM daily
        ),
        stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   sqrt((CAST(COUNT(*) AS DOUBLE)
                             * SUM(x * x) - SUM(x) * SUM(x))
                        / (CAST(COUNT(*) AS DOUBLE)
                           * CAST(COUNT(*) - 1 AS DOUBLE))) AS sd
            FROM (SELECT CAST(x AS BIGINT) AS xi, x FROM idx)
        ),
        tmpl AS (
            SELECT a.i AS i, b.i AS j,
                   GREATEST(ABS(a.x - b.x), ABS(a2.x - b2.x)) AS d2,
                   GREATEST(ABS(a.x - b.x), ABS(a2.x - b2.x),
                            ABS(a3.x - b3.x)) AS d3
            FROM idx a
            JOIN idx a2 ON a2.i = a.i + 1
            JOIN idx a3 ON a3.i = a.i + 2
            JOIN idx b  ON b.i > a.i
            JOIN idx b2 ON b2.i = b.i + 1
            JOIN idx b3 ON b3.i = b.i + 2
        )
        SELECT s.n,
               s.sd,
               CAST(SUM(CASE WHEN t.d2 <= 0.2 * s.sd THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_matches,
               CAST(SUM(CASE WHEN t.d3 <= 0.2 * s.sd THEN 1 ELSE 0 END)
                    AS BIGINT) AS a_matches,
               CASE WHEN SUM(CASE WHEN t.d2 <= 0.2 * s.sd
                             THEN 1 ELSE 0 END) = 0 THEN NULL
                    ELSE CAST(SUM(CASE WHEN t.d3 <= 0.2 * s.sd
                              THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(SUM(CASE WHEN t.d2 <= 0.2 * s.sd
                                 THEN 1 ELSE 0 END) AS DOUBLE)
               END AS ab_ratio
        FROM tmpl t CROSS JOIN stats s
        GROUP BY s.n, s.sd
    """,
    doc="Sample-Entropy template matching (Richman & Moorman 2000; "
    "m=2, r=0.2*sd) on the daily event-count series: B = pairs of "
    "length-2 templates within Chebyshev distance r, A = the same at "
    "length 3; SampEn = -ln(A/B) is left to the reader (libm rule) — "
    "the exact integer match counts and the A/B ratio ARE the "
    "statistic. sd comes from the exact integer sum/sumsq identity "
    "(one sqrt — IEEE-correctly-rounded, engine-safe). The pair "
    "enumeration is the textbook O(n^2) — n is CALENDAR-BOUNDED "
    "(days in the window), so this costs the same at 100 TB as at "
    "100 MB; the corpus-proportional work is one daily aggregate. "
    "Low ratio = irregular series; high = self-similar regularity "
    "(bot traffic, templated pipelines).",
)
def events_sampen_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count("*").cast("long").alias("xl"))
    idx = daily.select(
        F.row_number().over(Window.orderBy("day")).cast("long").alias("i"),
        F.col("xl").cast("double").alias("x"),
    )
    stats = idx.agg(
        F.count("*").cast("long").alias("n"),
        F.sqrt(
            (
                F.count("*").cast("double") * F.sum(F.col("x") * F.col("x"))
                - F.sum("x") * F.sum("x")
            )
            / (
                F.count("*").cast("double")
                * (F.count("*") - 1).cast("double")
            )
        ).alias("sd"),
    )
    a = idx.select(F.col("i").alias("ai"), F.col("x").alias("ax"))
    a2 = idx.select(F.col("i").alias("a2i"), F.col("x").alias("a2x"))
    a3 = idx.select(F.col("i").alias("a3i"), F.col("x").alias("a3x"))
    b = idx.select(F.col("i").alias("bi"), F.col("x").alias("bx"))
    b2 = idx.select(F.col("i").alias("b2i"), F.col("x").alias("b2x"))
    b3 = idx.select(F.col("i").alias("b3i"), F.col("x").alias("b3x"))
    tmpl = (
        a.join(a2, F.col("a2i") == F.col("ai") + 1)
        .join(a3, F.col("a3i") == F.col("ai") + 2)
        .join(b, F.col("bi") > F.col("ai"))
        .join(b2, F.col("b2i") == F.col("bi") + 1)
        .join(b3, F.col("b3i") == F.col("bi") + 2)
        .select(
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("a2x") - F.col("b2x")),
            ).alias("d2"),
            F.greatest(
                F.abs(F.col("ax") - F.col("bx")),
                F.abs(F.col("a2x") - F.col("b2x")),
                F.abs(F.col("a3x") - F.col("b3x")),
            ).alias("d3"),
        )
    )
    agg = tmpl.crossJoin(F.broadcast(stats)).groupBy("n", "sd").agg(
        F.sum(F.when(F.col("d2") <= 0.2 * F.col("sd"), 1).otherwise(0))
        .cast("long")
        .alias("b_matches"),
        F.sum(F.when(F.col("d3") <= 0.2 * F.col("sd"), 1).otherwise(0))
        .cast("long")
        .alias("a_matches"),
    )
    return agg.select(
        "n",
        "sd",
        "b_matches",
        "a_matches",
        F.when(F.col("b_matches") == 0, F.lit(None).cast("double"))
        .otherwise(
            F.col("a_matches").cast("double")
            / F.col("b_matches").cast("double")
        )
        .alias("ab_ratio"),
    )


# ---------------------------------------------------------------------------
# events_vshape_patterns — down-down-up-up detection via lag windows
# ---------------------------------------------------------------------------


@register(
    "events_vshape_patterns",
    oracle="""
        WITH seq AS (
            SELECT user_id, value,
                   lag(value, 4) OVER w AS v0,
                   lag(value, 3) OVER w AS v1,
                   lag(value, 2) OVER w AS v2,
                   lag(value, 1) OVER w AS v3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        flags AS (
            SELECT user_id,
                   CASE WHEN v0 > v1 AND v1 > v2
                         AND v2 < v3 AND v3 < value
                        THEN 1 ELSE 0 END AS is_v
            FROM seq WHERE v0 IS NOT NULL
        ),
        per_user AS (
            SELECT user_id, CAST(SUM(is_v) AS BIGINT) AS n_v
            FROM flags GROUP BY user_id
        )
        SELECT n_v, CAST(COUNT(*) AS BIGINT) AS n_users
        FROM per_user GROUP BY n_v
    """,
    doc="MATCH_RECOGNIZE-style V-shape pattern census: per user "
    "(ordered by ts, event_id), a V = two strict declines followed "
    "by two strict rises across 5 consecutive event values — the "
    "classic PATTERN (DOWN DOWN UP UP) spelled with lag windows, "
    "since neither engine ships the SQL:2016 clause. Output is the "
    "histogram users-by-V-count (exact integers). One user-keyed "
    "window pass (frames of 5) + two aggregates; the pattern "
    "vocabulary extends by editing the predicate, not the plan "
    "shape. The dip-recovery motif is the toy version of real "
    "trade/telemetry pattern scans a sequence store runs at scale.",
)
def events_vshape_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.lag("value", 4).over(w).alias("v0"),
        F.lag("value", 3).over(w).alias("v1"),
        F.lag("value", 2).over(w).alias("v2"),
        F.lag("value", 1).over(w).alias("v3"),
    ).where(F.col("v0").isNotNull())
    flags = seq.select(
        "user_id",
        F.when(
            (F.col("v0") > F.col("v1"))
            & (F.col("v1") > F.col("v2"))
            & (F.col("v2") < F.col("v3"))
            & (F.col("v3") < F.col("value")),
            1,
        )
        .otherwise(0)
        .alias("is_v"),
    )
    per_user = flags.groupBy("user_id").agg(
        F.sum("is_v").cast("long").alias("n_v")
    )
    return per_user.groupBy("n_v").agg(
        F.count("*").cast("long").alias("n_users")
    )
