"""Round-8 streaming set 2: live drift and seasonality through the
idempotent matview — streaming twins of quality_hellinger_drift and
events_seasonal_strength with EXACT batch convergence (they share the
batch operators' oracles, the streaming_kmv_distinct pattern).

View state is the bounded (event_type x day) / (day) count relation —
mergeable partial counts per micro-batch, exactly-once via the
matview's applied-batch-id commit; per-trigger cost is O(batch) +
O(view), never O(history). The drift/seasonality algebra runs once on
the drained view and is spelled identically to the batch twin, so the
converged numbers hash-match the same DuckDB oracle.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum, ssum
from sql_engine_spark.registry import _REGISTRY, register


def _day_col() -> F.Column:
    return (
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("d")
    )


def _register_count_view(name: str, select_cols_of, keys: list[str]) -> None:
    """A (keys -> count) matview spec on the shared replay fleet
    (streaming/fleet.py): partial = per-batch grouped counts over the
    spec's OWN projection of the raw events batch, merge = summed
    counts. Mergeable, bounded by the key-domain size."""
    from sql_engine_spark.streaming.fleet import register_fleet_view

    def partial_of(b: DataFrame) -> DataFrame:
        return (
            b.select(*select_cols_of())
            .groupBy(*keys)
            .agg(F.count("*").cast("long").alias("c"))
        )

    def combine(cur: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            cur.unionByName(partial)
            .groupBy(*keys)
            .agg(F.sum("c").cast("long").alias("c"))
        )

    register_fleet_view(name, partial_of=partial_of, combine=combine)


_register_count_view(
    "hellinger_counts", lambda: ["event_type", _day_col()], ["event_type", "d"]
)
_register_count_view("seasonal_counts", lambda: [_day_col()], ["d"])


@register(
    "streaming_hellinger_drift",
    oracle=None,  # spliced below: the batch hellinger oracle
    doc="Streaming Hellinger drift of the event-type mix between time "
    "halves, maintained live through the idempotent matview: view "
    "state is the BOUNDED (event_type, day) count relation (mergeable "
    "partial counts per micro-batch, exactly-once via the "
    "applied-batch-id commit); the midpoint split and the "
    "sqrt-Bhattacharyya algebra run once on the drained view, spelled "
    "identically to the batch quality_hellinger_drift, whose oracle "
    "it SHARES (exact-convergence gate, the streaming_kmv_distinct "
    "pattern). At 100 TB the view is calendar x event-type sized — "
    "the drift monitor a live ingest pipeline reads every trigger.",
)
def streaming_hellinger_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    daily = fleet_view(spark, sf_dir, "hellinger_counts").read(spark)
    mid = daily.agg(
        F.floor((F.min("d") + F.max("d")) / 2).cast("long").alias("mid")
    )
    halves = (
        daily.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("mid"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("d") > F.col("mid"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
    )
    tot = halves.agg(
        F.sum("n_a").cast("long").alias("t_a"),
        F.sum("n_b").cast("long").alias("t_b"),
    )
    j = halves.crossJoin(F.broadcast(tot))
    # ssum: see the batch twin — fold order must not depend on the
    # view's partitioning.
    bc = ssum(
        F.sqrt(
            (F.col("n_a").cast("double") / F.col("t_a").cast("double"))
            * (F.col("n_b").cast("double") / F.col("t_b").cast("double"))
        )
    )
    return (
        j.groupBy("t_a", "t_b")
        .agg(
            bc.alias("bhattacharyya"),
            F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)).alias("hellinger"),
        )
        .select(
            F.col("t_a").alias("n_first_half"),
            F.col("t_b").alias("n_second_half"),
            "bhattacharyya",
            "hellinger",
        )
    )


@register(
    "streaming_seasonal_strength",
    oracle=None,  # spliced below: the batch seasonal-strength oracle
    doc="Streaming weekly seasonal strength through the idempotent "
    "matview: view state is the BOUNDED daily count relation "
    "(mergeable partials, exactly-once); the day-of-week means and "
    "the variance decomposition F_s = max(0, 1 - Var(remainder)/"
    "Var(detrended)) run once on the drained view, spelled "
    "identically to the batch events_seasonal_strength, whose oracle "
    "it SHARES. The live gate on whether a seasonal forecast model is "
    "even applicable to the arriving stream.",
)
def streaming_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    daily = fleet_view(spark, sf_dir, "seasonal_counts").read(spark)
    dowm = daily.groupBy((F.col("d") % 7).alias("dow")).agg(
        (dsum(F.col("c").cast("double")) / F.count("*").cast("double")).alias(
            "dow_mean"
        )
    )
    g = daily.agg(
        (dsum(F.col("c").cast("double")) / F.count("*").cast("double")).alias(
            "gmean"
        ),
        F.count("*").cast("long").alias("n_days"),
    )
    j = daily.join(F.broadcast(dowm), (F.col("dow") == F.col("d") % 7)).crossJoin(
        F.broadcast(g)
    )
    cD = F.col("c").cast("double")
    det = (cD - F.col("gmean")) * (cD - F.col("gmean"))
    rem = (cD - F.col("dow_mean")) * (cD - F.col("dow_mean"))
    out = j.groupBy("n_days").agg(
        ssum(det).alias("ss_detrended"),
        ssum(rem).alias("ss_remainder"),
    )
    return out.select(
        "n_days",
        "ss_detrended",
        "ss_remainder",
        F.greatest(
            F.lit(0.0),
            F.lit(1.0) - F.col("ss_remainder") / F.col("ss_detrended"),
        ).alias("seasonal_strength"),
    )


_REGISTRY["streaming_hellinger_drift"].oracle = _REGISTRY[
    "quality_hellinger_drift"
].oracle
_REGISTRY["streaming_seasonal_strength"].oracle = _REGISTRY[
    "events_seasonal_strength"
].oracle
