"""Round-9 streaming twins off the SHARED replay fleet's daily-count
view: Page-Hinkley drift and running-peak drawdown, live.

Both read the `seasonal_counts` matview (streaming/fleet.py — the
bounded (epoch-day, count) relation maintained exactly-once by the one
multiplexed replay pass that also feeds streaming_seasonal_strength),
then run the IDENTICAL calendar-bounded algebra as their batch twins
(queries/round9_stats.ph_from_daily / drawdown_from_daily) — so they
SHARE the batch operators' oracles and converge exactly. This is the
multi-consumer payoff of the fleet: two more live monitors cost ZERO
additional streams, checkpoints, or state — just two reads of an
already-maintained view. At 100 TB the view is calendar-sized and the
monitors run per trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sql_engine_spark.queries.round8_stream2  # noqa: F401 — registers the
# seasonal_counts fleet spec these twins read; without the import a
# partial test import would hit an unknown-spec error (review finding).
from sql_engine_spark.queries.round9_stats import (
    drawdown_from_daily,
    ph_from_daily,
)
from sql_engine_spark.registry import _REGISTRY, register


def _view_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day DATE, cnt) from the drained seasonal_counts fleet view —
    epoch-day ints back to DATE so the shared batch oracle's day
    column matches."""
    from sql_engine_spark.streaming.fleet import fleet_view

    daily = fleet_view(spark, sf_dir, "seasonal_counts").read(spark)
    return daily.select(
        F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))").alias("day"),
        F.col("c").cast("long").alias("cnt"),
    )


@register(
    "streaming_page_hinkley",
    oracle=None,  # spliced below: the batch Page-Hinkley oracle
    doc="Streaming Page-Hinkley drift monitor: reads the bounded daily "
    "count matview maintained by the SHARED replay fleet (no "
    "additional stream, checkpoint, or state — the multi-consumer "
    "payoff of streaming/fleet.py) and runs the identical "
    "scaled-integer PH algebra as events_page_hinkley, whose oracle "
    "it SHARES (exact batch convergence, the streaming_kmv_distinct "
    "pattern). The live one-sided drift alarm a training-data ingest "
    "watches between triggers.",
)
def streaming_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ph_from_daily(_view_daily(spark, sf_dir))


@register(
    "streaming_max_drawdown",
    oracle=None,  # spliced below: the batch drawdown oracle
    doc="Streaming running-peak drawdown off the shared fleet's daily "
    "count matview — identical algebra and SHARED oracle with "
    "events_max_drawdown (exact batch convergence); zero additional "
    "streaming state (see streaming_page_hinkley). The live "
    "fall-since-high companion of the PH drift-since-low monitor.",
)
def streaming_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    return drawdown_from_daily(_view_daily(spark, sf_dir))


_REGISTRY["streaming_page_hinkley"].oracle = _REGISTRY[
    "events_page_hinkley"
].oracle
_REGISTRY["streaming_max_drawdown"].oracle = _REGISTRY[
    "events_max_drawdown"
].oracle
