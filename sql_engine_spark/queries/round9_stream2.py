"""Round-9 late streaming twin off the SHARED replay fleet's daily
view: seasonally-adjusted anomaly flags, live.

Reads the `seasonal_counts` matview (streaming/fleet.py — maintained
exactly-once by the one multiplexed replay pass) and runs the
IDENTICAL calendar-bounded decomposition + MAD algebra as
events_seasonal_anomaly, whose oracle it SHARES (exact batch
convergence). One more live monitor at ZERO additional streams,
checkpoints, or state — the fleet's multi-consumer payoff; between
triggers this is the deseasonalized alarm an ingest pipeline actually
pages on (a normal Monday spike no longer trips it — see the batch
twin's doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import sql_engine_spark.queries.round8_stream2  # noqa: F401 — registers the
# seasonal_counts fleet spec this twin reads (see round9_stream.py).
from sql_engine_spark.queries.round9_stats3 import seasonal_anomaly_from_daily
from sql_engine_spark.registry import _REGISTRY, register


def _view_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.streaming.fleet import fleet_view

    daily = fleet_view(spark, sf_dir, "seasonal_counts").read(spark)
    return daily.select(
        F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))").alias("day"),
        F.col("c").cast("long").alias("cnt"),
    )


@register(
    "streaming_seasonal_anomaly",
    oracle=None,  # spliced below: the batch seasonal-anomaly oracle
    doc="Streaming seasonally-adjusted anomaly monitor: reads the "
    "bounded daily-count matview maintained by the SHARED replay "
    "fleet and runs the identical MA-decomposition + Hampel-MAD "
    "algebra as events_seasonal_anomaly, whose oracle it SHARES "
    "(exact batch convergence, the streaming_page_hinkley pattern).",
)
def streaming_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return seasonal_anomaly_from_daily(_view_daily(spark, sf_dir))


_REGISTRY["streaming_seasonal_anomaly"].oracle = _REGISTRY[
    "events_seasonal_anomaly"
].oracle


@register(
    "streaming_ewma_control_chart",
    oracle=None,  # spliced below: the batch EWMA-chart oracle
    doc="Streaming EWMA control chart: reads the bounded daily-count "
    "matview maintained by the SHARED replay fleet and runs the "
    "identical halving-fold + sqrt(1/3)-limit algebra as "
    "events_ewma_control_chart, whose oracle it SHARES (exact batch "
    "convergence). A third zero-cost fleet consumer this session.",
)
def streaming_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sql_engine_spark.queries.round9_quality2 import ewma_cc_from_daily

    return ewma_cc_from_daily(_view_daily(spark, sf_dir))


import sql_engine_spark.queries.round9_quality2  # noqa: E402,F401 — the
# batch twin must be registered before its oracle is spliced (this
# module loads earlier in queries/__init__).

_REGISTRY["streaming_ewma_control_chart"].oracle = _REGISTRY[
    "events_ewma_control_chart"
].oracle
