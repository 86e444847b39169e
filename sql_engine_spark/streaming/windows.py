"""Streaming windowed aggregation: tumbling / sliding / session windows
with event-time watermarks.

These are the incremental twins of queries/events.py — identical grouping
semantics, expressed on an unbounded stream. At cluster scale state lives
in the HDFS/RocksDB state store, keyed by (window, group); the watermark
bounds state size by expiring windows older than the lateness horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sql_engine_spark.functions.numeric import dsum


def _with_event_time(events: DataFrame) -> DataFrame:
    """Watermarks need TIMESTAMP (ltz); session tz is pinned UTC so the
    ntz->ltz cast is wall-clock-preserving (session.py)."""
    return events.withColumn("__etime", F.col("ts").cast("timestamp"))


def tumbling_agg(
    events: DataFrame, minutes: int = 5, watermark: str = "30 minutes"
) -> DataFrame:
    """Per-event-type counts/sums over fixed `minutes`-wide windows."""
    return (
        _with_event_time(events).withWatermark("__etime", watermark)
        .groupBy("event_type", F.window("__etime", f"{minutes} minutes"))
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            "event_type",
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    length_minutes: int = 10,
    slide_minutes: int = 5,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in length/slide windows."""
    return (
        _with_event_time(events).withWatermark("__etime", watermark)
        .groupBy(
            "event_type",
            F.window("__etime", f"{length_minutes} minutes", f"{slide_minutes} minutes"),
        )
        .agg(F.count("*").alias("n"), dsum("value").alias("sum_value"))
        .select(
            "event_type",
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            "n",
            "sum_value",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str | None = "2 hours"
) -> DataFrame:
    """Data-driven session windows per user: a session closes after `gap`
    of inactivity (built-in merging-window state, no custom code).

    watermark=None is for complete-mode output: with a watermark set,
    finalized sessions are evicted from the state store and disappear from
    complete-mode snapshots. Append-mode production streams need one.
    """
    et = _with_event_time(events)
    if watermark is not None:
        et = et.withWatermark("__etime", watermark)
    return (
        et.groupBy("user_id", F.session_window("__etime", gap))
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
