"""Shared replay fleet for matview-twinned streaming queries.

Through round 8 each of the four events-sourced matview twins
(streaming_kmv_distinct, streaming_bitmap_distinct,
streaming_hellinger_drift, streaming_seasonal_strength) started its OWN
availableNow micro-batch stream over the IDENTICAL replay source
(table_stream(events, [event_id], 4)) — four scheduler spin-ups and
four source replays per process, ~2.5-3.2s apiece locally, for views
that are each a pure function of the dataset (r8 verdict #7).

This module multiplexes them: ONE foreachBatch pass per (process,
dataset) whose batch handler calls EVERY registered view's merge().
Per-query state isolation is preserved exactly — each view keeps its
own directory, its own applied-batch marker, and its own
partial_of/combine (the exactly-once commit protocol in
streaming/matview.py is untouched; the fleet only shares the
*scheduler and source scan*, never state. On a real cluster this is
one ingest job updating several downstream materialized views — the
standard multi-sink pattern). Convergence semantics are unchanged:
each view's content is bit-identical to what its solo stream built,
because merge() sees the same batches in the same order with the same
batch ids.

Specs register at import time; fleet_view() drains whatever specs are
present on first use and runs a CATCH-UP pass for specs registered
later (e.g. when a test imports a single query module), so partial
imports stay correct — they just lose some sharing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class FleetSpec:
    name: str
    # Takes the RAW events micro-batch (all columns) — each spec does
    # its own projection, so one stream serves every view.
    partial_of: Callable[[DataFrame], DataFrame]
    combine: Callable[[DataFrame, DataFrame], DataFrame]


_SPECS: dict[str, FleetSpec] = {}

# (abspath(sf_dir), dataset fingerprint) -> {spec name: view dir}
_DRAINED: dict[tuple, dict[str, str]] = {}


def register_fleet_view(
    name: str,
    *,
    partial_of: Callable[[DataFrame], DataFrame],
    combine: Callable[[DataFrame, DataFrame], DataFrame],
) -> None:
    _SPECS[name] = FleetSpec(name, partial_of, combine)


def fleet_view(spark: SparkSession, sf_dir: str, name: str):
    """The drained IdempotentMatView for `name`, running the shared
    replay pass if this (process, dataset) hasn't drained it yet."""
    from sql_engine_spark.operators.dedup import (
        dataset_fingerprint,
        tracked_tmpdir,
    )
    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.matview import IdempotentMatView
    from sql_engine_spark.streaming.source import table_stream

    if name not in _SPECS:
        raise KeyError(
            f"fleet spec {name!r} is not registered — import the query "
            f"module that registers it (known: {sorted(_SPECS)})"
        )
    key = (os.path.abspath(sf_dir), dataset_fingerprint(sf_dir, "events"))
    dirs = _DRAINED.setdefault(key, {})
    missing = [n for n in _SPECS if n not in dirs]
    if name in missing:
        views = {
            n: IdempotentMatView(
                tracked_tmpdir(f"fleet_{n}_"),
                partial_of=_SPECS[n].partial_of,
                combine=_SPECS[n].combine,
            )
            for n in missing
        }

        def merge_all(batch_df: DataFrame, batch_id: int) -> None:
            for v in views.values():
                v.merge(batch_df, batch_id)

        with _state_partitions(spark):
            stream = table_stream(spark, sf_dir, "events", ["event_id"], 4)
            q = (
                stream.writeStream.outputMode("append")
                .foreachBatch(merge_all)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        for n, v in views.items():
            dirs[n] = v.view_dir
    spec = _SPECS[name]
    return IdempotentMatView(
        dirs[name], partial_of=spec.partial_of, combine=spec.combine
    )
