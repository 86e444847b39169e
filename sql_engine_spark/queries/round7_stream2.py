"""Round-7 streaming set 2: the as-of join as a stateful stream — the
operator Structured Streaming lacks outright (stream-stream joins give
every match in a time range, never "the latest prior row"). Converges
exactly to the batch asof_join_events over the time-ordered replay, so
it shares that operator's DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sql_engine_spark.registry import _REGISTRY, register


@register(
    "streaming_asof_enrich",
    oracle=None,  # patched below to asof_join_events' oracle
    doc="Streaming as-of join (purchase enriched with the user's latest "
    "prior-or-simultaneous view) maintained ONLINE across "
    "micro-batches: state is ONE (best view ts, event_id, max "
    "processed ts) triple per user — O(live users) regardless of "
    "stream length, sharded by user_id — and each purchase matches "
    "the carried state at its arrival point, emitted append-mode as "
    "it arrives. Tie rules match operators/asof.py exactly "
    "(simultaneous view matches; equal-ts views break to the max "
    "event_id), so over the time-ordered replay the stream converges "
    "to the batch operator and shares its DuckDB oracle. The "
    "streaming surface Spark's stream-stream joins cannot express. "
    "Runs on the exactly-once foreachBatch batch-state runner "
    "(streaming/batchstate.py): zero Python in the row path — the "
    "retired pandas-state spelling paid the measured ~7x Arrow floor "
    "of scripts/pandas_state_floor.py on every emitted purchase; the "
    "pandas operator (streaming/asof.py) remains the surface for "
    "idle-TTL eviction and unordered feeds, which need GroupState.",
)
def streaming_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13: drained by the shared batch-state fleet (one events replay
    # per process, see streaming/batchstate.py and streaming_ewma_half).
    from sql_engine_spark.queries.streaming import _state_partitions
    from sql_engine_spark.streaming.batchstate import batchstate_fleet_view

    with _state_partitions(spark):
        res = batchstate_fleet_view(spark, sf_dir, "asof_enrich")
    return res.select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")


def _register_asof_fleet_spec() -> None:
    from sql_engine_spark.queries.streaming import N_CHUNKS
    from sql_engine_spark.streaming.asof import asof_batchstate_step
    from sql_engine_spark.streaming.batchstate import register_batchstate_view

    register_batchstate_view(
        "asof_enrich",
        table="events",
        order_cols=["ts", "event_id"],
        n_chunks=N_CHUNKS,
        make_step=lambda: asof_batchstate_step("view", "purchase"),
    )


_register_asof_fleet_spec()


def _fix_asof_oracle() -> None:
    _REGISTRY["streaming_asof_enrich"].oracle = _REGISTRY["asof_join_events"].oracle


_fix_asof_oracle()
