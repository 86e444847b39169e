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
    from sql_engine_spark.queries.streaming import N_CHUNKS, _state_partitions
    from sql_engine_spark.streaming.asof import asof_enrich_replay
    from sql_engine_spark.streaming.source import events_stream

    with _state_partitions(spark):
        stream = events_stream(spark, sf_dir, N_CHUNKS)
        res = asof_enrich_replay(
            spark, stream, right_type="view", left_type="purchase"
        )
    return res


def _fix_asof_oracle() -> None:
    _REGISTRY["streaming_asof_enrich"].oracle = _REGISTRY["asof_join_events"].oracle


_fix_asof_oracle()
