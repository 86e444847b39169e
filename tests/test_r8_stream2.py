"""Round-8 streaming-set-2 convergence: each streaming twin's drained
view yields EXACTLY the batch operator's rows."""

from __future__ import annotations

from sql_engine_spark.registry import all_queries


def _rows(spark, sf_dir, name):
    df = all_queries()[name].build(spark, sf_dir)
    return sorted(tuple(r) for r in df.collect())


def test_streaming_hellinger_converges_to_batch(spark, sf_dir):
    assert _rows(spark, sf_dir, "streaming_hellinger_drift") == _rows(
        spark, sf_dir, "quality_hellinger_drift"
    )


def test_streaming_seasonal_strength_converges_to_batch(spark, sf_dir):
    assert _rows(spark, sf_dir, "streaming_seasonal_strength") == _rows(
        spark, sf_dir, "events_seasonal_strength"
    )
