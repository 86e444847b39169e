"""Dedup operators persist intermediates; the consumer owns the cache
lifetime via release_cached (VERDICT r3 #2). The oracle gate and bench
both release between queries — this pins the mechanism itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from sql_engine_spark.operators.dedup import (
    connected_components_fixed,
    minhash_lsh_pairs,
    release_cached,
)


def test_release_cached_drops_tracked_persists(spark):
    release_cached()  # start clean
    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon {i % 3}") for i in range(40)],
        "id long, text string",
    )
    pairs = minhash_lsh_pairs(df, "id", "text", max_bucket_size=50)
    pairs.count()  # the consuming action
    released = release_cached()
    assert released >= 2  # docs projection + capped buckets
    assert release_cached() == 0  # idempotent once drained


def test_connected_components_eager_param(spark):
    """Both checkpoint modes produce identical labels; laziness under AQE
    is NOT promised (toRdd materializes stages at construction either
    way — see the operator comment), only the flat downstream plan is."""
    release_cached()
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long"
    )
    expected = {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    for eager in (True, False):
        labels = connected_components_fixed(pairs, "a", "b", iterations=3, eager=eager)
        assert {(r.node, r.label) for r in labels.collect()} == expected
        release_cached()
