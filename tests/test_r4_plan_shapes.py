"""Plan-shape pins for the round-4 operators: the scale properties the
docstrings claim must be visible in the physical plan — broadcast (not
sort-merge) joins against bounded side tables, column pruning at the
scans, and no cartesian products."""

from __future__ import annotations

import re

import pytest

from sql_engine_spark.plans.audit import audit, explain_str
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_mixture_sample_is_broadcast_and_pruned(spark, sf_dir):
    """The rates side is bounded (strata count) so the corpus-side join
    must be broadcast, never a corpus shuffle; only (doc_id, source,
    lang) may be read."""
    df = _build(spark, sf_dir, "curation_mixture_sample")
    a = audit(df)
    assert a.broadcast_joins >= 1
    assert a.sortmerge_joins == 0
    assert a.reads_only("doc_id", "source", "lang")


def test_importance_weights_stats_join_is_broadcast(spark, sf_dir):
    """The 256-bucket stats table must join broadcast; the only
    corpus-sized shuffles are the two aggregates."""
    a = audit(_build(spark, sf_dir, "curation_importance_weights"))
    assert a.broadcast_joins >= 1
    assert a.sortmerge_joins == 0
    assert a.reads_only("doc_id", "lang", "text")


def test_shared_ngrams_no_cartesian_and_pruned(spark, sf_dir):
    """Gram counting is an equi-join on the gram hash — any cartesian
    product in the plan means the linear-in-multiplicity claim broke."""
    df = _build(spark, sf_dir, "dedup_shared_ngrams")
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert audit(df).reads_only("doc_id", "text")


def test_range_search_has_no_rank_window(spark, sf_dir):
    """Range search's defining plan property: no window function at all
    (vs top-k's two-level rank) — scoring is join + filter only."""
    df = _build(spark, sf_dir, "ann_range_search")
    plan = explain_str(df, "simple")
    assert not re.search(r"\bWindow\b", plan), plan
    assert "CartesianProduct" not in plan


def test_pii_luhn_zero_shuffles(spark, sf_dir):
    """Per-row regex + fold: the whole query must be a map-only plan."""
    df = _build(spark, sf_dir, "text_pii_luhn")
    plan = explain_str(df, "simple")
    assert "Exchange" not in plan, plan
    assert audit(df).reads_only("doc_id", "text")


def test_bytes_per_token_single_aggregate_shuffle(spark, sf_dir):
    """One map-side-combinable aggregate: exactly one exchange (on the
    bounded group key), partial aggregation below it."""
    df = _build(spark, sf_dir, "text_bytes_per_token")
    plan = explain_str(df, "simple")
    assert len(re.findall(r"\bExchange\b", plan)) == 1, plan


@pytest.mark.parametrize(
    "name",
    ["dedup_shared_ngrams", "curation_block_dedup", "dedup_winnow_pairs"],
)
def test_r4_dedup_queries_release_their_caches(spark, sf_dir, name):
    """Every r4 operator that persists intermediates must route them
    through the tracked helper so release_cached() can drop them."""
    from sql_engine_spark.operators.dedup import release_cached

    release_cached()
    _build(spark, sf_dir, name).count()
    assert release_cached() >= 1
