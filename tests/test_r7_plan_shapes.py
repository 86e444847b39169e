"""Plan-shape pins for the round-7 session-2 operators: the scale
claims in the docstrings (and the PERF_NOTES cache-substitution note)
must be visible in physical plans built in isolation."""

from __future__ import annotations

import re

from sql_engine_spark.plans.audit import audit, explain_str
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_runs_test_prunes_to_ts_only(spark, sf_dir):
    """PERF_NOTES claims the all-column scan lines in PLANS.md are a
    cross-query cache substitution, not lost pruning — pin the isolated
    plan: the one events scan reads ONLY ts."""
    spark.catalog.clearCache()
    df = _build(spark, sf_dir, "agg_runs_test")
    assert audit(df).reads_only("ts")


def test_srm_prunes_to_user_id_only(spark, sf_dir):
    spark.catalog.clearCache()
    df = _build(spark, sf_dir, "events_ab_srm_check")
    assert audit(df).reads_only("user_id")


def test_welch_prunes_to_type_and_value(spark, sf_dir):
    spark.catalog.clearCache()
    df = _build(spark, sf_dir, "agg_welch_ttest")
    assert audit(df).reads_only("event_type", "value")


def test_any_all_pushes_urgent_filter(spark, sf_dir):
    """The quantifier rewrite's orders scan must push the priority
    filter into the parquet scan."""
    df = _build(spark, sf_dir, "subquery_any_all")
    plan = explain_str(df, "formatted")
    assert re.search(r"PushedFilters:.*1-URGENT", plan), plan[:2000]
    assert audit(df).reads_only(
        "c_custkey", "c_acctbal", "o_custkey", "o_totalprice", "o_orderpriority"
    )


def test_spearman_has_no_global_single_partition_window(spark, sf_dir):
    """Both midrank cumsums must run through the bucketed two-level
    scan: every window spec with a sort must be partitioned on the
    bucket column, never an empty partition over the corpus-sized
    price domain (the carry window over per-bucket totals is
    bucket-count-sized and keyless by design — identified by its
    __bkt ordering column)."""
    df = _build(spark, sf_dir, "agg_spearman_rho")
    plan = explain_str(df, "formatted")
    specs = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert specs, "expected window specs in the plan"
    for spec in specs:
        first = spec.split(",")[0].strip()
        if "__bkt" in spec and ("ASC" in first or "DESC" in first):
            continue  # cross-bucket carry: tiny totals relation
        assert "__bkt" in first, spec


def test_mmr_pool_joins_are_broadcast(spark, sf_dir):
    """Every selected-set join in the 3-round greedy loop is against a
    queries-sized relation — no sort-merge join anywhere in the plan."""
    df = _build(spark, sf_dir, "ann_mmr_rerank")
    a = audit(df)
    assert a.sortmerge_joins == 0
    assert a.reads_only("vec_id", "embedding")


def test_phash_near_dup_bucket_cap_in_plan(spark, sf_dir):
    """The hot-bucket fence must appear as a window count filter over
    (band, key) BEFORE the self-join."""
    df = _build(spark, sf_dir, "multimodal_phash_near_dup")
    plan = explain_str(df, "formatted")
    specs = [
        m.group(1)
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)
    ]
    assert any("band" in s and "key" in s for s in specs), specs
