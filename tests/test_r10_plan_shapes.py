"""Round-10 plan-shape pins: the sf1 stress-seal fixes must stay in
the plans, not just in the history.

- The exact-Jaccard verify joins (prefix filter / minhash) broadcast
  the set relation — the fix for the 43M-candidate fat-intermediate
  reshuffle that spilled ~70 GB at sf1 (operators/dedup._verify_jaccard).
- The PPJoin positional filter is part of the prefix-filter join
  condition (completeness-preserving candidate pruning).
- The crossmodal agreement's semantic side is the multitable-LSH
  bucket join, not the label-blocked all-pairs cosine.
- The session bounds long-run shuffle-file growth via periodic GC.
"""

from __future__ import annotations

import pytest

from sql_engine_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _prefix_pairs_build_df(spark):
    # Since r12 the registered dedup_prefix_filter scans the
    # process-shared materialized pair build, so these guards pin the
    # plan of the BUILD pipeline itself (what
    # prefix_filter_pairs_shared evaluates once per process).
    from sql_engine_spark.operators import dedup as D

    return D.prefix_filter_pairs_from_hs(
        D.shingle_hs_shared(spark, SF_DIR), threshold=0.3
    )


def test_prefix_filter_verify_broadcasts_sets(spark):
    plan = _plan(_prefix_pairs_build_df(spark))
    # Two verify joins (sa, sb) must be broadcast hash joins: fat
    # candidate+array rows never hit an exchange.
    assert plan.count("BroadcastHashJoin") >= 2, plan[:4000]


def test_prefix_filter_has_positional_filter(spark):
    plan = _plan(_prefix_pairs_build_df(spark))
    # The PPJoin positional bound is integer-exact since r11:
    # ubound * (t_num + t_den) >= t_num * (n_a + n_b). For the
    # registered t = 0.3 (= 3/10) the cross-multiplied constant 13
    # only enters the plan through that predicate.
    assert "* 13)" in plan, plan[:4000]


def test_minhash_verify_broadcasts_sets(spark):
    from sql_engine_spark.registry import all_queries

    df = all_queries()["dedup_minhash_lsh"].build(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan[:4000]


def test_crossmodal_semantic_side_is_bucket_join(spark):
    from sql_engine_spark.registry import all_queries

    df = all_queries()["dedup_crossmodal_agreement"].build(spark, SF_DIR)
    plan = _plan(df)
    # The label-blocked all-pairs leg scanned the `label` column; the
    # scale path joins on the stacked (table, bucket) keys and never
    # reads `label` at all.
    assert "__bk" in plan, plan[:4000]
    assert "label" not in plan, (
        "label-blocked all-pairs leg is back: " + plan[:4000]
    )


def test_session_bounds_shuffle_file_growth(spark):
    assert (
        spark.conf.get("spark.cleaner.periodicGC.interval") == "60s"
    )


def test_verify_jaccard_answers_unchanged(spark):
    """The broadcast is a plan hint, not a semantics change: pair set
    at sf0.001 matches the naive exact join."""
    from pyspark.sql import functions as F

    from sql_engine_spark.io import load
    from sql_engine_spark.operators import dedup as D

    docs = load(spark, SF_DIR, "documents").limit(300)
    got = sorted(
        (r.id_a, r.id_b)
        for r in D.prefix_filter_pairs(
            docs, "doc_id", "text", threshold=0.3
        ).collect()
    )
    hs = D.hashed_shingle_sets(docs, "doc_id", "text", shingle_k=3)
    a = hs.selectExpr("__id AS ia", "__hs AS ha")
    b = hs.selectExpr("__id AS ib", "__hs AS hb")
    jac = F.size(F.array_intersect("ha", "hb")) / F.size(
        F.array_union("ha", "hb")
    )
    naive = sorted(
        (r.ia, r.ib)
        for r in a.join(b, F.col("ia") < F.col("ib"))
        .where(jac >= 0.3)
        .collect()
    )
    assert got == naive
