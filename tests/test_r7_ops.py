"""Round-7 operator pins: plan shapes for the scale claims, and
known-value / invariant checks the oracle hash can't express."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sql_engine_spark.plans.audit import audit, explain_str
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _window_specs(plan: str):
    return [m.group(1) for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan)]


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """The co-located join must read both bucketed tables and join with
    zero Exchange nodes below the aggregate (the network shuffle was
    paid at write); the join itself is the bucketed SMJ."""
    df = _build(spark, sf_dir, "join_bucketed_colocated")
    plan = df._jdf.queryExecution().executedPlan().toString()
    join_part = plan.split("HashAggregate")[-1]  # below the agg
    assert "Exchange" not in join_part, plan
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, plan


def test_rank_tests_use_bucketed_scan(spark, sf_dir):
    """MWU/KS combined ranking must run through the two-level bucketed
    scan: every corpus-row window spec carries the __bkt key (the
    cross-bucket carry windows run over bucket-count rows)."""
    for name in ("agg_mannwhitney_u", "agg_ks_two_sample"):
        df = _build(spark, sf_dir, name)
        plan = explain_str(df, "formatted")
        specs = _window_specs(plan)
        assert any("__bkt" in s.split(",")[0] for s in specs), (name, specs)


def test_mwu_u_identity(spark, sf_dir):
    """U_a + U_b == n_a * n_b (exact identity of the U statistic)."""
    r = _build(spark, sf_dir, "agg_mannwhitney_u").collect()[0]
    assert r.u_a + r.u_b == r.n_a * r.n_b
    assert 0 <= r.u_a <= r.n_a * r.n_b


def test_ks_d_bounds(spark, sf_dir):
    r = _build(spark, sf_dir, "agg_ks_two_sample").collect()[0]
    assert 0.0 <= r.d_stat <= 1.0
    assert r.d_num <= r.n_a * r.n_b


def test_benford_shares_sum_to_one(spark, sf_dir):
    rows = _build(spark, sf_dir, "agg_benford_first_digit").collect()
    assert len(rows) == 9
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-9


def test_bitmap_distinct_matches_count_distinct(spark, sf_dir):
    """The bitmap spelling must equal Spark's own countDistinct — a
    third, in-engine cross-check beyond the DuckDB oracle."""
    from sql_engine_spark.io import load

    got = {
        r.event_type: r.n_users
        for r in _build(spark, sf_dir, "agg_bitmap_exact_distinct").collect()
    }
    want = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want


def test_stratified_quota_sums_to_budget(spark, sf_dir):
    """Largest-remainder quotas must sum exactly to the budget, and the
    selected set must respect every per-stratum quota."""
    from sql_engine_spark.queries.round7_text import _QUOTA_BUDGET

    rows = _build(spark, sf_dir, "curation_stratified_quota").collect()
    assert len(rows) == _QUOTA_BUDGET
    per_lang: dict[str, int] = {}
    quota: dict[str, int] = {}
    for r in rows:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
        quota[r.lang] = r.quota
        assert r.rk <= r.quota
    assert all(per_lang[lang] == quota[lang] for lang in per_lang)
    assert sum(quota.values()) == _QUOTA_BUDGET


def test_matryoshka_recall_bounds(spark, sf_dir):
    rows = _build(spark, sf_dir, "emb_matryoshka_recall").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hits <= r.n_true
        assert abs(r.recall - r.n_hits / r.n_true) < 1e-12


def test_jl_distortion_near_one(spark, sf_dir):
    """JL with P=16 has typical distortion eps ~ sqrt(ln(n)/P); assert
    the MEAN ratio sits in a generous [0.5, 1.5] band (a systematic
    scaling bug — forgotten 1/sqrt(P) — lands at 4.0 or 0.25)."""
    rows = _build(spark, sf_dir, "emb_jl_distortion").collect()
    assert rows
    mean = sum(r.ratio for r in rows) / len(rows)
    assert 0.5 < mean < 1.5, mean


def test_resource_allocation_excludes_existing_edges(spark, sf_dir):
    """RA predicts MISSING links: no scored pair may be an edge of the
    kNN graph."""
    from sql_engine_spark.io import load
    from sql_engine_spark.operators.similarity import knn_graph

    emb = load(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb, id_col="vec_id", vec_col="embedding", planes=4, tables=4, dim=64, k=5
    )
    edges = {
        (r.a, r.b)
        for r in g.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .collect()
    }
    ra = _build(spark, sf_dir, "graph_resource_allocation").collect()
    assert ra
    for r in ra:
        assert (r.a, r.b) not in edges


def test_grouping_sets_gid_flags(spark, sf_dir):
    """Exactly three flag combinations: (0,1) per-lang, (1,0)
    per-source, (1,1) grand total — and the grand total row's count is
    the corpus size."""
    from sql_engine_spark.io import load

    rows = _build(spark, sf_dir, "agg_grouping_sets_id").collect()
    combos = {(r.g_lang, r.g_source) for r in rows}
    assert combos == {(0, 1), (1, 0), (1, 1)}
    grand = [r for r in rows if (r.g_lang, r.g_source) == (1, 1)]
    assert len(grand) == 1
    assert grand[0].n_docs == load(spark, sf_dir, "documents").count()


def test_streaming_bitmap_converges_to_batch(spark, sf_dir):
    batch = {
        r.event_type: r.n_users
        for r in _build(spark, sf_dir, "agg_bitmap_exact_distinct").collect()
    }
    stream = {
        r.event_type: r.n_users
        for r in _build(spark, sf_dir, "streaming_bitmap_distinct").collect()
    }
    assert stream == batch


def test_vad_run_invariants(spark, sf_dir):
    rows = _build(spark, sf_dir, "multimodal_audio_vad").collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_voice <= r.n_frames
        assert r.longest_run <= r.n_voice
        assert (r.n_segments == 0) == (r.n_voice == 0)
        if r.n_segments:
            assert r.longest_run * r.n_segments >= r.n_voice / max(r.n_segments, 1)


def test_quality_constraints_trip_and_pass(spark, sf_dir):
    """The rule set must exercise BOTH report outcomes on driver data:
    the tax bound and status enum trip, positivity and the
    n_chars==length(text) invariant pass clean."""
    rows = {
        r.rule_name: r
        for r in _build(spark, sf_dir, "quality_constraint_violations").collect()
    }
    assert rows["tax_le_0.05"].n_violations > 0
    assert rows["status_in_F_O"].n_violations > 0
    assert rows["value_in_0_100"].n_violations > 0
    assert rows["price_positive"].n_violations == 0
    assert rows["n_chars_matches_text"].n_violations == 0
    for r in rows.values():
        assert 0.0 <= r.violation_rate <= 1.0
        assert r.n_violations <= r.n_rows


def test_quality_referential_integrity_clean(spark, sf_dir):
    """Driver data is FK-clean: zero orphans, zero NULL FKs on every
    edge, and child counts match the raw tables."""
    from sql_engine_spark.io import load

    rows = _build(spark, sf_dir, "quality_referential_integrity").collect()
    assert len(rows) == 5
    li = load(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.n_orphans == 0 and r.n_null_fk == 0, r
        if r.relationship.startswith("lineitem."):
            assert r.n_child == li


def test_quality_uniqueness_keys_unique(spark, sf_dir):
    """The four surrogate keys are unique on driver data; the composite
    (l_orderkey, l_linenumber) is NOT (the generator reuses line
    numbers) — the report's one true duplicate finding. Counter
    identities hold either way (each duplicated key covers >= 2 rows)."""
    rows = {
        r.key_name: r
        for r in _build(spark, sf_dir, "quality_uniqueness_report").collect()
    }
    for k in ("doc_id", "event_id", "o_orderkey", "c_custkey"):
        r = rows[k]
        assert r.n_keys == r.n_rows and r.n_dup_keys == 0, r
        assert r.uniqueness == 1.0
    li = rows["l_orderkey,l_linenumber"]
    assert li.n_dup_keys > 0 and li.n_keys < li.n_rows
    assert li.n_dup_rows >= 2 * li.n_dup_keys
    assert li.uniqueness < 1.0


def test_quality_freshness_watermark(spark, sf_dir):
    """The freshest type has lag 0; every lag is non-negative and the
    7-day window counts are bounded by the type totals."""
    rows = _build(spark, sf_dir, "quality_freshness_report").collect()
    assert min(r.lag_hours for r in rows) == 0
    for r in rows:
        assert r.lag_hours >= 0
        assert 0 <= r.n_last_7d <= r.n_events
        assert r.stale_flag == (1 if r.lag_hours >= 24 else 0)


def test_target_encode_oof_identities(spark, sf_dir):
    """Per (category, fold): n_fold + n_rest equals the category total
    from the smoothed encoder, and every encoding lies between the
    global min/max category mean extremes widened by the smoothing
    target (shrinkage can't extrapolate)."""
    smooth = {
        r.o_orderpriority: r
        for r in _build(spark, sf_dir, "feature_target_encode_smoothed").collect()
    }
    oof = _build(spark, sf_dir, "feature_target_encode_oof").collect()
    assert len(oof) == 4 * len(smooth)
    for r in oof:
        assert r.n_fold + r.n_rest == smooth[r.o_orderpriority].n
    # Shrinkage bound: enc is a convex combination of a subset mean and
    # the global mean, so it can't leave the [min, max] of raw fold
    # means union the global mean by construction; cheap sanity bound:
    import math

    for r in oof:
        assert math.isfinite(r.enc_oof) and r.enc_oof > 0


def test_vocab_index_conservation(spark, sf_dir):
    """Slots are unique, ordered by (count DESC, token ASC), and the
    top + OOV counts conserve the total token mass."""
    from sql_engine_spark.operators.textprep import tokens
    from sql_engine_spark.io import load

    rows = _build(spark, sf_dir, "feature_vocab_index_topk").collect()
    slots = sorted(r.slot for r in rows)
    assert slots == list(range(len(rows)))  # 0 (oov) + 1..k dense
    total = (
        load(spark, sf_dir, "documents")
        .select(F.explode(tokens("text")).alias("t"))
        .count()
    )
    assert sum(r.n for r in rows) == total
    ranked = sorted(
        (r for r in rows if r.slot > 0), key=lambda r: (-r.n, r.token)
    )
    assert [r.slot for r in ranked] == list(range(1, len(ranked) + 1))
