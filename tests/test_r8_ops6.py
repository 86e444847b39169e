"""Round-8 eval-set pins: sweep metrics, ESS, Fleiss kappa, activity
Gini, and the snapshot-expiry plan recomputed in pure Python."""

from __future__ import annotations

import math
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_gmean_sweep_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    got = _build(spark, sf_dir, "quality_gmean_sweep").collect()
    for r in got:
        t = r.threshold
        tp = sum(1 for x in rows if x.n_chars >= t and x.lang == "en")
        fp = sum(1 for x in rows if x.n_chars >= t and x.lang != "en")
        fn = sum(1 for x in rows if x.n_chars < t and x.lang == "en")
        tn = sum(1 for x in rows if x.n_chars < t and x.lang != "en")
        assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
        tpr, tnr = tp / (tp + fn), tn / (tn + fp)
        assert abs(r.balanced_accuracy - (tpr + tnr) / 2) < 1e-12
        assert abs(r.gmean - math.sqrt(tpr * tnr)) < 1e-12
        if tp + fp:
            assert abs(
                r.fowlkes_mallows - math.sqrt((tp / (tp + fp)) * tpr)
            ) < 1e-12


def test_ess_bounds_and_consistency(spark, sf_dir):
    # ESS is bounded by (0, n]; fraction in (0, 1]; and the weights
    # relation it folds is the registered one.
    got = _build(spark, sf_dir, "curation_effective_sample_size").collect()
    assert len(got) > 0
    for r in got:
        assert 0 < r.ess <= r.n_docs + 1e-9
        assert 0 < r.ess_fraction <= 1 + 1e-12
    w = {
        r.doc_id: r.weight
        for r in _build(spark, sf_dir, "curation_importance_weights").collect()
    }
    srcs = {
        r.doc_id: r.source
        for r in load(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    per = {}
    for d, wt in w.items():
        per.setdefault(srcs[d], []).append(wt)
    for r in got:
        ws = per[r.source]
        want = sum(ws) ** 2 / sum(x * x for x in ws)
        assert abs(r.ess - want) < max(1e-6, 1e-4 * want)


def test_fleiss_kappa_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("text").collect()
    n_ts = []
    for r in rows:
        toks = set(r.text.strip().lower().split())
        n_ts.append(sum(1 for t in ("the", "and", "of") if t in toks))
    N = len(n_ts)
    p_bar = sum(nt * nt + (3 - nt) * (3 - nt) - 3 for nt in n_ts) / (N * 6)
    p_t = sum(n_ts) / (N * 3)
    p_e = p_t * p_t + (1 - p_t) * (1 - p_t)
    want = (p_bar - p_e) / (1 - p_e)
    r = _build(spark, sf_dir, "agg_fleiss_kappa").collect()[0]
    assert r.n_items == N
    assert abs(r.p_bar - p_bar) < 1e-12
    assert abs(r.p_e - p_e) < 1e-12
    assert abs(r.fleiss_kappa - want) < 1e-12


def test_gini_activity_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("user_id").collect()
    cnt = Counter(r.user_id for r in rows)
    xs = sorted((c, u) for u, c in cnt.items())
    n = len(xs)
    total = sum(c for c, _ in xs)
    weighted = sum(rk * c for rk, (c, _) in enumerate(xs, start=1))
    want = (2 * weighted - (n + 1) * total) / (n * total)
    r = _build(spark, sf_dir, "events_gini_activity").collect()[0]
    assert (r.n_users, r.n_events) == (n, total)
    assert abs(r.gini - want) < 1e-12
    assert 0 <= r.gini < 1


def test_snapshot_expiry_plan_covers_all_rows(spark, sf_dir):
    rows = load(spark, sf_dir, "orders").select("o_orderkey").collect()
    n = [sum(1 for r in rows if r.o_orderkey % 3 == m) for m in range(3)]
    got = {r.file: r for r in _build(spark, sf_dir, "maintenance_snapshot_expiry_plan").collect()}
    assert set(got) == {"f0", "f1", "f2", "f01"}
    assert got["f0"].n_rows == n[0] and got["f0"].deletable
    assert got["f1"].n_rows == n[1] and got["f1"].deletable
    assert got["f01"].n_rows == n[0] + n[1] and got["f01"].referenced
    assert got["f2"].n_rows == n[2] and got["f2"].referenced
    # The retained snapshot still covers every row.
    assert got["f01"].n_rows + got["f2"].n_rows == len(rows)
