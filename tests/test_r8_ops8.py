"""Round-8 stats-set-3 pins: Grubbs, Dixon Q, Atkinson(2), and the
norm profile recomputed in pure Python."""

from __future__ import annotations

import math
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def _by_type(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    ).collect()
    out = {}
    for r in rows:
        out.setdefault(r.event_type, []).append((r.value, r.event_id))
    return out


def test_grubbs_matches_python(spark, sf_dir):
    groups = _by_type(spark, sf_dir)
    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_grubbs_statistic").collect()}
    for et, xs in groups.items():
        vals = [v for v, _ in xs]
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
        best = max(xs, key=lambda p: (abs(p[0] - mu) / sd, -p[1]))
        r = got[et]
        assert r.n == n
        assert abs(r.grubbs_g - abs(best[0] - mu) / sd) < 1e-6
        assert r.outlier_event_id == best[1]


def test_dixon_q_matches_python(spark, sf_dir):
    groups = _by_type(spark, sf_dir)
    got = {r.event_type: r for r in _build(spark, sf_dir, "agg_dixon_q").collect()}
    for et, xs in groups.items():
        vals = sorted(v for v, _ in xs)
        x1, x2, xn1, xn = vals[0], vals[1], vals[-2], vals[-1]
        r = got[et]
        assert (r.min_value, r.max_value) == (x1, xn)
        assert abs(r.q_low - (x2 - x1) / (xn - x1)) < 1e-12
        assert abs(r.q_high - (xn - xn1) / (xn - x1)) < 1e-12


def test_atkinson_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "events").select("user_id").collect()
    cnt = Counter(r.user_id for r in rows)
    n = len(cnt)
    mean = sum(cnt.values()) / n
    hmean = n / sum(1.0 / c for c in cnt.values())
    r = _build(spark, sf_dir, "events_atkinson_index").collect()[0]
    assert (r.n_users, r.n_events) == (n, len(rows))
    assert abs(r.harmonic_mean - hmean) < 1e-6
    assert abs(r.atkinson_eps2 - (1 - hmean / mean)) < 1e-8
    # Atkinson and Gini agree on direction: both zero iff equal.
    assert 0 <= r.atkinson_eps2 < 1


def test_norm_profile_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    per = {}
    for r in rows:
        nrm = math.sqrt(sum(float(x) * float(x) for x in r.embedding))
        per.setdefault(r.label, []).append(nrm)
    got = {r.label: r for r in _build(spark, sf_dir, "emb_norm_profile").collect()}
    assert set(got) == set(per)
    for lb, ns in per.items():
        n = len(ns)
        mu = sum(ns) / n
        var = sum((x - mu) ** 2 for x in ns) / (n - 1)
        r = got[lb]
        assert r.n == n
        assert abs(r.min_norm - min(ns)) < 1e-9
        assert abs(r.max_norm - max(ns)) < 1e-9
        assert abs(r.mean_norm - mu) < 1e-6
        assert abs(r.var_norm - var) < 1e-5
        assert abs(r.norm_cv - math.sqrt(var) / mu) < 1e-5
