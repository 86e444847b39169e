"""Round-8 vectors-set pins: silhouette, TextRank, cost curve, PACF
recomputed independently in pure Python/numpy."""

from __future__ import annotations

import math
from collections import Counter

from sql_engine_spark.io import load
from sql_engine_spark.registry import all_queries


def _build(spark, sf_dir, name):
    return all_queries()[name].build(spark, sf_dir)


def test_silhouette_matches_python(spark, sf_dir):
    import hashlib

    from sql_engine_spark.operators.similarity import derived_sample_hex

    rows = load(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding").collect()
    thr = derived_sample_hex(len(rows), target_train_rows=100)
    sample = [
        (r.vec_id, r.label, [float(x) for x in r.embedding])
        for r in rows
        if thr is None
        or hashlib.md5(str(r.vec_id).encode()).hexdigest()[: len(thr)] < thr
    ]
    assert 50 <= len(sample) <= 200

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    dists = {}
    for i, li, ei in sample:
        for j, lj, ej in sample:
            if i == j:
                continue
            d2 = max(0.0, dot(ei, ei) - 2.0 * dot(ei, ej) + dot(ej, ej))
            dists.setdefault((i, li, lj), []).append(math.sqrt(d2))
    mean_d = {k: sum(v) / len(v) for k, v in dists.items()}
    sil_by_label = {}
    for i, li, _ in sample:
        a = mean_d.get((i, li, li))
        if a is None:
            continue
        others = [v for (ii, lli, llj), v in mean_d.items() if ii == i and llj != li]
        if not others:
            continue
        b = min(others)
        sil_by_label.setdefault(li, []).append((b - a) / max(a, b))
    got = {r.label: r for r in _build(spark, sf_dir, "emb_silhouette_sampled").collect()}
    for lb, ss in sil_by_label.items():
        r = got[lb]
        assert r.n_sampled == len(ss)
        assert abs(r.mean_silhouette - sum(ss) / len(ss)) < 1e-5


def test_textrank_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    pos = []
    for r in rows:
        toks = r.text.strip().lower().split()
        for p, t in enumerate(toks, start=1):
            if len(t) >= 4:
                pos.append((r.doc_id, t, p))
    freq = Counter(t for _, t, _ in pos)
    vocab = set(
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:150]
    )
    by_doc = {}
    for d, t, p in pos:
        if t in vocab:
            by_doc.setdefault(d, []).append((p, t))
    co = Counter()
    for d, lst in by_doc.items():
        lst.sort()
        for ai in range(len(lst)):
            pa, ta = lst[ai]
            for bi in range(ai + 1, len(lst)):
                pb, tb = lst[bi]
                if pb - pa > 2:
                    break
                if 1 <= pb - pa <= 2 and ta != tb:
                    co[(ta, tb)] += 1
    und = Counter()
    for (a, b), n in co.items():
        und[(min(a, b), max(a, b))] += n
    edges = [(a, b) for (a, b), n in und.items() if n >= 2]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    N = len(vocab)
    r = {t: 1.0 / N for t in vocab}
    for _ in range(3):
        contrib = Counter()
        for u, nbs in adj.items():
            for v in nbs:
                contrib[v] += r[u] / len(nbs)
        r = {t: 0.15 / N + 0.85 * contrib.get(t, 0.0) for t in vocab}
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(
        _build(spark, sf_dir, "text_textrank_keywords").collect(),
        key=lambda x: x.rank,
    )
    assert [g.keyword for g in got] == [w for w, _ in want]
    for g, (_, pr) in zip(got, want):
        # pagerank_fixed sums contributions through DECIMAL(27,6)
        # (each term rounds at 1e-6); three rounds accumulate ~1e-5.
        assert abs(g.pagerank - pr) < 3e-5


def test_cost_curve_matches_python(spark, sf_dir):
    rows = load(spark, sf_dir, "documents").select("n_chars", "lang").collect()
    thresholds = [
        r.threshold for r in _build(spark, sf_dir, "quality_confusion_sweep").collect()
    ]
    got = {r.cost_ratio: r for r in _build(spark, sf_dir, "quality_cost_curve").collect()}
    for c in (0.5, 1.0, 2.0, 5.0, 10.0):
        best = None
        for t in sorted(thresholds):
            fp = sum(1 for x in rows if x.n_chars >= t and x.lang != "en")
            fn = sum(1 for x in rows if x.n_chars < t and x.lang == "en")
            cost = fp + c * fn
            if best is None or cost < best[0] - 1e-12:
                best = (cost, t, fp, fn)
        r = got[c]
        assert (r.best_threshold, r.fp, r.fn) == (best[1], best[2], best[3])
        assert abs(r.expected_cost_per_row - best[0] / len(rows)) < 1e-12


def test_pacf_matches_python(spark, sf_dir):
    import datetime

    rows = load(spark, sf_dir, "events").select("ts").collect()
    daily = Counter(
        (r.ts.date() - datetime.date(1970, 1, 1)).days for r in rows
    )
    mu = sum(daily.values()) / len(daily)
    g0 = sum((c - mu) ** 2 for c in daily.values())
    rho = []
    for k in range(1, 6):
        gk = sum(
            (daily[d] - mu) * (daily[d + k] - mu)
            for d in daily
            if d + k in daily
        )
        rho.append(gk / g0)
    # Durbin-Levinson
    phis = {}
    pacf = []
    for k in range(1, 6):
        if k == 1:
            pk = rho[0]
        else:
            num = rho[k - 1] - sum(
                phis[(k - 1, j)] * rho[k - 1 - j] for j in range(1, k)
            )
            den = 1.0 - sum(phis[(k - 1, j)] * rho[j - 1] for j in range(1, k))
            pk = num / den
        phis[(k, k)] = pk
        for j in range(1, k):
            phis[(k, j)] = phis[(k - 1, j)] - pk * phis[(k - 1, k - j)]
        pacf.append(pk)
    got = sorted(_build(spark, sf_dir, "events_pacf").collect(), key=lambda r: r.lag)
    assert [r.lag for r in got] == [1, 2, 3, 4, 5]
    for r, want_r, want_p in zip(got, rho, pacf):
        assert abs(r.acf - want_r) < 1e-6
        assert abs(r.pacf - want_p) < 1e-4
    # PACF lag 1 equals ACF lag 1 by construction.
    assert abs(got[0].acf - got[0].pacf) < 1e-15
